from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sts_opentelemetry_collector_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")
SF_CORRECT = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def webtext_dir(tmp_path_factory):
    """Small deterministic webtext table shared by pipeline tests."""
    from sts_opentelemetry_collector_spark.sources.webtext import write_webtext

    d = tmp_path_factory.mktemp("webtext")
    write_webtext(str(d), n_rows=2000)
    return str(d)


@pytest.fixture(scope="session")
def webtext(spark, webtext_dir):
    import os as _os

    return spark.read.parquet(_os.path.join(webtext_dir, "webtext.parquet"))
