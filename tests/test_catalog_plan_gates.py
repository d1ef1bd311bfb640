"""Catalog-wide physical-plan gates: EVERY entry_queries query must plan
without the two scale-killer shapes, at plan time, with no execution:

- CartesianProduct: an unconditioned large-x-large join. (crossJoin
  against a broadcast 1-row aggregate plans as BroadcastNestedLoopJoin,
  which is fine and NOT flagged here — the scalar-broadcast pattern.)
- BatchEvalPython: a row-at-a-time Python UDF in the plan. Only
  Arrow-batched pandas UDFs (ArrowEvalPython) are allowed in the hot
  path (SURVEY §2.9 / brief: "UDFs are the slow path").

This subsumes the per-operator no-cartesian tests with one sweep over
the full driver surface — a query added without thinking about its join
shape fails here before it ever reaches the driver."""

from __future__ import annotations

import os

import pytest

from sts_opentelemetry_collector_spark.entry_queries import QUERIES

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

# queries whose plan is intentionally not built here: none currently —
# keep the list visible so any future exception is explicit and reviewed
PLAN_GATE_EXEMPT: set[str] = set()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_or_row_python_udf(spark, name):
    if name in PLAN_GATE_EXEMPT:
        pytest.skip("explicitly exempted")
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"


def test_d1_dedup_plans_as_hash_aggregate(spark):
    """d1_dedup_first_wins must plan as a partial-mergeable hash aggregate
    (min_by), NOT a window sort: a row_number window shuffles and sorts
    every group's rows, the aggregate shuffles pre-reduced groups
    (VERDICT r4 Wrong #2)."""
    df = QUERIES["d1_dedup_first_wins"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "d1 regressed to a window sort"
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_catalog_queries_and_oracles_aligned():
    """Every query has an oracle and vice versa (the driver records a
    weaker rows-only check for oracle-less queries — we keep that set
    empty on purpose), and the driver's 50-entry check window exists."""
    from sts_opentelemetry_collector_spark.entry_queries import ORACLES, QUERIES

    assert set(QUERIES) == set(ORACLES)
    assert len(QUERIES) >= 50  # the driver checks dict order 1-50
