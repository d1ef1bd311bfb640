"""P14: OTTL transform-processor statements as compiled column ops.

The reference deploys the stock OTTL transform processor with `set` /
`delete_key` statements over resource attributes (e.g.
test/validate/configs/telemetry-gateway.yaml:31-45,
k8s-resource.yaml:47); the collector applies each statement in order,
optionally gated by a `where` clause.

Spark shape: each statement compiles to one map-column expression —
delete_key => map_filter, set => drop-key + map_concat — chained in
statement order over the same column (one projection, whole-stage
codegen; the OTTL interpreter loop disappears like the CEL one did).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

def _split_where(s: str) -> int | None:
    """Index of the statement-level `` where `` separator: the last
    occurrence at paren depth 0 outside string literals — a `' where '`
    inside a set-value expression (e.g. concat(a, ' where ', b)) is NOT a
    condition clause."""
    depth = 0
    quote = None
    best = None
    i = 0
    while i < len(s):
        c = s[i]
        if quote:
            if c == quote:
                quote = None
        elif c in ("'", '"'):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and c == " " and s.startswith(" where ", i):
            best = i
        i += 1
    return best


_DELETE_RE = re.compile(r'^delete_key\((\w+),\s*"([^"]+)"\)$')
_SET_RE = re.compile(r'^set\((\w+)\["([^"]+)"\],\s*(.+)\)$')


@dataclass(frozen=True)
class OttlStatement:
    op: str  # 'set' | 'delete_key'
    target_col: str  # map column name
    key: str
    value_expr: str | None = None  # SQL expr ('set' only)
    condition: str | None = None  # `where` clause


def parse_statement(stmt: str) -> OttlStatement:
    """Parse the OTTL statement forms the reference configs use:
    ``delete_key(attrs, "k")`` / ``set(attrs["k"], <expr>)``, each with an
    optional `` where <cond>`` suffix (OTTL statement grammar)."""
    s = stmt.strip()
    cond = None
    idx = _split_where(s)
    if idx is not None:
        s, cond = s[:idx].strip(), s[idx + len(" where "):].strip()
    m = _DELETE_RE.match(s)
    if m:
        return OttlStatement("delete_key", m.group(1), m.group(2), None, cond)
    m = _SET_RE.match(s)
    if m:
        return OttlStatement("set", m.group(1), m.group(2), m.group(3), cond)
    raise ValueError(f"unsupported OTTL statement: {stmt!r}")


def _apply_one(df: DataFrame, st: OttlStatement) -> DataFrame:
    col = F.col(st.target_col)
    if st.op == "delete_key":
        new = F.map_filter(col, lambda k, v: k != F.lit(st.key))
    else:
        dropped = F.map_filter(col, lambda k, v: k != F.lit(st.key))
        entry = F.create_map(F.lit(st.key), F.expr(st.value_expr).cast("string"))
        # a null-evaluating set keeps the key absent (OTTL set with nil is
        # a no-op on the key), mirroring the mapping engine's null-tag drop
        new = F.when(
            F.expr(st.value_expr).isNotNull(), F.map_concat(dropped, entry)
        ).otherwise(col)
    if st.condition:
        new = F.when(F.expr(st.condition), new).otherwise(col)
    return df.withColumn(st.target_col, new)


def apply_ottl(df: DataFrame, statements: list[str | OttlStatement]) -> DataFrame:
    """Apply OTTL statements in order (the processor contract: later
    statements see earlier statements' writes)."""
    for s in statements:
        st = parse_statement(s) if isinstance(s, str) else s
        df = _apply_one(df, st)
    return df
