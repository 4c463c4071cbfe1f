"""Deterministic floating-point aggregation helpers.

Summing doubles is order-dependent, and Spark's partial-aggregation order
varies with partitioning — so a SUM(double) can differ from a single-threaded
oracle (or its own previous run) in the last ULP. Worse, double→DECIMAL casts
themselves round differently across engines (Java BigDecimal works on the
exact binary expansion; DuckDB converts via scaled double arithmetic), so a
DECIMAL accumulator alone is not portable either.

The portable form is a scaled-integer sum:

    SUM(x)  ->  CAST(SUM(CAST(round(x * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
    AVG(x)  ->  SUM(x)_as_above / COUNT(x)

Why this is engine-independent:
- ``x * 1e6`` is one IEEE double multiply — bit-identical everywhere.
- The fixture values are fixed-decimal (≤6 dp: 2-dp money and their 2-3-way
  products), so ``x*1e6`` sits within ~1e-7 of an integer — never at a .5
  tie — and round-to-nearest agrees regardless of the engine's tie rule.
- Integer addition is associative: any partition count, any reduction order.

Range: |x| ≤ ~9.2e12 before the scaled value overflows bigint, and group sums
are exact up to 2^63; the final double cast is deterministic in both engines.
For 100 TB production aggregates where ULP-reproducibility doesn't matter,
plain SUM(double) is fine and marginally faster — these helpers exist for
externally-compared results.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

SCALE = 1_000_000  # 6 decimal places
DECIMAL = "decimal(28,10)"  # exact accumulator for single-engine use


def _scaled(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * float(SCALE)).cast("bigint")


def ds(col) -> Column:
    """Deterministic SUM of a ≤6-dp double expression (returns double)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_scaled(c)).cast("double") / float(SCALE)


def da(col) -> Column:
    """Deterministic AVG of a ≤6-dp double expression (returns double)."""
    c = F.col(col) if isinstance(col, str) else col
    return ds(c) / F.count(c)


def dwin_sum(col, window) -> Column:
    """Deterministic windowed SUM (returns double)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_scaled(c)).over(window).cast("double") / float(SCALE)


def ds_expr(expr: str) -> Column:
    """``ds`` built from ONE parsed SQL string instead of a ~8-call py4j
    Column chain — the operator tree is identical (sum of round-scaled
    bigints, cast double, divide), but query construction is one driver
    round-trip. The bench times query construction inside each rep, and the
    Column-builder form measured ~15-20 ms per aggregate of pure py4j
    latency (guide §5: the driver should do almost no per-query work)."""
    return F.expr(dsum_sql(expr))


def da_expr(expr: str) -> Column:
    """``da`` as one parsed SQL string (see ds_expr)."""
    return F.expr(davg_sql(expr))


def dsum_sql(expr: str) -> str:
    return (
        f"(CAST(sum(CAST(round(({expr}) * {SCALE}.0) AS BIGINT)) AS DOUBLE)"
        f" / {SCALE}.0)"
    )


def davg_sql(expr: str) -> str:
    return f"({dsum_sql(expr)} / count({expr}))"


def dwin_sum_sql(expr: str, over: str) -> str:
    return (
        f"(CAST(sum(CAST(round(({expr}) * {SCALE}.0) AS BIGINT)) OVER {over}"
        f" AS DOUBLE) / {SCALE}.0)"
    )
