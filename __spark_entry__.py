"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``datalakejson_spark`` package; this module just
adapts the package's query registry (datalakejson_spark/registry.py) to the
driver contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the driver's CWD.
_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from datalakejson_spark.registry import driver_specs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary, SURVEY.md §7.1) on
    /root/testdata/sf0.001; driver checks rows>0."""
    from datalakejson_spark.operators.aggregates import g3_flagship_pricing_summary

    return g3_flagship_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The curated driver tier: ≤50 queries (the driver verifies only the
    first 50 alphabetically) in which every SURVEY.md §2 operator family
    appears at least once. The redundant long-tail variants (TPC-H showcase
    queries, extra per-function demos) live in the *extended* tier —
    registry.all_specs() — and are oracle-verified locally by
    tools/verify_oracle.py and the test suite."""
    return {name: spec.fn for name, spec in sorted(driver_specs().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; rows-only
    queries (sketches, approximations, engine-defined heuristics) are
    intentionally absent per the driver contract."""
    return {
        name: spec.sql for name, spec in sorted(driver_specs().items()) if spec.sql
    }
