"""Parquet scan layer for the driver-generated fixture tables (S8).

Reference parity: consumption reads of the curated Parquet lake —
"Reads large datasets in batches ... leveraging S3, Parquet, and partitioning"
(/root/reference/diagram3:140). At 100 TB the scan must push filters and
projections into the parquet reader; we express everything declaratively so
Catalyst's `PushedFilters` / `ReadSchema` pruning applies (SURVEY.md §4 X1-X2).

Fixture quirk: ``events.ts`` is written as parquet TIMESTAMP(NANOS), which
Spark's vectorized reader rejects. With ``spark.sql.legacy.parquet.nanosAsLong``
the column arrives as nanosecond longs; we convert to TIMESTAMP_NTZ truncated
to microseconds (Spark's native precision). The DuckDB oracle mirrors this
with ``date_trunc('microseconds', ts)``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.session import configure_runtime

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Lazy — no action is triggered."""
    configure_runtime(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos long -> microsecond TIMESTAMP_NTZ (session tz is pinned UTC,
        # so the tz-strip cast is exact).
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]
