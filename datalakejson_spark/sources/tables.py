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

import os

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

#: Per-session (path, mtime) -> analyzed DataFrame. ``spark.read.parquet``
#: re-reads the footer for schema inference and re-lists the path on every
#: call — driver-side metadata work a catalog/metastore would cache. This is
#: METADATA caching only (the scan DataFrame is an immutable lazy plan):
#: every action on it still reads the parquet files; no rows or results are
#: memoized. Keyed on the path's mtime so a regenerated /tmp scaled fixture
#: invalidates its entry; stored as an ATTRIBUTE ON THE SESSION OBJECT
#: (ADVICE r15: a module-level dict keyed on id(spark) can hand a plan bound
#: to a dead JVM to a new session whose wrapper recycled the old object's
#: id, and it grows without bound across sessions) — the cache's lifetime is
#: exactly the session wrapper's lifetime.
_SCAN_CACHE_ATTR = "_dlj_scan_cache"


def _path_mtime(path: str) -> float:
    try:
        return os.stat(path).st_mtime
    except OSError:
        return -1.0


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Lazy — no action is triggered."""
    configure_runtime(spark)
    path = f"{sf_dir}/{name}.parquet"
    cache: dict[tuple[str, float], DataFrame] = getattr(spark, _SCAN_CACHE_ATTR, None)
    if cache is None:
        cache = {}
        setattr(spark, _SCAN_CACHE_ATTR, cache)
    key = (path, _path_mtime(path))
    cached = cache.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos long -> microsecond TIMESTAMP_NTZ (session tz is pinned UTC,
        # so the tz-strip cast is exact).
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    cache[key] = df
    return df


def spread_scan(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition a scan-rooted frame across the cluster when (and only
    when) its scan cannot feed every core — the guide §2.5 mitigation for
    unsplittable input (one gzip file / a parquet file with one row group,
    which is the shape of the small fixtures: a single row group makes the
    whole scan ONE task no matter how many cores exist, so every per-row
    expression downstream runs single-threaded).

    Scale-adaptive by construction: when the scan already has at least half
    as many input splits as cores (any real-scale table), this is a no-op and
    no exchange is added — so the 100 TB plan shape is unchanged, while the
    starved local scan gains an exchange that costs one pass of the (small,
    by definition: it fit in so few splits) input. Partitioning is HASH on a
    caller-chosen deterministic column — never round-robin, which both pays a
    local sort of the input (sortBeforeRepartition) and is unsafe under task
    retry with non-deterministic upstreams (SPARK-38388).

    Contract (ADVICE r15): pass SCAN-ROOTED frames — a load_table output or
    a pure projection/filter over one. The split count is read via
    ``df.rdd``, which (a) costs an analyze+physical-plan pass that is only
    amortized by the memo when callers share the load_table frame, and
    (b) reflects pre-AQE partitioning, which misreads post-shuffle frames.
    Derive columns ABOVE the spread (spread-then-derive), not below it.
    """
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    # Physical scan split count; computed driver-side, no job is triggered.
    # Memoized on the frame — the .rdd conversion plans the query once, and
    # load_table hands out one shared frame per (session, path).
    n_parts = getattr(df, "_dlj_scan_parts", None)
    if n_parts is None:
        n_parts = df.rdd.getNumPartitions()
        df._dlj_scan_parts = n_parts
    if n_parts * 2 > cores:
        return df
    return df.repartition(cores, F.col(key))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]
