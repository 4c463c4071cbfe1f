"""r15 optimization internals: spread_scan's adaptive gate, the load_table
metadata cache, and configure_runtime's per-session memo."""

from __future__ import annotations

import shutil
import time

import pyspark.sql.functions as F

from datalakejson_spark.session import configure_runtime
from datalakejson_spark.sources.tables import load_table, spread_scan

SF = "/root/testdata/sf0.01"


def test_spread_scan_fires_on_starved_scan(spark):
    """A single-row-group fixture scan has fewer splits than half the cores
    (8 in the test session) → spread_scan must add a hash repartition to
    defaultParallelism, and the rows must be unchanged."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spread = spread_scan(docs, "doc_id")
    cores = spark.sparkContext.defaultParallelism
    assert spread.rdd.getNumPartitions() == cores
    assert "repartitionbyexpression" in spread._jdf.queryExecution().logical().toString().lower()
    assert spread.count() == docs.count()


def test_spread_scan_noop_when_scan_feeds_cores(spark):
    """A frame that already has >= cores/2 partitions is returned unchanged
    (no exchange added) — the 100 TB shape: real scans are parallel."""
    cores = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, numPartitions=cores)
    assert spread_scan(wide, "id") is wide


def test_spread_scan_preserves_filter_pushdown(spark):
    """Filters written ABOVE the spread still reach the parquet scan: the
    optimizer pushes predicates through RepartitionByExpression."""
    li = spread_scan(spark.read.parquet(f"{SF}/lineitem.parquet"), "l_orderkey")
    q = li.filter(F.col("l_orderkey") <= 100).select("l_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_orderkey), LessThanOrEqual(l_orderkey,100)" in plan


def test_load_table_metadata_cache(spark, tmp_path):
    """Same (session, path, mtime) → the SAME analyzed frame (no footer
    re-read); touching the path invalidates the entry. Plan-object caching
    only — every action still scans the files."""
    a = load_table(spark, SF, "region")
    b = load_table(spark, SF, "region")
    assert a is b
    # a regenerated fixture (new mtime) must NOT hit the stale entry
    tmp_sf = tmp_path / "sf"
    tmp_sf.mkdir()
    shutil.copy(f"{SF}/region.parquet", tmp_sf / "region.parquet")
    c1 = load_table(spark, str(tmp_sf), "region")
    time.sleep(0.02)
    (tmp_sf / "region.parquet").touch()
    c2 = load_table(spark, str(tmp_sf), "region")
    assert c1 is not c2
    assert c2.count() == c1.count()


def test_configure_runtime_memoized(spark):
    configure_runtime(spark)
    assert getattr(spark, "_dlj_runtime_configured", False)
    # second call is a no-op returning the same session
    assert configure_runtime(spark) is spark
