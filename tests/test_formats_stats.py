"""Source-format generalization (CSV PERMISSIVE, ORC roundtrip) and the
DataFrame stat-function surface (crosstab, freqItems, sampleBy, summary)."""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import types as T

from datalakejson_spark.sources.formats import (
    read_columnar,
    read_csv_permissive,
    write_columnar,
)

SF = "/root/testdata/sf0.001"

CSV_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def test_csv_permissive_corrupt_capture(spark, tmp_path: Path):
    p = tmp_path / "drop.csv"
    p.write_text(
        "id,name,amount\n"
        "1,alpha,10.5\n"
        "2,beta,20.0\n"
        "not-a-number,gamma,xyz\n"  # malformed row
        "4,delta,40.25\n"
    )
    # persist first: Spark disallows queries that touch ONLY the corrupt
    # column on a raw text scan (same reason the ingest plane caches its raw
    # batch before splitting)
    df = read_csv_permissive(spark, str(p), CSV_SCHEMA).persist()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 3
    assert bad.count() == 1
    assert bad.first()["_corrupt_record"].startswith("not-a-number")
    assert good.agg(F.sum("amount")).first()[0] == 70.75
    # lineage column present, like the JSON path (S3)
    assert good.select("source_s3_path").first()[0].endswith("drop.csv")


def test_orc_roundtrip_with_partitioning(spark, tmp_path: Path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").limit(500)
    out = str(tmp_path / "orc_lake")
    write_columnar(
        li.withColumn("year", F.year("l_shipdate")),
        out,
        fmt="orc",
        partition_cols=("year",),
    )
    back = read_columnar(spark, out, fmt="orc")
    assert back.count() == 500
    assert set(back.columns) == set(li.columns) | {"year"}
    # partition layout on disk
    assert any(d.name.startswith("year=") for d in Path(out).iterdir() if d.is_dir())
    # values survive the roundtrip
    a = li.agg(F.sum("l_extendedprice")).first()[0]
    b = back.agg(F.sum("l_extendedprice")).first()[0]
    assert abs(a - b) < 1e-6


def test_crosstab_matches_groupby(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    ct = orders.stat.crosstab("o_orderstatus", "o_orderpriority")
    total = 0
    for row in ct.collect():
        total += sum(int(v) for k, v in row.asDict().items()
                     if k != "o_orderstatus_o_orderpriority")
    assert total == orders.count()


def test_freq_items_contains_true_heavy_hitter(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    top = (
        events.groupBy("event_type").count().orderBy(F.desc("count")).first()[0]
    )
    freq = events.stat.freqItems(["event_type"], support=0.2).first()[0]
    assert top in freq


def test_sample_by_stratified(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    fractions = {"AUTOMOBILE": 0.5, "BUILDING": 0.1}
    sampled = cust.sampleBy("c_mktsegment", fractions, seed=42)
    counts = {r[0]: r[1] for r in sampled.groupBy("c_mktsegment").count().collect()}
    full = {r[0]: r[1] for r in cust.groupBy("c_mktsegment").count().collect()}
    assert set(counts) <= set(fractions)  # unlisted strata excluded entirely
    assert counts.get("AUTOMOBILE", 0) > counts.get("BUILDING", 0)
    assert counts["AUTOMOBILE"] < full["AUTOMOBILE"]


def test_summary_stats_surface(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    summ = li.select("l_quantity", "l_extendedprice").summary(
        "count", "mean", "min", "max"
    )
    rows = {r["summary"]: r for r in summ.collect()}
    assert float(rows["count"]["l_quantity"]) == li.count()
    assert 1 <= float(rows["mean"]["l_quantity"]) <= 50
