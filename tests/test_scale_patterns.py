"""Scale-pattern tests: bucketed co-located joins (shuffle elimination),
compaction (small-file management), streaming dedup with watermark (T8)."""

from __future__ import annotations

import pyspark.sql.functions as F

from datalakejson_spark.plans.compact import compact, partition_file_stats

SF = "/root/testdata/sf0.001"


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Bucketing both join sides on the key lets the sort-merge join run
    without any Exchange — the co-located join strategy for repeated
    fact-fact joins at scale (SURVEY.md §2.3 / SCALE.md)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdb")
    spark.sql("DROP TABLE IF EXISTS bucketdb.li_b")
    spark.sql("DROP TABLE IF EXISTS bucketdb.ord_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("bucketdb.li_b")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        "bucketdb.ord_b"
    )
    joined = spark.table("bucketdb.li_b").join(
        spark.table("bucketdb.ord_b").hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    assert joined.count() == li.count()


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    # simulate many micro-batch appends into one partition
    curated = str(tmp_path / "curated")
    for batch in range(6):
        df = spark.range(batch * 10, batch * 10 + 10).select(
            F.col("id").alias("record_id"),
            F.lit(2024).alias("year"),
            F.lit(1).alias("month"),
            F.lit(1).alias("day"),
            F.lit("train").alias("mode"),
        )
        df.repartition(4).write.mode("append").partitionBy(
            "year", "month", "day", "mode"
        ).parquet(curated)

    part = f"{curated}/year=2024/month=1/day=1/mode=train"
    n_before, _ = partition_file_stats(part)
    assert n_before >= 20  # 6 batches × 4 tasks

    before_rows = spark.read.parquet(curated).count()
    result = compact(spark, curated)
    assert result[part] is True
    n_after, _ = partition_file_stats(part)
    assert n_after == 1
    # data intact, partition columns still derivable from layout
    after = spark.read.parquet(curated)
    assert after.count() == before_rows
    assert after.filter(F.col("year") == 2024).count() == before_rows
    # idempotent: second run is a no-op
    assert compact(spark, curated)[part] is False


def test_streaming_dedup_with_watermark(spark, tmp_path):
    """T8: dropDuplicates over a keyed stream — the row-level analogue of the
    ledger's ON CONFLICT DO NOTHING, with a watermark bounding state."""
    src = tmp_path / "stream_src"
    src.mkdir()
    (src / "a.json").write_text(
        '{"id": 1, "ts": "2024-01-01T00:00:00Z", "v": 10}\n'
        '{"id": 1, "ts": "2024-01-01T00:00:01Z", "v": 11}\n'  # dup id
        '{"id": 2, "ts": "2024-01-01T00:01:00Z", "v": 20}\n'
    )
    schema = "id long, ts string, v long"
    stream = (
        spark.readStream.schema(schema)
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT id FROM dedup_sink ORDER BY id").collect()
    assert [r.id for r in out] == [1, 2]


def test_aqe_splits_skewed_join_partition(spark):
    """Scale evidence for the skew claim (VERDICT r03): with AQE skew-join
    on, a sort-merge join whose shuffle has one dominant key gets that
    partition SPLIT at runtime — the executed plan must carry skew=true —
    instead of serializing the whole key on one task. Thresholds are
    lowered to make a test-sized skew trip the same machinery that guards
    the 100 TB joins."""
    lowered = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in lowered.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset key
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # left side: 200k rows, 95% on key 0, with an incompressible payload
        # that must survive into the shuffle (pruned or constant columns
        # compress below the skew threshold); right: 1k keys
        left = spark.range(200_000).selectExpr(
            "CASE WHEN id % 20 != 0 THEN 0 ELSE id % 1000 END AS k",
            "md5(CAST(id AS STRING)) AS pad",
        )
        right = spark.range(1_000).selectExpr("id AS k", "id * 2 AS v")
        joined = left.join(right.hint("merge"), "k")
        # action on the join df itself: its OWN execution must finalize for
        # executedPlan to be the adaptive final plan (count() plans separately)
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        final = plan.split("== Initial Plan ==")[0]
        assert "skew=true" in final, final
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_scan(spark, tmp_path):
    """Scale evidence for runtime row-level filtering: when a selective dim
    filters a fact across a NON-broadcast join, Catalyst injects a bloom
    filter built from the dim side into the fact scan (might_contain), so
    pruned fact rows die before the shuffle — at 100 TB this is the
    difference between shuffling the whole fact table and shuffling the
    matching slice. Thresholds are lowered so a test-sized join trips the
    same machinery (application-side default is 10 GB)."""
    lowered = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in lowered.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset key
            saved[k] = None
        spark.conf.set(k, v)
    try:
        fact_dir = str(tmp_path / "fact")
        dim_dir = str(tmp_path / "dim")
        spark.range(100_000).selectExpr(
            "id", "id % 5000 AS k", "md5(CAST(id AS STRING)) AS pad"
        ).write.parquet(fact_dir)
        # selective dim: 50 of 5000 keys survive the filter
        spark.range(5000).selectExpr("id AS k", "id % 100 AS grp").write.parquet(
            dim_dir
        )
        fact = spark.read.parquet(fact_dir)
        dim = spark.read.parquet(dim_dir).filter("grp = 0")
        joined = fact.join(dim.hint("merge"), "k")
        n = joined.count()
        assert n == 100_000 // 100  # 50 keys x 20 fact rows/key
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_two_phase_ranking_matches_window_exec(spark):
    """W1b scale path (r6): two_phase_ranking must reproduce WindowExec's
    row_number exactly — including with few keys, skewed key sizes, and a
    chunk count larger than the row count — while ntile follows the
    SQL bucket-size rule."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from datalakejson_spark.operators.windows import exact_ntile, two_phase_ranking

    rows = []
    # skewed: key "a" 900 rows, "b" 7, "c" 1
    for i in range(900):
        rows.append(("a", (i * 37) % 1000, i))
    for i in range(7):
        rows.append(("b", i % 3, 1000 + i))
    rows.append(("c", 5, 2000))
    df = spark.createDataFrame(rows, "k string, v long, uid long")

    order = [F.col("v").desc(), F.col("uid")]
    got = two_phase_ranking(df, ["k"], order, num_chunks=16)
    w = Window.partitionBy("k").orderBy(*order)
    expected = df.select(
        "k", "uid",
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
    )
    got_sel = got.select(
        "k", "uid", "rn",
        exact_ntile(F.col("rn"), F.col("_part_total"), 4).alias("quartile"),
    )
    assert got_sel.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got_sel).isEmpty()
    # chunk count far above row count: empty chunks must not shift offsets
    tiny = two_phase_ranking(df.filter("k = 'b'"), ["k"], order, num_chunks=64)
    assert sorted(r.rn for r in tiny.collect()) == list(range(1, 8))


def test_exact_ntile_bucket_rule(spark):
    """NTILE(n): first (total % n) buckets get one extra row — check the
    arithmetic against Spark's ntile for every total in 1..12 with n=5."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from datalakejson_spark.operators.windows import exact_ntile

    rows = [(t, i) for t in range(1, 13) for i in range(1, t + 1)]
    df = spark.createDataFrame(rows, "total int, rn int")
    w = Window.partitionBy("total").orderBy("rn")
    out = df.select(
        "total", "rn",
        exact_ntile(F.col("rn"), F.col("total"), 5).alias("mine"),
        F.ntile(5).over(w).alias("spark"),
    )
    assert out.filter(F.col("mine") != F.col("spark")).isEmpty()
