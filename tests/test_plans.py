"""Physical-plan hygiene tests (SURVEY.md §4): the properties that make these
queries scale are asserted on the *plans*, not just the results — predicate
pushdown into the parquet scan, column pruning, broadcast of dimension sides,
rank-limit pushdown, partition pruning on the curated lake, and no Python
evaluation inside any registered query."""

from __future__ import annotations

import pyspark.sql.functions as F

from datalakejson_spark.registry import all_specs
from datalakejson_spark.sources.catalog import register_curated_table

SF = "/root/testdata/sf0.01"


def plan_of(spark, name: str) -> str:
    df = all_specs()[name].fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_flagship_pushdown_and_pruning(spark):
    plan = plan_of(spark, "g3_flagship_pricing_summary")
    # date filter reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: unused columns (l_orderkey etc.) are not in ReadSchema
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    assert "l_quantity" in read_schema
    # two-phase aggregate: partial (map-side combine) + final after exchange
    assert "partial_sum" in plan and "Exchange" in plan


def test_star_join_broadcasts_dimensions(spark):
    plan = plan_of(spark, "j3_star_join_revenue")
    assert "BroadcastHashJoin" in plan
    # the only non-broadcast join is fact⋈orders
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_semi_anti_join_shapes(spark):
    assert "LeftSemi" in plan_of(spark, "j2_semi_join_membership")
    assert "LeftAnti" in plan_of(spark, "j1_anti_join_registration")


def test_topn_uses_window_group_limit(spark):
    plan = plan_of(spark, "w5_topn_per_group")
    assert "WindowGroupLimit" in plan


def test_order_limit_uses_take_ordered(spark):
    plan = plan_of(spark, "o1_order_limit_claim")
    assert "TakeOrderedAndProject" in plan


def test_exists_rewrites_to_semi_join(spark):
    plan = plan_of(spark, "sq1_exists_semi")
    assert "LeftSemi" in plan
    plan2 = plan_of(spark, "sq4_correlated_scalar")
    # decorrelated: an aggregate feeding a join, not a per-row subquery
    assert "Subquery" not in plan2 or "BroadcastHashJoin" in plan2 or "SortMergeJoin" in plan2


def test_minhash_pipeline_executes_once(spark):
    """The round-1 defect: LSH banding referenced the signature pipeline 8x
    (4 band branches x 2 join sides) with no exchange reuse. The fixed shape
    (one explode over the signature table + forced sort-merge self-join) must
    show exactly ONE documents scan and a ReusedExchange in the FINAL
    adaptive plan — i.e. the shingle+md5+aggregate pipeline runs once."""
    df = all_specs()["l2_minhash_lsh_pairs"].fn(spark, SF)
    df.collect()  # executedPlan is final only after the df itself executes
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1, final
    assert "ReusedExchange" in final, final


def test_minhash_shingle_pipeline_not_duplicated_at_scan(spark):
    """The round-5 l2 bench doubling: exploding the shingle array as a
    projected COLUMN let InferFiltersFromGenerate infer size(shingles) > 0
    and push it through the defining projection — re-running the whole
    split→transform→concat_ws→array_distinct pipeline per row inside the
    scan's DataFilters (measured 2× wall time). The scan must carry only
    cheap filters; the shingle expression must appear once per pipeline,
    never in a Filter."""
    df = all_specs()["l2_minhash_lsh_pairs"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Filter" in line or "FileScan" in line:
            assert "array_distinct" not in line, line
            assert "concat_ws" not in line, line


#: registered queries whose PLAN may contain ArrowEvalPython — the
#: vectorized ANN scale paths, where the einsum cosine pandas UDF IS the
#: design (l3f joined in round 14 once its pre-checkpoint plan became
#: guard-visible via plan_fn). (MapInPandas has always been sanctioned for
#: the Arrow-batched per-partition operators — l8/l9 shard packing,
#: multimodal extraction — and is not what this guard polices.)
#: Row-at-a-time BatchEvalPython is banned EVERYWHERE, allowlist included.
_ARROW_PYTHON_OK = {
    "l3d_exact_topk_vectorized",
    "l3e_ann_ivf_persisted",
    "l3f_ann_lsh_persisted",
    "l3g_ann_ivf_lifecycle",  # same Arrow/BLAS probe as l3e (r15 rotation)
    "l3h_ann_lsh_lifecycle",  # same Arrow/BLAS probe as l3f (r15, extended)
}

#: registered queries whose RETURNED plan legitimately contains a
#: checkpointed-RDD scan WITHOUT exposing a plan_fn: their checkpoints are
#: mid-pipeline lineage truncations (the interesting operators still appear
#: in the returned plan and are pinned by their own plan tests), not
#: result-wrapping checkpoints that would hide the whole pipeline the way
#: l3e/l3f's scratch-index pattern does. Any NEW checkpoint-backed query
#: fails the guard until it either exposes a plan_fn or is adjudicated
#: into this set — checkpointing is no longer a bypass (VERDICT r13).
_CHECKPOINT_INTERNAL_OK = {
    # two-pass ranking: checkpoints the bounded per-partition boundary
    # table; the rank arithmetic is in the returned plan
    "w1b_distributed_ranking",
    # iterative connected components: per-round lineage truncation (the
    # plan would otherwise grow exponentially with rounds)
    "l2e_dedup_clusters",
    "l2h_neardup_clusters",
    # range-exchange pinned inside the checkpoint; the packing operators
    # (MapInPandas, no window/exchange) are asserted on the returned plan
    # by test_token_shards_have_no_global_window
    "l8_token_shards",
    "l9_shard_manifest",
}


def _assert_no_python_eval(name: str, plan: str) -> None:
    """The one spelling of the guard's assertion — the negative tests below
    drive it directly with hand-built bypass attempts."""
    assert "BatchEvalPython" not in plan, name
    if name not in _ARROW_PYTHON_OK:
        assert "ArrowEvalPython" not in plan, name


def test_no_python_eval_in_registered_queries(spark):
    """Every registered operator stays JVM-side (UDFs live only in the
    explicitly-Python §2.11 surface, not in the oracle-checked library) —
    except the explicitly-allowlisted Arrow/BLAS ANN queries, which must
    still never fall back to row-at-a-time Python. Queries returning an
    eagerly-checkpointed result expose their PRE-checkpoint plan via
    spec.plan_fn, so the guard sees what actually executed; a
    checkpoint-backed plan with neither plan_fn nor an adjudicated
    allowlist entry is itself a failure (the r13 bypass)."""
    for name, spec in all_specs().items():
        if spec.plan_fn is not None:
            plan = spec.plan_fn(spark, SF)
        else:
            plan = (
                spec.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
            )
            if "ExistingRDD" in plan or "LogicalRDD" in plan:
                assert name in _CHECKPOINT_INTERNAL_OK, (
                    f"{name} returns a checkpoint-backed plan the guard "
                    "cannot walk: expose the pre-checkpoint plan via "
                    "register(plan_fn=...) or adjudicate it into "
                    "_CHECKPOINT_INTERNAL_OK"
                )
        _assert_no_python_eval(name, plan)


def test_plan_guard_sees_through_l3f_checkpoint(spark):
    """The r13 bypass, pinned shut: l3f's plan_fn must surface the probe's
    cosine_np ArrowEvalPython (which the returned checkpointed plan hides),
    and it passes the guard only via the explicit allowlist."""
    spec = all_specs()["l3f_ann_lsh_persisted"]
    assert spec.plan_fn is not None
    plan = spec.plan_fn(spark, SF)
    assert "ArrowEvalPython" in plan  # guard-visible now
    assert "l3f_ann_lsh_persisted" in _ARROW_PYTHON_OK  # passes only via this
    returned = spec.fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in returned  # the hiding the fix is about


def test_plan_guard_rejects_checkpointed_python_eval(spark):
    """Negative control: a query that wraps row-at-a-time Python eval in a
    localCheckpoint must still FAIL the guard once its pre-checkpoint plan
    is exposed — and without a plan_fn, the checkpoint-backed plan itself
    is rejected unless adjudicated."""
    import pytest
    from pyspark.sql.functions import col, udf

    slow = udf(lambda s: (s or "") + "!")
    df = (
        spark.range(10)
        .select(slow(col("id").cast("string")).alias("x"))
    )
    pre_checkpoint_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" in pre_checkpoint_plan  # the smuggled eval
    with pytest.raises(AssertionError):
        _assert_no_python_eval("smuggler", pre_checkpoint_plan)
    # and the checkpointed RETURN plan is exactly the bypass shape the
    # registered-query guard now refuses for non-adjudicated queries
    returned = (
        df.localCheckpoint(eager=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ExistingRDD" in returned or "LogicalRDD" in returned
    assert "BatchEvalPython" not in returned  # hidden — hence the refusal
    assert "smuggler" not in _CHECKPOINT_INTERNAL_OK


def test_partition_pruning_on_curated_lake(spark, tmp_path):
    """Hive-layout curated lake + catalog registration + partition-filtered
    read: the scan must list only matching partitions (X1)."""
    # build a small partitioned curated dir
    df = spark.range(100).select(
        F.col("id").alias("record_id"),
        (F.col("id") % 3 + 2022).cast("int").alias("year"),
        F.lit(1).alias("month"),
        F.lit(1).alias("day"),
        F.when(F.col("id") % 2 == 0, "train").otherwise("eval").alias("mode"),
    )
    curated = str(tmp_path / "curated")
    df.write.partitionBy("year", "month", "day", "mode").parquet(curated)

    fq = register_curated_table(spark, curated, table="t_prune")
    q = spark.sql(f"SELECT record_id FROM {fq} WHERE year = 2022 AND mode = 'train'")
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    assert q.count() == 17  # ids ≡ 0 (mod 6) and ≡ ... : 100/6 → 17 even ids with id%3==0
    # count check: ids where id%3==0 (year 2022) and id%2==0 (train): id%6==0 → 17 of 0..99


def test_catalog_partitions_listed(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id").alias("record_id"),
        F.lit(2024).alias("year"),
        F.lit(2).alias("month"),
        (F.col("id") % 2 + 1).cast("int").alias("day"),
        F.lit("train").alias("mode"),
    )
    curated = str(tmp_path / "curated2")
    df.write.partitionBy("year", "month", "day", "mode").parquet(curated)
    fq = register_curated_table(spark, curated, table="t_parts")
    parts = {r[0] for r in spark.sql(f"SHOW PARTITIONS {fq}").collect()}
    assert parts == {
        "year=2024/month=2/day=1/mode=train",
        "year=2024/month=2/day=2/mode=train",
    }


def test_decontamination_broadcasts_benchmark_side(spark):
    """l7's scale contract: the eval-suite shingle set broadcasts; the corpus
    side is never shuffled on text (no SortMergeJoin against the corpus
    shingles)."""
    plan = plan_of(spark, "l7_decontamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_token_shards_have_no_global_window(spark):
    """l8's scale contract: the prefix sum runs WITHIN each range partition
    (sortWithinPartitions + vectorized mapInPandas) — a bare global-order
    window would plan a SinglePartition exchange and serialize on one task,
    and a window partitioned on spark_partition_id would add a second,
    hash-on-pid exchange (VERDICT r03). One range exchange, nothing else."""
    plan = plan_of(spark, "l8_token_shards")
    assert "SinglePartition" not in plan, plan
    assert "MapInPandas" in plan, plan
    assert "Window" not in plan, plan
    # the one range exchange ran inside the (lineage-truncating) checkpoint
    # job; the packing plan itself is exchange-free
    assert "Exchange" not in plan, plan


def test_bucketed_range_join_is_equi_join(spark):
    """j9b's scale contract: the manufactured bucket key turns the range
    join into an equi-join — no nested-loop probe anywhere in the plan, and
    the exact range predicate survives as a residual filter/condition."""
    plan = plan_of(spark, "j9b_range_join_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "_bkt" in plan  # joined on the bucket key
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_salted_join_spreads_hot_keys(spark):
    """j11's scale contract: the join's exchange partitions on
    (event_type, _salt) — the hot key is spread across n_salt reducers —
    and the salt never reaches the output schema."""
    plan = plan_of(spark, "j11_salted_hot_key_join")
    import re

    exchanges = re.findall(r"hashpartitioning\([^)]*\)", plan)
    assert any("_salt" in e for e in exchanges), exchanges
    df = all_specs()["j11_salted_hot_key_join"].fn(spark, SF)
    assert "_salt" not in df.columns


def test_bucketed_range_join_subsecond_endpoints(spark):
    """Exactness regression: intervals/events with sub-second endpoints must
    produce the same pairs as the plain range join (the review caught a
    '-1 full second' bucket bound that dropped matches like ts=08:00:00.3
    against hi=08:00:00.5)."""
    from datalakejson_spark.operators.joins import bucketed_range_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 07:59:59.9"), (2, "2024-01-01 08:00:00.3"),
         (3, "2024-01-01 08:00:00.7"), (4, "2024-01-01 09:00:00.0")],
        "ev_id int, ts_s string",
    ).select("ev_id", F.col("ts_s").cast("timestamp_ntz").alias("ts"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 07:00:00", "2024-01-01 08:00:00.5"),
         (11, "2024-01-01 08:00:00.5", "2024-01-01 09:00:00")],
        "win_id int, lo_s string, hi_s string",
    ).select(
        "win_id",
        F.col("lo_s").cast("timestamp_ntz").alias("lo"),
        F.col("hi_s").cast("timestamp_ntz").alias("hi"),
    )
    got = {
        (r.ev_id, r.win_id)
        for r in bucketed_range_join(left, right, "ts", "lo", "hi", 3600).collect()
    }
    expect = {
        (r.ev_id, r.win_id)
        for r in left.join(
            right, (left.ts >= right.lo) & (left.ts < right.hi)
        ).collect()
    }
    assert got == expect == {(1, 10), (2, 10), (3, 11)}


def test_bucketed_range_join_inverted_interval_is_empty(spark):
    """Spark sequence(start, stop) DESCENDS when stop < start, so an
    inverted interval (hi <= lo) would explode into bucket rows — a badly
    inverted one into millions — before the residual filter discards them.
    The interval side must be guarded (hi > lo) BEFORE the explode."""
    from datalakejson_spark.operators.joins import bucketed_range_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 08:00:00")], "ev_id int, ts_s string"
    ).select("ev_id", F.col("ts_s").cast("timestamp_ntz").alias("ts"))
    right = spark.createDataFrame(
        # 10: empty (hi == lo); 11: inverted by ~30 YEARS — unguarded, the
        # descending sequence would materialize ~260k hourly buckets;
        # 12: a normal window that must still match.
        [(10, "2024-01-01 08:00:00", "2024-01-01 08:00:00"),
         (11, "2024-01-01 00:00:00", "1994-01-01 00:00:00"),
         (12, "2024-01-01 07:00:00", "2024-01-01 09:00:00")],
        "win_id int, lo_s string, hi_s string",
    ).select(
        "win_id",
        F.col("lo_s").cast("timestamp_ntz").alias("lo"),
        F.col("hi_s").cast("timestamp_ntz").alias("hi"),
    )
    joined = bucketed_range_join(left, right, "ts", "lo", "hi", 3600)
    assert {(r.ev_id, r.win_id) for r in joined.collect()} == {(1, 12)}


def test_nested_schema_pruning_reaches_scan(spark, tmp_path):
    """Projecting one leaf of a struct column must prune the ReadSchema to
    that leaf — at 100 TB reading `metadata.app_version` out of a wide
    nested record should not deserialize the whole struct."""
    nested = spark.createDataFrame(
        [(i, (f"v{i % 3}", f"ua-{i}", "x" * 50)) for i in range(100)],
        "id long, metadata struct<app_version string, user_agent string, blob string>",
    )
    path = str(tmp_path / "nested")
    nested.write.parquet(path)
    df = spark.read.parquet(path).select("id", "metadata.app_version")
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "app_version" in read_schema
    assert "user_agent" not in read_schema and "blob" not in read_schema
    assert df.count() == 100


def test_simhash_pipeline_executes_once(spark):
    """l2f's self-join must ReuseExchange like l2's (the merge hint): a
    broadcast side would force the 64-vote signature pipeline to execute
    twice — one scan, one shared exchange."""
    df = all_specs()["l2f_simhash_pairs"].fn(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1, final
    assert "ReusedExchange" in final, final


def test_runtime_bloom_filter_in_shuffle_join_regime(spark):
    """At 100 TB a filtered dimension exceeds the broadcast threshold, so
    star joins run as shuffle joins — and Spark's InjectRuntimeFilter then
    plants a bloom filter (might_contain) on the FACT side's scan, the
    semi-join reduction that keeps the big shuffle proportional to the
    dimension's selectivity. Pin that our declarative join shape qualifies:
    simulate the regime (broadcast off, thresholds opened) and assert the
    filter is injected AND results are identical to the broadcast plan."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")

    def shape():
        return li.join(
            orders.filter("o_orderpriority = '1-URGENT'").select("o_orderkey"),
            li.l_orderkey == orders.o_orderkey,
        )

    baseline = shape().count()
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100GB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0",
        )
        df = shape()
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized, optimized
        assert df.count() == baseline  # reduction must not change results
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """The hot-key posture at 100 TB: when one join key dominates, AQE's
    OptimizeSkewedJoin must split the oversized shuffle partition instead
    of serializing it through one task (SortMergeJoin(skew=true) +
    'AQEShuffleRead coalesced and skewed'). Pin it with a synthetic hot key
    at test-scale thresholds — and note the operational trap this test
    encodes: a downstream exchange-requiring op (e.g. count()'s aggregate)
    suppresses the split unless forceOptimizeSkewedJoin is on, so the
    assertion drives the join through collect()."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(200000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        )
        cold = spark.range(20000).select(
            (F.col("id") % 1000 + 1).alias("k"), F.col("id").alias("v")
        )
        right = spark.range(1001).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
        j = hot.union(cold).join(right, "k")
        rows = j.collect()
        assert len(rows) == 220000  # splitting must not change results
        final = j._jdf.queryExecution().executedPlan().toString().split(
            "== Initial Plan =="
        )[0]
        assert "skew=true" in final, final
        assert "coalesced and skewed" in final, final
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_curated_layout(spark, tmp_path):
    """Dynamic Partition Pruning: joining a hive-partitioned fact table to
    a FILTERED dimension must prune fact partitions by the dimension's
    runtime key set ('dynamicpruningexpression(k IN ...)' surviving into
    the FINAL plan's PartitionFilters, plus a measured partial scan) — at
    100 TB this turns a star join over the curated lake's partition layout
    into a read of the few matching partitions. Static pruning
    (test_partition_pruning_on_curated_lake) cannot do this: the surviving
    keys only exist at runtime.

    TWO traps this test encodes: (1) with reuseBroadcastOnly (default) the
    dimension broadcast must be STATICALLY planned — an AQE-converted
    broadcast comes too late and the executed filter degrades to
    dynamicpruningexpression(true), silently scanning everything (observed
    without the hint on this fixture); the engine's star joins qualify
    because dimension sides are statically broadcastable. (2) The partition
    column's inferred type must match the join key's type or the inserted
    cast also blocks the reuse."""
    import pyspark.sql.functions as F

    fact = spark.range(10000).select(
        (F.col("id") % 10).cast("int").alias("k"), F.col("id").alias("v")
    )
    fact.write.partitionBy("k").parquet(str(tmp_path / "fact"))
    dim = spark.createDataFrame(
        [(i, "a" if i < 2 else "b") for i in range(10)], "k int, grp string"
    )
    f = spark.read.parquet(str(tmp_path / "fact"))
    j = f.join(F.broadcast(dim.filter("grp = 'a'")), "k")
    rows = j.collect()  # collect: metrics attach to THIS QueryExecution
    assert len(rows) == 2000  # keys 0 and 1 × 1000 rows each
    final = j._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    scan_line = next(
        line for line in final.split("\n") if "PartitionFilters" in line
    )
    assert "dynamicpruningexpression(k" in scan_line, scan_line  # not (true)
    assert "SubqueryBroadcast" in final, final
    # and the pruning actually happened: of 10k fact rows only the 2
    # surviving keys' partitions were ever scanned (2000 + the 10 dim rows)
    from datalakejson_spark.plans.metrics import executed_summary

    s = executed_summary(j)
    assert s["scan_rows"] == 2010, s


# ---------------------------------------------------------------------------
# Shuffle-envelope regression pins (round 10, VERDICT r9 #3): the measured
# SQLMetrics in METRICS.md show what the headline plans SHOULD cost at
# sf0.1 — these assertions turn a future plan regression (lost broadcast,
# new exchange, silent spill) into a test failure instead of a bench
# mystery. Envelopes are ~2x the measured steady-state value, far below
# what the degraded plan would produce (e.g. j3 without its dimension
# broadcasts shuffles the joined fact rows: ~100 MiB at sf1-scale vs the
# 2.3 KiB of 35 aggregated rows it shuffles today).
# ---------------------------------------------------------------------------
SF01 = "/root/testdata/sf0.1"


def _summary_at_sf01(spark, name: str):
    from datalakejson_spark.plans.metrics import executed_summary

    df = all_specs()[name].fn(spark, SF01)
    df.collect()  # metrics attach to THIS QueryExecution
    return executed_summary(df)


def test_j3_star_join_shuffle_envelope(spark):
    """4 dimension broadcasts; the only non-trivial exchange carries the
    ORDER-grain pre-aggregate (r15, guide §2.3: lineitem is reduced to one
    (orderkey, scaled-revenue, n_lines) row per order BEFORE any join), so
    shuffled bytes stay a fraction of the raw fact bytes (~11 MiB at
    sf0.1)."""
    s = _summary_at_sf01(spark, "j3_star_join_revenue")
    assert s["n_broadcasts"] >= 4, s
    assert s["shuffle_bytes"] < 6 * 1024 * 1024, s
    assert s["spill_bytes"] == 0, s


def test_g3_flagship_shuffle_envelope(spark):
    """Two-phase hash agg: one exchange carrying only the partial-agg rows
    (measured 1 exchange / 792 B at sf0.1)."""
    s = _summary_at_sf01(spark, "g3_flagship_pricing_summary")
    assert s["n_exchanges"] == 1, s
    assert s["shuffle_bytes"] < 8 * 1024, s
    assert s["spill_bytes"] == 0, s


def test_l2_minhash_shuffle_envelope(spark):
    """Band-bucket LSH join: shuffles signatures + bucket pairs, never doc
    bodies (measured 3 exchanges / ~1 MiB at sf0.1; bodies would be tens
    of MiB)."""
    s = _summary_at_sf01(spark, "l2_minhash_lsh_pairs")
    assert s["shuffle_bytes"] < 2 * 1024 * 1024, s
    assert s["spill_bytes"] == 0, s


def test_l3_cosine_topk_shuffle_envelope(spark):
    """Query side broadcasts; the candidate side crosses one adaptive
    spread_scan exchange (r15, guide §2.5: the single-row-group fixture scan
    would otherwise run every dot product on ONE task; no-op on real-scale
    scans) and only the per-partition top-k survivors cross the window
    exchange — never the q× pair table."""
    s = _summary_at_sf01(spark, "l3_cosine_topk")
    assert s["n_broadcasts"] >= 1, s
    # one pass of the (small by construction) embeddings table + survivors
    assert s["shuffle_bytes"] < 1536 * 1024, s
    assert s["spill_bytes"] == 0, s


def test_g6_rollup_single_scan_envelope(spark):
    """r16 (settling the r15 VERDICT open item): g6 aggregates to the finest
    (year, month) grain FIRST, then rolls up the ~84-row result — so the
    executed plan must read lineitem EXACTLY ONCE (the r15 union form left
    three lineage branches: 3 scans whenever runtime exchange reuse failed
    to fire, which is what the driver measured), Expand only the finest
    rows (shuffle stays a few KiB), and never touch Python or spill."""
    s = _summary_at_sf01(spark, "g6_rollup_time_hierarchy")
    n_lineitem = 600_000  # sf0.1 fixture row count
    assert s["scan_rows"] <= n_lineitem, s  # ONE fact pass, not three
    assert s["n_exchanges"] == 2, s  # finest agg + rollup agg
    assert s["shuffle_bytes"] < 64 * 1024, s  # grain rows only, never facts
    assert s["spill_bytes"] == 0, s
