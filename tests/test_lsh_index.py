"""Persisted LSH index (functions/lsh_index.py round 13): probe parity with
the in-memory vectorized path, partition pruning at probe time, exactly-once
appends and tiered compaction via the shared maintenance plane."""

from __future__ import annotations

import os
import re

import pyspark.sql.functions as F
import pytest

from datalakejson_spark.functions.lsh_index import (
    build_lsh_index,
    compact_lsh_buckets,
    load_lsh_meta,
    lsh_index_append,
    lsh_index_topk,
    lsh_needs_compaction,
)
from datalakejson_spark.functions.similarity import lsh_ann_topk_np

SF = "/root/testdata/sf0.01"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_persisted_probe_matches_in_memory(spark, tmp_path):
    """Same family definition (planes, tables, seed) → the persisted,
    partition-pruned probe returns row-for-row the in-memory
    lsh_ann_topk_np result (identical buckets, identical candidate
    semantics, identical scoring)."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 8)
    idx = str(tmp_path / "lsh")
    meta = build_lsh_index(emb, idx, n_planes=4, n_tables=4)
    assert meta["n_vectors"] == emb.count()

    got = sorted(
        (r.query_id, r.neighbor_id, r.rn)
        for r in lsh_index_topk(spark, queries, idx).collect()
    )
    ref = sorted(
        (r.query_id, r.neighbor_id, r.rn)
        for r in lsh_ann_topk_np(
            emb, queries, n_planes=4, n_tables=4
        ).collect()
    )
    assert got == ref and got


def test_probe_prunes_bucket_partitions(spark, tmp_path):
    """The query's tb list reaches the scan as a PARTITION filter: one
    query over a 4-plane/4-table index reads at most 4 of the 64 tb
    directories — pinned in the executed plan and in the scan row count."""
    from datalakejson_spark.plans.metrics import executed_summary

    emb = _emb(spark)
    n = emb.count()
    idx = str(tmp_path / "lsh")
    build_lsh_index(emb, idx, n_planes=4, n_tables=4)
    # one file per bucket partition (the repartition("tb") contract)
    buckets_root = os.path.join(idx, "buckets")
    for d in os.listdir(buckets_root):
        if not d.startswith("tb="):
            continue
        files = [
            f
            for f in os.listdir(os.path.join(buckets_root, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)

    one_query = emb.filter(F.col("vec_id") == 3)
    ann = lsh_index_topk(spark, one_query, idx)
    rows = ann.collect()  # execute FIRST: AQE finalizes scans lazily
    assert rows
    plan = ann._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    assert re.search(r"PartitionFilters: \[tb#\d+ IN \(", plan), plan
    s = executed_summary(ann)
    # 4 tables x 1/16 of the corpus each — far under half even with skew
    assert 0 < s["scan_rows"] < (4 * n) / 2, (s["scan_rows"], n)


def test_append_is_exactly_once_and_probeable(spark, tmp_path):
    """An appended near-copy lands in the same buckets as its twin under
    the persisted family, becomes its top neighbor, and a batch_id replay
    is a no-op — the shared staged-publish machinery end-to-end."""
    emb = _emb(spark)
    idx = str(tmp_path / "lsh")
    build_lsh_index(emb, idx, n_planes=4, n_tables=4)

    base = emb.filter(F.col("vec_id") == 7).first()
    twin = [float(v) + 1e-4 for v in base.embedding]
    new = spark.createDataFrame(
        [(100000, twin)], "vec_id bigint, embedding array<double>"
    )
    assert lsh_index_append(spark, new, idx, batch_id="b1") == 1
    assert lsh_index_append(spark, new, idx, batch_id="b1") == 0  # replay
    live = spark.read.parquet(os.path.join(idx, "buckets"))
    # once per table it hashes into, never more (no duplicate append)
    per_table = (
        live.filter(F.col("vec_id") == 100000)
        .groupBy("tb")
        .count()
        .collect()
    )
    assert per_table and all(r["count"] == 1 for r in per_table)
    assert load_lsh_meta(idx)["n_vectors"] == emb.count() + 1

    queries = emb.filter(F.col("vec_id") == 7)
    top = lsh_index_topk(spark, queries, idx).filter(F.col("rn") == 1).first()
    assert top.neighbor_id == 100000
    assert top.cosine >= 0.999999


def test_bucket_compaction_folds_and_preserves_probes(spark, tmp_path):
    """Appends fragment the touched buckets one file per generation; the
    shared tiered compactor folds them back and the probe is row-for-row
    unchanged."""
    emb = _emb(spark)
    idx = str(tmp_path / "lsh")
    build_lsh_index(emb, idx, n_planes=4, n_tables=4)
    for g in range(3):
        delta = spark.createDataFrame(
            [(200000 + 10 * g + j, [float(g + j + 1)] * 64) for j in range(2)],
            "vec_id bigint, embedding array<double>",
        )
        lsh_index_append(spark, delta, idx, batch_id=f"g{g}")
    assert lsh_needs_compaction(idx, max_runs_per_bucket=2)

    queries = emb.filter(F.col("vec_id") < 8)
    want = sorted(
        (r.query_id, r.neighbor_id, r.rn)
        for r in lsh_index_topk(spark, queries, idx).collect()
    )
    rows_before = spark.read.parquet(os.path.join(idx, "buckets")).count()
    assert compact_lsh_buckets(spark, idx, max_runs_per_bucket=1)
    assert not lsh_needs_compaction(idx, max_runs_per_bucket=1)
    assert (
        spark.read.parquet(os.path.join(idx, "buckets")).count() == rows_before
    )
    got = sorted(
        (r.query_id, r.neighbor_id, r.rn)
        for r in lsh_index_topk(spark, queries, idx).collect()
    )
    assert got == want


def test_missing_index_raises_with_guidance(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="build_lsh_index"):
        lsh_index_topk(spark, _emb(spark).limit(1), str(tmp_path / "nowhere"))


def test_lsh_retune_trigger_fires_on_measured_bucket_growth(spark, tmp_path):
    """LSH's silent degradation is candidate VOLUME, not recall: the
    trigger measures mean bucket rows from the live footers and fires when
    the corpus has outgrown its planes; a rebuild with autotuned planes
    restores the invariant and clears it."""
    import numpy as np

    from datalakejson_spark.functions.lsh_index import (
        lsh_bucket_stats,
        lsh_needs_retune,
    )

    rng = np.random.RandomState(0)
    schema = "vec_id bigint, embedding array<double>"

    def vecs(n, start):
        x = rng.standard_normal((n, 8))
        return spark.createDataFrame(
            [(start + i, [float(v) for v in x[i]]) for i in range(n)], schema
        )

    idx = str(tmp_path / "lsh")
    # planes sized for a small corpus and a small target
    base = vecs(2000, 0)
    build_lsh_index(base, idx, n_planes=3, n_tables=4)  # 8 buckets/table
    needs, stats = lsh_needs_retune(idx, target_bucket_rows=250)
    assert not needs, stats  # mean ≈ 250 rows/bucket: at target

    # the corpus outgrows its planes 10x → mean bucket ≈ 2750 > 4x target
    lsh_index_append(spark, vecs(20000, 100000), idx)
    needs, stats = lsh_needs_retune(idx, target_bucket_rows=250)
    assert needs, stats
    assert stats["recommended_planes"] > stats["planes"]
    assert stats["total_rows"] == 22000 * 4  # tables x vectors, measured

    # the cure: rebuild with the autotuned planes over the full corpus
    # (read back from the index itself) → invariant restored
    import os

    corpus = (
        spark.read.parquet(os.path.join(idx, "buckets"))
        .select("vec_id", "embedding")
        .distinct()
    )
    build_lsh_index(
        corpus, idx, n_planes=stats["recommended_planes"], n_tables=4
    )
    needs, stats = lsh_needs_retune(idx, target_bucket_rows=250)
    assert not needs, stats
    st = lsh_bucket_stats(idx)
    assert st["total_rows"] == 22000 * 4
