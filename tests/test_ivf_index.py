"""Persisted IVF index (functions/ivf.py round-12 additions): build/probe
parity with the in-memory path, partition pruning at probe time, appends
against a fixed quantizer, meta guardrails."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from datalakejson_spark.functions.ivf import (
    N_CELLS,
    N_PROBE,
    build_ivf_index,
    ivf_index_append,
    ivf_index_topk,
    ivf_topk,
    load_ivf_meta,
)

SF = "/root/testdata/sf0.01"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_persisted_probe_matches_in_memory(spark, tmp_path):
    """Same quantizer seed + knobs → the persisted, partition-pruned probe
    returns row-for-row the in-memory ivf_topk result."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 8)
    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(emb, idx, n_cells=N_CELLS)
    assert meta["n_vectors"] == emb.count()

    got = sorted(
        (r.query_id, r.neighbor_id, r.rn)
        for r in ivf_index_topk(spark, queries, idx, nprobe=N_PROBE).collect()
    )
    ref = sorted(
        (r.query_id, r.neighbor_id, r.rn)
        for r in ivf_topk(emb, queries, n_cells=N_CELLS, nprobe=N_PROBE).collect()
    )
    assert got == ref and got


def test_probe_prunes_cell_partitions(spark, tmp_path):
    """The probe's cell list reaches the scan as a PARTITION filter: one
    query at nprobe=2 over a 16-cell index must read only its 2 cell
    directories — both in the plan (PartitionFilters) and in the executed
    scan metrics (rows read ≪ corpus)."""
    from datalakejson_spark.plans.metrics import executed_summary

    emb = _emb(spark)
    n = emb.count()
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=N_CELLS)
    # one file per cell (the repartition("cell") contract)
    cell_dirs = [
        d for d in os.listdir(os.path.join(idx, "cells")) if d.startswith("cell=")
    ]
    assert len(cell_dirs) <= N_CELLS
    for d in cell_dirs:
        files = [
            f
            for f in os.listdir(os.path.join(idx, "cells", d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)

    one_query = emb.filter(F.col("vec_id") == 3)
    ann = ivf_index_topk(spark, one_query, idx, nprobe=2)
    rows = ann.collect()  # execute FIRST: AQE finalizes scans lazily
    assert rows  # the query's own cell is probed → ≥ some neighbors
    import re

    plan = ann._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    assert re.search(r"PartitionFilters: \[cell#\d+ IN \(", plan), plan
    s = executed_summary(ann)
    # 2 of 16 cells: the scan reads a small fraction of the corpus, never
    # all of it (cells are uneven, so bound loosely at half)
    assert 0 < s["scan_rows"] - 0 < n / 2, (s["scan_rows"], n)


def test_append_assigns_against_existing_quantizer(spark, tmp_path):
    """An appended near-copy of an existing vector lands in a probed cell
    and shows up as its twin's top neighbor; the meta count advances."""
    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=N_CELLS)

    base = emb.filter(F.col("vec_id") == 7).first()
    twin = [float(v) + 1e-4 for v in base.embedding]
    new = spark.createDataFrame([(100000, twin)], "vec_id bigint, embedding array<double>")
    assert ivf_index_append(spark, new, idx) == 1
    assert load_ivf_meta(idx)["n_vectors"] == emb.count() + 1

    queries = emb.filter(F.col("vec_id") == 7)
    top = (
        ivf_index_topk(spark, queries, idx, nprobe=N_PROBE)
        .filter(F.col("rn") == 1)
        .first()
    )
    assert top.neighbor_id == 100000
    assert top.cosine >= 0.999999


def test_missing_index_raises_with_guidance(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="build_ivf_index"):
        ivf_index_topk(
            spark, _emb(spark).limit(1), str(tmp_path / "nowhere")
        )
