"""Concurrent ANN-index maintenance (round 13): one runner appends and
probes WHILE another compacts the same persisted IVF index as fast as it
can. The fencing contract mirrors the dedup index's:

- appends stay EXACTLY-ONCE across races (staged publish, applied markers);
- probes racing a compaction publish are never silently wrong — a vector
  visible twice (compacted copy in, original not yet deleted) dedups inside
  the probe, and a vanished planned file surfaces as a missing-file error
  that probe_retrying re-plans from a fresh listing;
- two racing maintenance publishes fence via the _SUBSUMED snapshot check.
"""

from __future__ import annotations

import os
import threading
import time

import numpy as np
import pyspark.sql.functions as F

from datalakejson_spark.functions.ivf import (
    build_ivf_index,
    compact_ivf_cells,
    ivf_index_append,
    ivf_index_topk,
    probe_retrying,
)
import pytest

# Multi-minute soak/race/kill/lifecycle suite: excluded from the default
# pytest run (pyproject addopts -m 'not soak') so the driver's verify
# window holds; run per round with `python -m pytest tests/ -m soak`.
pytestmark = pytest.mark.soak


def _vecs(spark, seed: int, n: int, start: int, dim: int = 16):
    rng = np.random.RandomState(seed)
    x = rng.standard_normal((n, dim))
    return spark.createDataFrame(
        [(start + i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    )


def test_concurrent_ann_maintenance_soak(spark, tmp_path):
    """Appender+prober vs compactor, racing on one index. Every append
    lands exactly once, every probe during the race returns exactly k
    DISTINCT neighbors (the duplicate-window and vanished-file cases both
    resolve), and the final index holds each vector once."""
    idx = str(tmp_path / "ivf")
    base = _vecs(spark, 1, 2000, 0)
    build_ivf_index(base, idx, n_cells=16)
    queries = _vecs(spark, 99, 4, 10_000_000)

    stop = threading.Event()
    maint_errors: list[BaseException] = []
    compactions = 0

    def maintenance():
        nonlocal compactions
        while not stop.is_set():
            try:
                if compact_ivf_cells(spark, idx, max_runs_per_cell=1):
                    compactions += 1
            except BaseException as exc:  # noqa: BLE001 — the assertion
                maint_errors.append(exc)
                return
            time.sleep(0.02)

    t = threading.Thread(target=maintenance, daemon=True)
    t.start()
    n_batches, per = 8, 25
    try:
        for b in range(n_batches):
            appended = ivf_index_append(
                spark,
                _vecs(spark, 100 + b, per, 100_000 + b * per),
                idx,
                batch_id=f"soak{b}",
            )
            assert appended == per
            rows = probe_retrying(
                lambda: ivf_index_topk(spark, queries, idx, nprobe=4)
            )
            per_query: dict[int, list[int]] = {}
            for r in rows:
                per_query.setdefault(r.query_id, []).append(r.neighbor_id)
            for qid, neighbors in per_query.items():
                assert len(neighbors) == 5, (qid, neighbors)
                assert len(set(neighbors)) == 5, (qid, neighbors)  # no dups
    finally:
        stop.set()
        t.join(timeout=180)
    assert not maint_errors, maint_errors
    assert compactions > 0  # the race was real

    # exactly-once through all the racing: each vec_id appears once
    cells = spark.read.parquet(os.path.join(idx, "cells"))
    dup = (
        cells.groupBy("vec_id").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0
    assert cells.count() == 2000 + n_batches * per
    # no stranded committed stages
    staging = os.path.join(idx, "_staging")
    if os.path.isdir(staging):
        for token in os.listdir(staging):
            assert not os.path.exists(
                os.path.join(staging, token, "_COMMITTED")
            ), token


def test_racing_compactions_fence_by_snapshot(spark, tmp_path):
    """Two compactions planned against the same layout: the second to
    publish finds its _SUBSUMED snapshot already partly deleted by the
    winner and discards itself — the index never holds the same rows from
    two competing rewrites."""
    import json
    import shutil

    from datalakejson_spark.functions.ivf import (
        _ivf_live_files,
        _publish_ivf_staged,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(_vecs(spark, 1, 500, 0), idx, n_cells=16)
    for g in range(2):
        ivf_index_append(spark, _vecs(spark, 10 + g, 20, 1000 * (g + 1)), idx)

    # fabricate the LOSER: a committed stage whose snapshot is the current
    # layout; then let a real compaction win and delete those files
    loser = os.path.join(idx, "_staging", "t-loser")
    live = _ivf_live_files(idx)
    snapshot = sorted(
        f"{cell}/{name}" for cell, files in live.items() for name in files
    )
    src_cell = next(iter(live))
    os.makedirs(os.path.join(loser, "cells", src_cell))
    shutil.copy(
        os.path.join(idx, "cells", src_cell, live[src_cell][0]),
        os.path.join(loser, "cells", src_cell, "part-99999-loser-c000.snappy.parquet"),
    )
    with open(os.path.join(loser, "_SUBSUMED.json"), "w") as fh:
        json.dump(snapshot, fh)

    won = compact_ivf_cells(spark, idx, max_runs_per_cell=1)  # the winner
    assert won
    rows_after_win = spark.read.parquet(os.path.join(idx, "cells")).count()

    open(os.path.join(loser, "_COMMITTED"), "w").write("ok")
    out = _publish_ivf_staged(idx)
    assert out.get("t-loser") == "lost"
    assert not os.path.isdir(loser)
    # the loser's rows never landed
    assert (
        spark.read.parquet(os.path.join(idx, "cells")).count()
        == rows_after_win
    )
