"""Round-13 measurement: persisted-IVF maintenance.

Phase A — append-cadence latency: a 10^5-vector index takes 24 append
generations (2,000 vectors each, same distribution) in two worlds:
compaction OFF (files per cell grow one per generation — the round-12
verdict's named disease) and ON (the streaming loop policy: trigger at
8 runs/cell, tiered fold to 4). After every generation both worlds run the
same 8-query probe and record wall time + file counts. The claim under
test: with compaction ON, probe latency and files-per-cell stay flat
across >= 20 generations while OFF degrades.

Phase B — recall-drift retrain trigger: the measured story behind
ivf_needs_retrain. A 64-cell index built on clustered data records its
baseline recall; a same-size in-distribution append holds recall at
baseline (no trigger); a same-size out-of-distribution append (uniform
noise) drops MEASURED recall and fires the trigger; a retrain
(build_ivf_index over the current corpus) re-records the baseline and
clears it.

Writes tools/ivf_maintenance_r13.jsonl (one JSON object per line).
Run on a QUIET box: python tools/ivf_maintenance_r13.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalakejson_spark.functions.ivf import (  # noqa: E402
    _ivf_live_files,
    build_ivf_index,
    compact_ivf_cells,
    ivf_index_append,
    ivf_index_topk,
    ivf_needs_compaction,
    ivf_needs_retrain,
)
from datalakejson_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ivf_maintenance_r13.jsonl")
DIM = 32
# overridable: python tools/ivf_maintenance_r13.py [base_n] [gen_n] [gens]
BASE_N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
GEN_N = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
GENERATIONS = int(sys.argv[3]) if len(sys.argv) > 3 else 24
TRIGGER_RUNS = 8
FOLD_TO = 4


def emit(fh, rec: dict) -> None:
    fh.write(json.dumps(rec) + "\n")
    fh.flush()
    print(rec)


def vecs(spark, rng, n, start):
    x = rng.standard_normal((n, DIM))
    return spark.createDataFrame(
        [(start + i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    )


def probe_seconds(spark, idx, queries) -> float:
    t0 = time.time()
    ivf_index_topk(spark, queries, idx).count()
    return time.time() - t0


def file_stats(idx) -> tuple[int, int]:
    live = _ivf_live_files(idx)
    counts = [len(f) for f in live.values()] or [0]
    return sum(counts), max(counts)


def phase_a(spark, fh) -> None:
    rng = np.random.RandomState(7)
    base = vecs(spark, rng, BASE_N, 0)
    worlds = {}
    for mode in ("off", "on"):
        idx = tempfile.mkdtemp(prefix=f"ivf_lat_{mode}_")
        t0 = time.time()
        meta = build_ivf_index(base, idx, n_cells=None)  # autotune: 256 cells
        worlds[mode] = idx
        emit(fh, {"phase": "latency", "mode": mode, "event": "build",
                  "base_n": BASE_N, "gen_n": GEN_N,
                  "n_cells": meta["n_cells"], "secs": round(time.time() - t0, 2)})
    queries = vecs(spark, np.random.RandomState(99), 8, 10_000_000)

    for g in range(1, GENERATIONS + 1):
        delta_rows = vecs(spark, np.random.RandomState(100 + g), GEN_N,
                          1_000_000 + g * GEN_N)
        for mode, idx in worlds.items():
            ivf_index_append(spark, delta_rows, idx, batch_id=f"g{g}")
            compact_s = 0.0
            if mode == "on" and ivf_needs_compaction(idx, TRIGGER_RUNS):
                t0 = time.time()
                compact_ivf_cells(spark, idx, max_runs_per_cell=FOLD_TO)
                compact_s = time.time() - t0
            total, per_cell_max = file_stats(idx)
            emit(fh, {
                "phase": "latency", "mode": mode, "gen": g, "base_n": BASE_N,
                "probe_s": round(probe_seconds(spark, idx, queries), 3),
                "files_total": total, "files_per_cell_max": per_cell_max,
                "compact_s": round(compact_s, 2),
            })
    for idx in worlds.values():
        shutil.rmtree(idx, ignore_errors=True)


def phase_b(spark, fh) -> None:
    rng = np.random.RandomState(0)
    KD = NC = 64
    cents = rng.standard_normal((KD, DIM)) * 5.0

    def clustered(n, start):
        lab = rng.randint(0, KD, n)
        x = cents[lab] + rng.standard_normal((n, DIM)) * 0.2
        return spark.createDataFrame(
            [(start + i, [float(v) for v in x[i]]) for i in range(n)],
            "vec_id bigint, embedding array<double>",
        )

    def uniform(n, start):
        x = rng.uniform(-10, 10, (n, DIM))
        return spark.createDataFrame(
            [(start + i, [float(v) for v in x[i]]) for i in range(n)],
            "vec_id bigint, embedding array<double>",
        )

    idx = tempfile.mkdtemp(prefix="ivf_drift_")
    base = clustered(20_000, 0)
    meta = build_ivf_index(base, idx, n_cells=NC, measure_recall=True)
    emit(fh, {"phase": "drift", "event": "build",
              "baseline_recall": meta["baseline_recall"]})

    indist = clustered(20_000, 500_000)
    ivf_index_append(spark, indist, idx)
    needs, cur = ivf_needs_retrain(spark, idx, drift_tolerance=0.05)
    emit(fh, {"phase": "drift", "event": "in_distribution_append",
              "recall": cur, "needs_retrain": bool(needs)})

    drift = uniform(20_000, 900_000)
    ivf_index_append(spark, drift, idx)
    needs, cur = ivf_needs_retrain(spark, idx, drift_tolerance=0.05)
    emit(fh, {"phase": "drift", "event": "out_of_distribution_append",
              "recall": cur, "needs_retrain": bool(needs)})

    everything = base.unionByName(indist).unionByName(drift)
    meta = build_ivf_index(everything, idx, n_cells=NC, measure_recall=True)
    needs, cur = ivf_needs_retrain(spark, idx, drift_tolerance=0.05)
    emit(fh, {"phase": "drift", "event": "retrain",
              "baseline_recall": meta["baseline_recall"],
              "recall": cur, "needs_retrain": bool(needs)})
    shutil.rmtree(idx, ignore_errors=True)


def main() -> None:
    spark = get_spark("ivf-maintenance-r13", cpus=8, shuffle_partitions=16)
    run_b = len(sys.argv) <= 1  # phase B once (the default invocation)
    # default run REGENERATES the artifact (append would double-count on a
    # rerun — review catch, round 13); explicit-scale runs append their
    # base_n-tagged records to the accumulated multi-decade curve
    with open(OUT, "w" if run_b else "a") as fh:
        phase_a(spark, fh)
        if run_b:
            phase_b(spark, fh)
    spark.stop()
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
