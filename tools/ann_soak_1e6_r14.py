"""Round-14 measurement: persisted-ANN maintenance soak at 10^6 vectors
(VERDICT r13 #2 — the r13 curve stopped at 10^5, one decade short of the
dedup index's evidence).

One decade up from tools/ivf_maintenance_r13.py, with the full lifecycle
interleaved the way production runs it:

- autotuned build at 10^6 vectors (nlist 1024, nprobe 64 by the √n rule);
- >= 20 append generations (10k vectors each) with the STREAMING loop's
  inline compaction policy (trigger 8 runs/cell, fold to 4), while a
  SECOND runner (thread) compacts the same index as fast as it can — the
  tests/test_ann_concurrent.py fencing contract at soak scale;
- every generation probes 8 queries through probe_retrying and records
  wall time + files-per-cell (the flat-curve claim);
- mid-soak a LOCALIZED blob overloads one cell → ivf_overloaded_cells
  fires → split_ivf_cell repairs it O(cell) (one triggered split, racing
  the compactor);
- drift readings (ivf_needs_retrain) at the start, after the blob, and at
  the end; a closing retrain_ivf_delta repairs whatever moved;
- final audit: every vector exactly once, no stranded committed stages.

Writes tools/ann_soak_1e6_r14.jsonl. Run on a QUIET box:
python tools/ann_soak_1e6_r14.py [base_n] [gen_n] [gens]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalakejson_spark.functions.index_maintenance import (  # noqa: E402
    live_partition_files,
    probe_retrying,
)
from datalakejson_spark.functions.ivf import (  # noqa: E402
    build_ivf_index,
    compact_ivf_cells,
    ivf_index_append,
    ivf_index_topk,
    ivf_needs_compaction,
    ivf_needs_retrain,
    ivf_overloaded_cells,
    load_ivf_meta,
    retrain_ivf_delta,
    split_ivf_cell,
)
from datalakejson_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "ann_soak_1e6_r14.jsonl"
)
DIM = 32
KD = 512  # synthetic cluster count
BASE_N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
GEN_N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
GENERATIONS = int(sys.argv[3]) if len(sys.argv) > 3 else 24
TRIGGER_RUNS = 8
FOLD_TO = 4

_rng = np.random.RandomState(11)
CENTS = _rng.standard_normal((KD, DIM)) * 5.0


def synth(spark, n: int, start: int, kind: str = "clustered", seed: int = 0):
    """Distributed synthetic vectors: mapInPandas over spark.range — the
    1e6-row build never materializes a python list on the driver."""
    import pandas as pd

    cents = CENTS

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState((seed + int(ids[0])) % 2**31)
            if kind == "clustered":
                lab = ids % KD
                x = cents[lab] + rng.standard_normal((len(ids), DIM)) * 0.2
            elif kind == "blob":  # localized: tight around one center
                x = cents[7] + rng.standard_normal((len(ids), DIM)) * 0.05
            else:  # orthant: localized OOD drift
                x = rng.uniform(0.0, 16.0, (len(ids), DIM))
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [list(map(float, r)) for r in x]}
            )

    return spark.range(start, start + n).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )


def max_files_per_cell(idx: str) -> int:
    live = live_partition_files(idx, "cells")
    return max((len(f) for f in live.values()), default=0)


def main() -> None:
    spark = get_spark("ann-soak-1e6-r14", cpus=8, shuffle_partitions=32)
    idx = tempfile.mkdtemp(prefix="ann_soak_1e6_")
    stop = threading.Event()
    maint_errors: list[BaseException] = []
    compactions = [0]

    def compactor():
        while not stop.is_set():
            try:
                if ivf_needs_compaction(idx, TRIGGER_RUNS) and compact_ivf_cells(
                    spark, idx, max_runs_per_cell=FOLD_TO
                ):
                    compactions[0] += 1
            except BaseException as exc:  # noqa: BLE001 — the audit line
                maint_errors.append(exc)
                return
            time.sleep(0.05)

    with open(OUT, "w") as fh:

        def emit(rec: dict) -> None:
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(json.dumps(rec))

        emit(
            {
                "phase": "meta",
                "base_n": BASE_N,
                "gen_n": GEN_N,
                "generations": GENERATIONS,
                "dim": DIM,
                "trigger_runs": TRIGGER_RUNS,
                "fold_to": FOLD_TO,
            }
        )
        t0 = time.time()
        meta = build_ivf_index(
            synth(spark, BASE_N, 0), idx, measure_recall=True, recall_queries=16
        )
        emit(
            {
                "phase": "build",
                "n_cells": meta["n_cells"],
                "build_s": round(time.time() - t0, 2),
                "baseline_recall": meta.get("baseline_recall"),
            }
        )
        queries = synth(spark, 8, 50_000_000, seed=99).localCheckpoint(eager=True)

        runner = threading.Thread(target=compactor, daemon=True)
        runner.start()
        expected = BASE_N
        try:
            for g in range(GENERATIONS):
                t0 = time.time()
                appended = ivf_index_append(
                    spark,
                    synth(spark, GEN_N, 1_000_000 + g * GEN_N, seed=g + 1),
                    idx,
                    batch_id=f"soak{g}",
                )
                append_s = time.time() - t0
                expected += appended
                t0 = time.time()
                rows = probe_retrying(
                    lambda: ivf_index_topk(spark, queries, idx)
                )
                probe_s = time.time() - t0
                per_query: dict[int, set[int]] = {}
                for r in rows:
                    per_query.setdefault(r.query_id, set()).add(r.neighbor_id)
                assert all(len(v) == 5 for v in per_query.values()), per_query
                emit(
                    {
                        "phase": "gen",
                        "gen": g,
                        "append_s": round(append_s, 2),
                        "probe_s": round(probe_s, 2),
                        "max_files_per_cell": max_files_per_cell(idx),
                        "compactions_so_far": compactions[0],
                    }
                )
                if g == GENERATIONS // 2:
                    # mid-soak: pile a localized blob, trigger + run a split
                    blob_n = 40_000
                    ivf_index_append(
                        spark, synth(spark, blob_n, 20_000_000, kind="blob"), idx
                    )
                    expected += blob_n
                    over = ivf_overloaded_cells(idx, factor=2.0)
                    t0 = time.time()
                    new_cell = None
                    for cell in over[:1]:
                        while new_cell is None:  # a lost race reruns
                            new_cell = split_ivf_cell(spark, idx, cell)
                    split_s = time.time() - t0
                    t0 = time.time()
                    rows = probe_retrying(
                        lambda: ivf_index_topk(spark, queries, idx)
                    )
                    emit(
                        {
                            "phase": "split",
                            "gen": g,
                            "overloaded": over,
                            "new_cell": new_cell,
                            "split_s": round(split_s, 2),
                            "post_split_probe_s": round(time.time() - t0, 2),
                            "n_cells": load_ivf_meta(idx)["n_cells"],
                        }
                    )
                if g in (0, GENERATIONS // 2, GENERATIONS - 1):
                    t0 = time.time()
                    needs, recall = ivf_needs_retrain(spark, idx)
                    emit(
                        {
                            "phase": "drift",
                            "gen": g,
                            "recall": recall,
                            "needs_retrain": bool(needs),
                            "check_s": round(time.time() - t0, 2),
                        }
                    )
        finally:
            stop.set()
            runner.join(timeout=300)

        # closing delta retrain: repair whatever the soak moved
        t0 = time.time()
        res = retrain_ivf_delta(spark, idx, measure_recall=True)
        emit(
            {
                "phase": "delta_retrain",
                "outcome": res["outcome"],
                "moved_cells": len(res["moved_cells"]),
                "rows_moved": res["rows_moved"],
                "recall": res.get("recall"),
                "retrain_s": round(time.time() - t0, 2),
            }
        )

        # final audit: conservation + exactly-once through all the racing
        cells = spark.read.parquet(os.path.join(idx, "cells"))
        dup = cells.groupBy("vec_id").count().filter("count > 1").count()
        staging = os.path.join(idx, "_staging")
        stranded = [
            t
            for t in (os.listdir(staging) if os.path.isdir(staging) else [])
            if os.path.exists(os.path.join(staging, t, "_COMMITTED"))
        ]
        emit(
            {
                "phase": "audit",
                "rows": cells.count(),
                "expected": expected,
                "duplicates": dup,
                "compactions": compactions[0],
                "maint_errors": [repr(e) for e in maint_errors],
                "stranded_committed_stages": stranded,
                "max_files_per_cell": max_files_per_cell(idx),
            }
        )
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
