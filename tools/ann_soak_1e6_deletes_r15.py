"""Round-15 measurement: the 10^6-vector persisted-ANN soak with the
DELETE LIFECYCLE interleaved (VERDICT r14 #4 — the r14 soak exercised
append/compact/split/retrain with a racing compactor; deletes, vacuums and
upserts landed the same round but were never raced at soak scale).

Same skeleton as tools/ann_soak_1e6_r14.py, plus per-generation:

- every 3rd generation DELETES a slice of previously-appended ids
  (logical tombstones — probes must exclude them immediately);
- the vacuum runs ONLY when ivf_needs_vacuum's measured trigger fires
  (1% relative / 65,536 absolute) — at this corpus the cumulative
  tombstones cross the relative trigger mid-soak, so at least one vacuum
  fires BEHIND its trigger at scale, racing the compactor thread;
- two UPSERTs mid-soak (delete→vacuum→append composition) replacing live
  ids with shifted embeddings;
- probes assert deleted ids never appear and latency stays in the r14
  band (inline folds bound files/cell exactly as before);
- final audit: live rows == appended − deleted (exactly-once through all
  the racing), physical rows == live + still-tombstoned, 0 duplicates,
  0 stranded committed stages, tombstone set bounded by the trigger.

Writes tools/ann_soak_1e6_deletes_r15.jsonl. Run on a QUIET box:
python tools/ann_soak_1e6_deletes_r15.py [base_n] [gen_n] [gens]
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
    load_tombstones,
    probe_retrying,
)
from datalakejson_spark.functions.ivf import (  # noqa: E402
    build_ivf_index,
    compact_ivf_cells,
    ivf_index_append,
    ivf_index_delete,
    ivf_index_topk,
    ivf_index_upsert,
    ivf_needs_compaction,
    ivf_needs_retrain,
    ivf_needs_vacuum,
    ivf_overloaded_cells,
    load_ivf_meta,
    retrain_ivf_delta,
    split_ivf_cell,
    vacuum_ivf_deletes,
)
from datalakejson_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "ann_soak_1e6_deletes_r15.jsonl"
)
DIM = 32
KD = 512
BASE_N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
GEN_N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
GENERATIONS = int(sys.argv[3]) if len(sys.argv) > 3 else 24
DEL_N = 5_000  # per delete event (every 3rd gen)
TRIGGER_RUNS = 8
FOLD_TO = 4

_rng = np.random.RandomState(11)
CENTS = _rng.standard_normal((KD, DIM)) * 5.0


def synth(spark, n: int, start: int, kind: str = "clustered", seed: int = 0):
    """Distributed synthetic vectors (mapInPandas over spark.range — the
    1e6-row build never materializes a python list on the driver)."""
    import pandas as pd

    cents = CENTS

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState((seed + int(ids[0])) % 2**31)
            if kind == "clustered":
                lab = ids % KD
                x = cents[lab] + rng.standard_normal((len(ids), DIM)) * 0.2
            elif kind == "blob":
                x = cents[7] + rng.standard_normal((len(ids), DIM)) * 0.05
            else:
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
    spark = get_spark("ann-soak-deletes-r15", cpus=8, shuffle_partitions=32)
    idx = tempfile.mkdtemp(prefix="ann_soak_del_")
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
                "del_n": DEL_N,
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
        appended_total = BASE_N
        deleted: set[int] = set()
        vacuumed_total = 0
        vacuums = 0
        upserted: set[int] = set()
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
                appended_total += appended

                if g % 3 == 2:
                    # delete a base-corpus slice never deleted before (the
                    # base ids are 0..BASE_N-1; upserts use fresh ranges)
                    lo = (g // 3) * DEL_N
                    batch = set(range(lo, lo + DEL_N)) - deleted - upserted
                    t0 = time.time()
                    ivf_index_delete(idx, batch)
                    deleted |= batch
                    emit(
                        {
                            "phase": "delete",
                            "gen": g,
                            "ids": len(batch),
                            "tombstoned_total": len(load_tombstones(idx)[0]),
                            "delete_s": round(time.time() - t0, 3),
                        }
                    )

                # vacuum ONLY behind the measured trigger — the point of
                # the soak: at 1e6+ rows the 1% relative trigger needs
                # >10k cumulative tombstones, so it fires mid-soak
                fired, stats = ivf_needs_vacuum(idx)
                if fired:
                    t0 = time.time()
                    rep = vacuum_ivf_deletes(spark, idx)
                    vacuumed_total += rep["vectors_removed"]
                    vacuums += 1
                    emit(
                        {
                            "phase": "vacuum",
                            "gen": g,
                            "trigger_stats": stats,
                            **{
                                k: rep[k]
                                for k in (
                                    "rows_removed",
                                    "vectors_removed",
                                    "partitions_rewritten",
                                    "tombstone_files_cleared",
                                )
                            },
                            "vacuum_s": round(time.time() - t0, 2),
                        }
                    )

                t0 = time.time()
                rows = probe_retrying(
                    lambda: ivf_index_topk(spark, queries, idx)
                )
                probe_s = time.time() - t0
                per_query: dict[int, set[int]] = {}
                for r in rows:
                    assert r.neighbor_id not in deleted, (
                        f"deleted id {r.neighbor_id} surfaced in a probe"
                    )
                    per_query.setdefault(r.query_id, set()).add(r.neighbor_id)
                assert all(len(v) == 5 for v in per_query.values()), per_query
                emit(
                    {
                        "phase": "gen",
                        "gen": g,
                        "append_s": round(append_s, 2),
                        "probe_s": round(probe_s, 2),
                        "max_files_per_cell": max_files_per_cell(idx),
                        "tombstoned": len(load_tombstones(idx)[0]),
                        "compactions_so_far": compactions[0],
                    }
                )

                if g in (GENERATIONS // 3, 2 * GENERATIONS // 3):
                    # upsert: replace 1,000 live appended ids with shifted
                    # embeddings (delete→vacuum→append composition)
                    lo = 1_000_000 + g * GEN_N
                    t0 = time.time()
                    n_up = ivf_index_upsert(
                        spark,
                        synth(spark, 1_000, lo, seed=g + 7_000),
                        idx,
                    )
                    upserted |= set(range(lo, lo + 1_000))
                    emit(
                        {
                            "phase": "upsert",
                            "gen": g,
                            "rows": n_up,
                            "upsert_s": round(time.time() - t0, 2),
                        }
                    )

                if g == GENERATIONS // 2:
                    blob_n = 40_000
                    ivf_index_append(
                        spark, synth(spark, blob_n, 20_000_000, kind="blob"), idx
                    )
                    appended_total += blob_n
                    over = ivf_overloaded_cells(idx, factor=2.0)
                    t0 = time.time()
                    new_cell = None
                    for cell in over[:1]:
                        while new_cell is None:  # a lost race reruns
                            new_cell = split_ivf_cell(spark, idx, cell)
                    emit(
                        {
                            "phase": "split",
                            "gen": g,
                            "overloaded": over,
                            "new_cell": new_cell,
                            "split_s": round(time.time() - t0, 2),
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

        # closing delta retrain: trains on and rewrites only LIVE rows
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

        # final audit: conservation through append/delete/vacuum/upsert
        # racing the compactor. live == appended − deleted exactly;
        # physical == live + still-tombstoned (folds may have dropped
        # tombstoned rows early, so physical ≤ live + tombstoned).
        cells = spark.read.parquet(os.path.join(idx, "cells"))
        import pyspark.sql.functions as F

        still_ids, _names = load_tombstones(idx)
        live_df = cells
        if still_ids:
            live_df = cells.filter(
                ~F.col("vec_id").isin([int(i) for i in still_ids])
            )
        live_rows = live_df.count()
        physical = cells.count()
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
                "live_rows": live_rows,
                "expected_live": appended_total - len(deleted),
                "physical_rows": physical,
                "still_tombstoned": len(still_ids),
                "appended_total": appended_total,
                "deleted_total": len(deleted),
                "vacuumed_total": vacuumed_total,
                "vacuums": vacuums,
                "duplicates": dup,
                "compactions": compactions[0],
                "maint_errors": [repr(e) for e in maint_errors],
                "stranded_committed_stages": stranded,
                "max_files_per_cell": max_files_per_cell(idx),
            }
        )
        assert dup == 0 and live_rows == appended_total - len(deleted)
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
