"""Round-15 measurement: the persisted-LSH plane's first soak decade
(10^6 vectors). The IVF plane has two soak artifacts (r14 appends, r15
deletes); LSH shares the staged-publish machinery but has materially
different write amplification — every vector lands in n_tables bucket
partitions (autotune at 10^6: planes 9, tables 8 → 4096 tb partitions, so
each append fans into thousands of small files and the tiered fold is
load-bearing, not hygiene) — and none of that was ever raced at scale.

Shape mirrors tools/ann_soak_1e6_deletes_r15.py on this plane's verbs:

- autotuned build at 10^6;
- 16 append generations (10k each) with a RACING compactor thread
  (lsh_needs_compaction/compact_lsh_buckets);
- every 3rd generation deletes 5k previously-appended ids; the vacuum
  runs ONLY behind the measured trigger (1% relative / 65,536 absolute);
- one mid-soak upsert (lsh_index_upsert — the retry-under-racing-publisher
  verb) and retune readings (lsh_needs_retune, footer-only);
- per-generation probes through probe_retrying asserting no deleted id
  surfaces and recording wall time + max files/bucket;
- audit: every LIVE vector appears in EXACTLY n_tables partitions (the
  plane's exactly-once shape), distinct live == appended − deleted, 0
  duplicates within any table, 0 stranded committed stages.

Writes tools/lsh_soak_1e6_r15.jsonl. Run on a QUIET box:
python tools/lsh_soak_1e6_r15.py [base_n] [gen_n] [gens]
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
    needs_vacuum,
    probe_retrying,
)
from datalakejson_spark.functions.lsh_index import (  # noqa: E402
    build_lsh_index,
    compact_lsh_buckets,
    lsh_index_append,
    lsh_index_delete,
    lsh_index_topk,
    lsh_index_upsert,
    lsh_needs_compaction,
    lsh_needs_retune,
    load_lsh_meta,
    vacuum_lsh_deletes,
)
from datalakejson_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "lsh_soak_1e6_r15.jsonl"
)
DIM = 32
KD = 512
BASE_N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
GEN_N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
GENERATIONS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
DEL_N = 5_000
TRIGGER_RUNS = 8
FOLD_TO = 4

_rng = np.random.RandomState(17)
CENTS = _rng.standard_normal((KD, DIM)) * 5.0


def synth(spark, n: int, start: int, seed: int = 0):
    import pandas as pd

    cents = CENTS

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState((seed + int(ids[0])) % 2**31)
            lab = ids % KD
            x = cents[lab] + rng.standard_normal((len(ids), DIM)) * 0.2
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [list(map(float, r)) for r in x]}
            )

    return spark.range(start, start + n).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )


def max_files_per_bucket(idx: str) -> int:
    live = live_partition_files(idx, "buckets")
    return max((len(f) for f in live.values()), default=0)


def main() -> None:
    spark = get_spark("lsh-soak-1e6-r15", cpus=8, shuffle_partitions=32)
    idx = tempfile.mkdtemp(prefix="lsh_soak_1e6_")
    stop = threading.Event()
    maint_errors: list[BaseException] = []
    compactions = [0]

    def compactor():
        while not stop.is_set():
            try:
                if lsh_needs_compaction(
                    idx, TRIGGER_RUNS
                ) and compact_lsh_buckets(
                    spark, idx, max_runs_per_bucket=FOLD_TO
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
        meta = build_lsh_index(synth(spark, BASE_N, 0), idx)
        n_tables = meta["n_tables"]
        emit(
            {
                "phase": "build",
                "n_planes": meta["n_planes"],
                "n_tables": n_tables,
                "tb_partitions": len(live_partition_files(idx, "buckets")),
                "build_s": round(time.time() - t0, 2),
            }
        )
        queries = synth(spark, 8, 50_000_000, seed=99).localCheckpoint(
            eager=True
        )

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
                appended = lsh_index_append(
                    spark,
                    synth(spark, GEN_N, 1_000_000 + g * GEN_N, seed=g + 1),
                    idx,
                    batch_id=f"soak{g}",
                )
                append_s = time.time() - t0
                appended_total += appended

                if g % 3 == 2:
                    lo = (g // 3) * DEL_N
                    batch = set(range(lo, lo + DEL_N)) - deleted - upserted
                    t0 = time.time()
                    lsh_index_delete(idx, batch)
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

                fired, stats = needs_vacuum(idx)
                if fired:
                    t0 = time.time()
                    rep = vacuum_lsh_deletes(spark, idx)
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
                    lambda: lsh_index_topk(spark, queries, idx)
                )
                probe_s = time.time() - t0
                for r in rows:
                    assert r.neighbor_id not in deleted, (
                        f"deleted id {r.neighbor_id} surfaced in a probe"
                    )
                emit(
                    {
                        "phase": "gen",
                        "gen": g,
                        "append_s": round(append_s, 2),
                        "probe_s": round(probe_s, 2),
                        "max_files_per_bucket": max_files_per_bucket(idx),
                        "tombstoned": len(load_tombstones(idx)[0]),
                        "compactions_so_far": compactions[0],
                    }
                )

                if g == GENERATIONS // 2:
                    lo = 1_000_000 + g * GEN_N
                    t0 = time.time()
                    n_up = lsh_index_upsert(
                        spark, synth(spark, 1_000, lo, seed=g + 7_000), idx
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
                if g in (0, GENERATIONS // 2, GENERATIONS - 1):
                    t0 = time.time()
                    needs, stats = lsh_needs_retune(idx)
                    emit(
                        {
                            "phase": "retune_reading",
                            "gen": g,
                            "mean_rows": stats["mean_rows"],
                            "recommended_planes": stats["recommended_planes"],
                            "needs_retune": bool(needs),
                            "check_s": round(time.time() - t0, 3),
                        }
                    )
        finally:
            stop.set()
            runner.join(timeout=300)

        # audit: the plane's exactly-once shape is PER TABLE — every live
        # vector in exactly n_tables partitions, none twice in any
        import pyspark.sql.functions as F

        buckets = spark.read.parquet(os.path.join(idx, "buckets"))
        still_ids, _names = load_tombstones(idx)
        live_df = buckets
        if still_ids:
            live_df = buckets.filter(
                ~F.col("vec_id").isin([int(i) for i in still_ids])
            )
        per_vec = live_df.groupBy("vec_id").count()
        wrong_copies = per_vec.filter(F.col("count") != n_tables).count()
        distinct_live = per_vec.count()
        dup_in_table = (
            live_df.groupBy("vec_id", "tb").count().filter("count > 1").count()
        )
        staging = os.path.join(idx, "_staging")
        stranded = [
            t
            for t in (os.listdir(staging) if os.path.isdir(staging) else [])
            if os.path.exists(os.path.join(staging, t, "_COMMITTED"))
        ]
        emit(
            {
                "phase": "audit",
                "distinct_live": distinct_live,
                "expected_live": appended_total - len(deleted),
                "wrong_copy_count_vectors": wrong_copies,
                "dup_within_table": dup_in_table,
                "still_tombstoned": len(still_ids),
                "appended_total": appended_total,
                "deleted_total": len(deleted),
                "vacuumed_total": vacuumed_total,
                "vacuums": vacuums,
                "compactions": compactions[0],
                "maint_errors": [repr(e) for e in maint_errors],
                "stranded_committed_stages": stranded,
                "max_files_per_bucket": max_files_per_bucket(idx),
            }
        )
        assert (
            dup_in_table == 0
            and wrong_copies == 0
            and distinct_live == appended_total - len(deleted)
        )
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
