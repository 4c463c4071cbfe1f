"""Round-15 measurement: CROSS-PROCESS racing publishers on one shared
persisted IVF index — three independent Spark JVMs, no shared memory.

Every prior concurrency artifact (the 1e6 soaks, the dual-stream soak,
the two-runner fold tests) races THREADS inside one driver JVM. The
maintenance plane's coordination is deliberately process-agnostic —
atomic os.mkdir slot claims, token fencing, staged publishes behind
atomic renames, the serialized flip mutex — so a multi-JOB deployment
(a streaming appender, an ops cron running ticks/vacuums, ad-hoc probe
jobs) is a first-class shape. This tool is the first artifact that
actually runs that shape: three separate `python` processes, each with
its OWN SparkSession, sharing nothing but the index directory:

- **appender** (local[3]): N append generations of clustered vectors,
  running `ivf_maintenance_tick` every 3rd generation (roll-forward,
  measured-trigger vacuum, tiered fold, capped splits);
- **deleter** (local[3]): M delete events over reserved base-corpus
  slices, vacuuming ONLY behind `ivf_needs_vacuum`'s measured trigger,
  plus one mid-run `ivf_index_upsert` of a never-deleted base slice
  (net-zero on conservation; exercises the upsert's vacuum-retry against
  the OTHER process's racing publishes). After each delete verb returns
  it atomically publishes the cumulative confirmed set to
  `confirmed_deletes.json`;
- **prober** (local[3]): probes in a loop until the writers exit; before
  each probe it reads the confirmed set — any id confirmed BEFORE the
  probe started must never surface (write happened-before read, read
  happened-before probe), no matter which process's publish lands
  mid-probe (`probe_retrying` re-plans on pinned-file races).

The parent builds the 300k base corpus, spawns the three roles, merges
their jsonl logs, and audits with a fresh session: live rows ==
base + appended − deleted exactly, 0 duplicates, 0 stranded committed
stages, every child exit code 0.

Writes tools/multiproc_ann_race_r15.jsonl. Run on a QUIET box:
python tools/multiproc_ann_race_r15.py [base_n] [gens] [gen_n] [events] [del_n]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 32
KD = 512
OUT = os.environ.get(
    "MULTIPROC_RACE_OUT",
    os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "multiproc_ann_race_r15.jsonl",
    ),
)

_rng = np.random.RandomState(11)
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


def _session(role: str):
    from datalakejson_spark.session import get_spark

    return get_spark(f"multiproc-race-{role}", cpus=3, shuffle_partitions=8)


def _log_line(path: str, rec: dict) -> None:
    with open(path, "a") as fh:
        fh.write(json.dumps(rec) + "\n")


def _publish_confirmed(path: str, ids) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"ids": sorted(int(i) for i in ids)}, fh)
    os.replace(tmp, path)


def run_appender(idx: str, log: str, gens: int, gen_n: int) -> None:
    from datalakejson_spark.functions.ivf import (
        ivf_index_append,
        ivf_maintenance_tick,
    )

    spark = _session("appender")
    for g in range(gens):
        t0 = time.time()
        ivf_index_append(
            spark,
            synth(spark, gen_n, 1_000_000 + g * gen_n, seed=g + 1),
            idx,
            batch_id=f"proc-a{g}",
        )
        rec = {"role": "appender", "gen": g, "append_s": round(time.time() - t0, 2)}
        if g % 3 == 2:
            t0 = time.time()
            rep = ivf_maintenance_tick(spark, idx)
            rec["tick_actions"] = [a.get("verb") for a in rep.get("actions", [])]
            rec["tick_s"] = round(time.time() - t0, 2)
        _log_line(log, rec)
    spark.stop()


def run_deleter(
    idx: str, log: str, events: int, del_n: int, confirmed_path: str
) -> None:
    from datalakejson_spark.functions.ivf import (
        ivf_index_delete,
        ivf_index_upsert,
        ivf_needs_vacuum,
        vacuum_ivf_deletes,
    )

    spark = _session("deleter")
    confirmed: set[int] = set()
    for e in range(events):
        lo = e * del_n  # reserved base slices; the upsert range sits above
        batch = set(range(lo, lo + del_n))
        t0 = time.time()
        ivf_index_delete(idx, batch)
        confirmed |= batch
        _publish_confirmed(confirmed_path, confirmed)
        rec = {
            "role": "deleter",
            "event": e,
            "ids": len(batch),
            "delete_s": round(time.time() - t0, 3),
        }
        fired, stats = ivf_needs_vacuum(idx)
        if fired:
            t0 = time.time()
            rep = vacuum_ivf_deletes(spark, idx)
            rec["vacuum"] = {
                "vectors_removed": rep["vectors_removed"],
                "partitions_rewritten": rep["partitions_rewritten"],
                "vacuum_s": round(time.time() - t0, 2),
                "trigger_fraction": stats["fraction"],
            }
        if e == events // 2:
            # upsert a base slice ABOVE every delete range (but inside
            # the base corpus — replace-in-place, net-zero on
            # conservation); its internal vacuum retries must win
            # against the appender's racing ticks/publishes
            up_lo = events * del_n + 1_000
            t0 = time.time()
            n_up = ivf_index_upsert(
                spark, synth(spark, 500, up_lo, seed=9_999), idx
            )
            rec["upsert"] = {"rows": n_up, "upsert_s": round(time.time() - t0, 2)}
        _log_line(log, rec)
        time.sleep(0.5)  # let the appender interleave between events
    spark.stop()


def run_prober(idx: str, log: str, confirmed_path: str, stop_path: str) -> None:
    from datalakejson_spark.functions.index_maintenance import probe_retrying
    from datalakejson_spark.functions.ivf import ivf_index_topk

    spark = _session("prober")
    queries = synth(spark, 8, 50_000_000, seed=99).localCheckpoint(eager=True)
    probes = 0
    while not os.path.exists(stop_path):
        try:
            with open(confirmed_path) as fh:
                frozen = set(json.load(fh)["ids"])
        except (OSError, ValueError):
            frozen = set()
        t0 = time.time()
        rows = probe_retrying(lambda: ivf_index_topk(spark, queries, idx))
        per_query: dict[int, set[int]] = {}
        for r in rows:
            assert r.neighbor_id not in frozen, (
                f"id {r.neighbor_id} confirmed-deleted before this probe "
                "started, yet surfaced"
            )
            per_query.setdefault(r.query_id, set()).add(r.neighbor_id)
        assert all(len(v) == 5 for v in per_query.values()), per_query
        probes += 1
        _log_line(
            log,
            {
                "role": "prober",
                "probe": probes,
                "frozen_ids": len(frozen),
                "probe_s": round(time.time() - t0, 2),
            },
        )
    spark.stop()


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    gens = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    gen_n = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000
    events = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    del_n = int(sys.argv[5]) if len(sys.argv) > 5 else 3_000
    # the deleter's upsert slice must be REAL base ids (replace-in-place
    # keeps the conservation audit exact); a range past the base corpus
    # would silently turn the upsert into an insert
    assert base_n > events * del_n + 1_000 + 500, (
        "base_n too small for the reserved delete + upsert ranges"
    )

    from datalakejson_spark.functions.index_maintenance import (
        index_report,
        load_tombstones,
    )
    from datalakejson_spark.functions.ivf import build_ivf_index

    root = tempfile.mkdtemp(prefix="multiproc_race_")
    idx = os.path.join(root, "idx")
    confirmed_path = os.path.join(root, "confirmed_deletes.json")
    stop_path = os.path.join(root, "STOP")
    logs = {r: os.path.join(root, f"{r}.jsonl") for r in
            ("appender", "deleter", "prober")}

    with open(OUT, "w") as fh:

        def emit(rec: dict) -> None:
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(json.dumps(rec))

        emit(
            {
                "phase": "meta",
                "base_n": base_n,
                "gens": gens,
                "gen_n": gen_n,
                "events": events,
                "del_n": del_n,
                "dim": DIM,
            }
        )
        spark = _session("parent")
        t0 = time.time()
        meta = build_ivf_index(synth(spark, base_n, 0), idx)
        emit(
            {
                "phase": "build",
                "n_cells": meta["n_cells"],
                "build_s": round(time.time() - t0, 2),
            }
        )
        spark.stop()  # the parent's JVM must not outlive into the race:
        # the three children are the ONLY sessions touching the index

        here = os.path.abspath(__file__)
        env = dict(os.environ)
        procs = {
            "appender": subprocess.Popen(
                [sys.executable, here, "appender", idx, logs["appender"],
                 str(gens), str(gen_n)],
                env=env,
            ),
            "deleter": subprocess.Popen(
                [sys.executable, here, "deleter", idx, logs["deleter"],
                 str(events), str(del_n), confirmed_path],
                env=env,
            ),
            "prober": subprocess.Popen(
                [sys.executable, here, "prober", idx, logs["prober"],
                 confirmed_path, stop_path],
                env=env,
            ),
        }
        t0 = time.time()
        rc = {
            "appender": procs["appender"].wait(timeout=3600),
            "deleter": procs["deleter"].wait(timeout=3600),
        }
        open(stop_path, "w").close()
        rc["prober"] = procs["prober"].wait(timeout=900)
        race_s = time.time() - t0

        for role, log in logs.items():
            if os.path.exists(log):
                for line in open(log):
                    emit(json.loads(line))
        emit({"phase": "race_done", "exit_codes": rc, "race_s": round(race_s, 2)})
        assert all(v == 0 for v in rc.values()), rc

        # parent audit with a fresh session
        spark = _session("audit")
        import pyspark.sql.functions as F

        cells = spark.read.parquet(os.path.join(idx, "cells"))
        still_ids, names = load_tombstones(idx)
        live_df = cells
        if still_ids:
            live_df = cells.filter(
                ~F.col("vec_id").isin([int(i) for i in still_ids])
            )
        live_rows = live_df.count()
        expected = base_n + gens * gen_n - events * del_n
        dup = live_df.groupBy("vec_id").count().filter("count > 1").count()
        staging = os.path.join(idx, "_staging")
        stranded = [
            t
            for t in (os.listdir(staging) if os.path.isdir(staging) else [])
            if os.path.exists(os.path.join(staging, t, "_COMMITTED"))
        ]
        report = index_report(idx)
        emit(
            {
                "phase": "audit",
                "live_rows": live_rows,
                "expected_live": expected,
                "physical_rows": cells.count(),
                "still_tombstoned": len(still_ids),
                "tombstone_files": len(names),
                "duplicates": dup,
                "stranded_committed_stages": stranded,
                "report_n_vectors": report.get("n_vectors"),
                "report_n_cells": report.get("family", {}).get("n_cells"),
            }
        )
        assert dup == 0 and live_rows == expected and not stranded
        spark.stop()
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ("appender", "deleter", "prober"):
        role = sys.argv[1]
        if role == "appender":
            run_appender(
                sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5])
            )
        elif role == "deleter":
            run_deleter(
                sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5]),
                sys.argv[6],
            )
        else:
            run_prober(sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5])
    else:
        main()
