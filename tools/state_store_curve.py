"""State-store growth curve for watermarked streaming aggregation (round 10).

SCALE.md's streaming section claims "state-store-backed operators carry
watermarks to bound state" — this runner MEASURES it, the way the
round-10 curves measured the file-source and dedup-index claims. A
watermarked tumbling-window count (the T4/T7 shape) runs as repeated
AvailableNow drains against one checkpoint while event time advances one
window per round; after each drain the state operator's own metrics
(lastProgress.stateOperators: numRowsTotal, numRowsRemoved,
stateMemory) are recorded.

The claims under test, per K distinct keys in {10^3, 10^4, 10^5}:

1. **State rows are O(active keys × open windows), NOT O(rounds)**:
   numRowsTotal must plateau after the watermark starts closing windows —
   round 8 holds the same state rows as round 4 even though twice the
   windows ever existed.
2. **Eviction actually happens**: numRowsRemoved > 0 once the watermark
   passes a window's end (append mode emits exactly the closed windows).
3. **State scales linearly in K** across the three decades (it is keyed
   state, nothing global).

Usage: python tools/state_store_curve.py [K ...] [--out=PATH]
Defaults: 1000 10000 100000; JSONL appends to /tmp/state_store_curve.jsonl
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from datetime import datetime, timedelta, timezone
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROUNDS = 8
WINDOW = "5 minutes"
WATERMARK = "10 minutes"
T0 = datetime(2024, 3, 1, 10, 0, 0, tzinfo=timezone.utc)


def write_round(land: Path, rnd: int, n_keys: int) -> None:
    """One event per key at event-time T0 + rnd*5min (each round opens the
    next tumbling window for every key)."""
    ts = (T0 + timedelta(minutes=5 * rnd)).strftime("%Y-%m-%dT%H:%M:%SZ")
    land.mkdir(parents=True, exist_ok=True)
    with open(land / f"r{rnd:03d}.json", "w") as fh:
        for k in range(n_keys):
            fh.write(json.dumps({"key": k, "ts": ts, "v": 1.0}) + "\n")


def drain_once(spark, root: Path) -> dict:
    import pyspark.sql.functions as F

    stream = (
        spark.readStream.schema("key long, ts timestamp, v double")
        .json(str(root / "landing"))
        .withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW), F.col("key"))
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(root / "out"))
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ops = (q.lastProgress or {}).get("stateOperators") or [{}]
    op = ops[0]
    return {
        "state_rows": op.get("numRowsTotal"),
        "rows_removed": op.get("numRowsRemoved"),
        "rows_updated": op.get("numRowsUpdated"),
        "state_bytes": (op.get("customMetrics") or {}).get(
            "stateOnCurrentVersionSizeBytes"
        )
        or op.get("memoryUsedBytes"),
    }


def main() -> None:
    from datalakejson_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:] if not a.startswith("--")] or [
        1_000,
        10_000,
        100_000,
    ]
    out_path = "/tmp/state_store_curve.jsonl"
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    spark = get_spark("state-store-curve")
    fh = open(out_path, "a", buffering=1)
    fh.write(json.dumps({"phase": "meta", "start": time.strftime("%F %T"),
                         "keys": ks, "rounds": ROUNDS}) + "\n")
    for k in ks:
        root = Path(tempfile.mkdtemp(prefix=f"state_curve_{k}_"))
        try:
            per_round = []
            for rnd in range(ROUNDS):
                write_round(root / "landing", rnd, k)
                t0 = time.time()
                m = drain_once(spark, root)
                m.update(round=rnd, drain_sec=round(time.time() - t0, 2))
                per_round.append(m)
            closed = spark.read.parquet(str(root / "out")).count()
            fh.write(
                json.dumps(
                    {
                        "phase": "state",
                        "n_keys": k,
                        "rounds": per_round,
                        "closed_window_rows": closed,
                    }
                )
                + "\n"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    fh.write(json.dumps({"phase": "meta", "done": time.strftime("%F %T")}) + "\n")
    fh.close()
    print(f"done -> {out_path}")


if __name__ == "__main__":
    main()
