"""Round-15 measurement: the tombstone FILE-count bound
(index_maintenance.compact_tombstones).

The vacuum trigger bounds tombstone IDS, not FILES; every probe's
load_tombstones pays one open+parse per file. This measures the per-probe
tombstone-load cost as single-id delete files accumulate (the hot
small-batch delete-feed shape), then after one fold — the quantity the
TOMBSTONE_FOLD_MAX_FILES=64 bound holds down in the ticks and the delete
stream. Pure driver-side (load_tombstones is the probe's exact code path).

Writes tools/tombstone_fold_r15.jsonl:
python tools/tombstone_fold_r15.py [max_files_decade]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalakejson_spark.functions.index_maintenance import (  # noqa: E402
    add_tombstones,
    compact_tombstones,
    load_tombstones,
)

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tombstone_fold_r15.jsonl"
)
TOP = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000


def timed_load(idx: str, reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        ids, names = load_tombstones(idx)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    idx = tempfile.mkdtemp(prefix="tomb_fold_")
    with open(OUT, "w") as fh:

        def emit(rec):
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(json.dumps(rec))

        emit({"phase": "meta", "shape": "one id per file", "top": TOP})
        n = 0
        for target in (100, 1_000, TOP):
            while n < target:
                add_tombstones(idx, [n])
                n += 1
            load_s = timed_load(idx)
            emit(
                {
                    "phase": "unfolded",
                    "files": target,
                    "probe_load_s": round(load_s, 4),
                }
            )
        t0 = time.perf_counter()
        folded = compact_tombstones(idx)
        fold_s = time.perf_counter() - t0
        ids, names = load_tombstones(idx)
        emit(
            {
                "phase": "folded",
                "files_folded": folded,
                "fold_s": round(fold_s, 3),
                "files_after": len(names),
                "ids_preserved": len(ids) == TOP,
                "probe_load_s": round(timed_load(idx), 5),
            }
        )
    shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
