"""Commit-path probe cost at 10^7 terminal files (VERDICT r8 'what's wrong
#3'): measure the fenced steady batch against a decade-2 terminal history,
with and without the round-9 per-segment ``_RANGE.json`` key-range sidecars.

Setup mirrors the real steady state the reference reaches after months of
ingest: 10^7 completed files whose keys are time-ordered (the common
date-prefixed s3 layout — here zero-padded numeric keys, so lexical order =
arrival order), living in a handful of append-only terminal segments, plus a
50k-file active working set at the TOP of the key space (new files have new
keys). A batch's commit runs two terminal-history reads:

- the terminal-key probe (_terminal_hit): can this transition touch a
  terminal row?
- the fenced-out check (_fenced_out): which of my claims were reclaimed?

Both are now range-pruned: the batch's [min,max] key is compared against
each segment's sidecar, and time-ordered keys fall OUTSIDE every historic
segment's range, so the probe touches zero terminal segments regardless of
history size. Deleting the sidecars restores the r8 behavior (conservative
full-history semi-join) for an apples-to-apples on the same ledger.

Usage: python tools/ledger_probe_10m.py [n_terminal] [n_segments]
Defaults: 10_000_000 rows in 10 segments. Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import pyspark.sql.functions as F

    from datalakejson_spark.plans.ledger import Ledger, LedgerStatus
    from datalakejson_spark.session import get_spark

    n_term = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_segs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_active = 50_000
    spark = get_spark("ledger-probe-10m")
    root = tempfile.mkdtemp(prefix="ledger_probe_")
    led = Ledger(spark, f"{root}/ledger")

    def synth(lo: int, hi: int):
        return spark.range(lo, hi).select(
            F.format_string(
                "s3://lake/landing/dt=%08d/f%09d",
                (F.col("id") / 100_000).cast("long"),
                F.col("id"),
            ).alias("s3_key"),
            F.lit(1000).cast("long").alias("file_size_bytes"),
        )

    out: dict[str, object] = {"n_terminal": n_term, "n_segments": n_segs}

    # History: register + complete in key-contiguous chunks, one terminal
    # segment per chunk (exactly how segments accrue batch-by-batch).
    chunk = n_term // n_segs
    t0 = time.time()
    for s in range(n_segs):
        lo, hi = s * chunk, (s + 1) * chunk
        led.register(synth(lo, hi))
        led.set_status(synth(lo, hi).select("s3_key"), LedgerStatus.SUCCEEDED)
    out["setup_sec"] = round(time.time() - t0, 1)

    # Working set at the top of the key space (new files, new keys).
    led.register(synth(n_term, n_term + n_active))

    def steady_batch(run_id: str) -> float:
        t0 = time.time()
        claimed = led.claim_batch(10_000, run_id)
        assert len(claimed) == 10_000
        led.apply_outcomes(
            [(claimed, LedgerStatus.SUCCEEDED, None)], run_id=run_id
        )
        return round(time.time() - t0, 2)

    # Warm-up, then measured batch WITH sidecars (range-pruned probe).
    steady_batch("warm")
    out["steady_batch_sidecars_sec"] = steady_batch("probe-a")

    # Strip every sidecar -> conservative full-history probe (r8 behavior).
    ptr = json.loads((Path(f"{root}/ledger") / "_LATEST").read_text())
    stripped = 0
    for seg in ptr["terminal"]:
        p = Path(f"{root}/ledger") / seg / "_RANGE.json"
        if p.exists():
            p.unlink()
            stripped += 1
    out["sidecars_stripped"] = stripped
    out["steady_batch_full_probe_sec"] = steady_batch("probe-b")

    print(json.dumps(out))
    spark.stop()
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
