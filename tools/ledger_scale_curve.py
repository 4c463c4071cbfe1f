"""Measured ingest-plane ledger scaling curve (VERDICT r6 #4).

SCALE.md's ledger claims ("anti-join broadcastable to ~10^8 files",
"snapshot overwrite fine to ~10^7, then partition-by-status") were design
assertions. This measures them: synthetic metadata-only ledgers at 10^4 /
10^5 / 10^6 files (no payloads — the ledger never touches payload bytes),
timing each phase of the real per-batch cycle:

- register N        (initial discovery: anti-join against empty, snapshot write)
- register +N/10    (incremental discovery: anti-join against N existing)
- claim 10k         (status filter + lease check + fenced flip + snapshot write)
- commit 10k        (apply_outcomes SUCCEEDED + snapshot write)

Every phase after the first carries the O(N) snapshot read+overwrite term —
the curve shows where that term starts to dominate the per-batch constant.

Usage: python tools/ledger_scale_curve.py [max_exponent]   (default 6)
       python tools/ledger_scale_curve.py [max_exponent] jdbc
           — measure the JDBC ledger (embedded Derby) instead: its per-row
           transactional updates have NO O(N) snapshot term, so the steady
           batch cost should be ~flat in N (the documented fix for the
           parquet ledger's measured ~10^6-file crossover). Derby seeding is
           per-row over py4j, so the jdbc mode caps at 10^5.
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

    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    use_jdbc = len(sys.argv) > 2 and sys.argv[2] == "jdbc"
    spark = get_spark("ledger-scale-curve")
    root = tempfile.mkdtemp(prefix="ledger_curve_")
    out = {}
    for exp in range(4, min(max_exp, 5 if use_jdbc else 99) + 1):
        n = 10**exp
        if use_jdbc:
            from datalakejson_spark.plans.jdbc_ledger import JdbcLedger

            led = JdbcLedger(spark, f"jdbc:derby:{root}/derby_{n};create=true")
        else:
            led = Ledger(spark, f"{root}/ledger_{n}")

        def synth(lo: int, hi: int):
            return spark.range(lo, hi).select(
                F.concat(F.lit("s3://lake/landing/part/f"), F.col("id")).alias(
                    "s3_key"
                ),
                F.lit(1000).alias("file_size_bytes").cast("long"),
            )

        row = {}
        t0 = time.time()
        assert led.register(synth(0, n)) == n
        row["register_initial_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        assert led.register(synth(n, n + n // 10)) == n // 10
        row["register_incremental_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        claimed = led.claim_batch(10_000, "run-curve-1")
        row["claim_10k_sec"] = round(time.time() - t0, 2)
        assert len(claimed) == 10_000

        t0 = time.time()
        led.apply_outcomes(
            [(claimed, LedgerStatus.SUCCEEDED, None)], run_id="run-curve-1"
        )
        row["commit_10k_sec"] = round(time.time() - t0, 2)

        # steady-state batch = claim + commit (the per-batch cycle cost once
        # discovery has amortized)
        t0 = time.time()
        claimed2 = led.claim_batch(10_000, "run-curve-2")
        led.apply_outcomes(
            [(claimed2, LedgerStatus.SUCCEEDED, None)], run_id="run-curve-2"
        )
        row["steady_batch_sec"] = round(time.time() - t0, 2)

        if not use_jdbc:
            # Terminal-majority steady state — the real-world shape (most
            # files long done) that the round-8 status-partitioned snapshot
            # targets: flip all but 50k rows to SUCCEEDED (setup, untimed;
            # one bulk write), then measure the per-batch cycle again. Under
            # the split snapshot this batch rewrites only the ~50k-row
            # active part + an O(batch) segment, not all N rows.
            if n > 50_000:
                led.set_status(
                    synth(0, n - 50_000).select("s3_key"),
                    LedgerStatus.SUCCEEDED,
                )
                t0 = time.time()
                claimed3 = led.claim_batch(10_000, "run-curve-3")
                led.apply_outcomes(
                    [(claimed3, LedgerStatus.SUCCEEDED, None)],
                    run_id="run-curve-3",
                )
                row["steady_batch_terminal_majority_sec"] = round(
                    time.time() - t0, 2
                )

        if not use_jdbc:
            # Total LIVE state bytes: active part + every segment the
            # pointer references (measuring only the newest dir would read
            # ~20x small under the split layout once the terminal majority
            # leaves the active part — a phantom cross-round improvement).
            ptr = json.loads((Path(f"{root}/ledger_{n}") / "_LATEST").read_text())
            live = [ptr["active"], *ptr["terminal"]]
            row["snapshot_bytes"] = sum(
                f.stat().st_size
                for d in live
                for f in (Path(f"{root}/ledger_{n}") / d).rglob("*.parquet")
            )
        out[f"1e{exp}"] = row
        print(json.dumps({f"1e{exp}": row}), flush=True)
    print(json.dumps({"ledger_scale_curve": out}))
    spark.stop()
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
