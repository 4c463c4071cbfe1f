"""End-to-end demo: the full reference workflow on synthetic data.

    python tools/demo_pipeline.py [n_files] [records_per_file]

1. synthesize a landing zone of nested JSON drops (good + corrupt + drift)
2. discover → register in the ledger
3. batch-ingest until drained (PERMISSIVE split, DLQ, archive, event-time
   partitioned curated lake)
4. register the curated lake in the catalog, run a partition-pruned SQL query
5. run the Tier C reports: exact dedup, MinHash near-dup candidates, token
   quality profile

Prints a summary and the measured ingest throughput (the reference's cron
ceiling is ~960k files/day ≈ 11 files/s; sudo_code.txt:107,128).
"""

from __future__ import annotations

import json
import random
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datalakejson_spark.session import get_spark  # noqa: E402


def synthesize_landing(root: Path, n_files: int, per_file: int) -> int:
    rng = random.Random(42)
    total = 0
    for i in range(n_files):
        week = rng.randint(1, 8)
        day = rng.randint(1, 28)
        path = root / "2024" / f"week{week:02d}" / f"drop_{i:05d}.json"
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            for j in range(per_file):
                rec = {
                    "id": f"r-{i}-{j}",
                    "event_timestamp": f"2024-{1 + week // 5:02d}-{day:02d}T{j % 24:02d}:00:00Z",
                    "MODE": rng.choice(["train", "eval", "test"]),
                    "metadata": {"app_version": f"1.{i % 5}.0", "user_agent": f"ua{j % 7}"},
                    "payload": {
                        "transaction_id": f"t{i}-{j}",
                        "items": [{"sku": f"s{j % 11}", "qty": j % 5 + 1}],
                    },
                }
                f.write(json.dumps(rec) + "\n")
                total += 1
            if i % 10 == 3:  # every 10th file carries a corrupt line
                f.write('{"id": "broken", "event_timestamp": \n')
                total += 1
    return total


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from datalakejson_spark.plans.ingest import (
        IngestConfig,
        discover,
        read_curated,
        run_until_drained,
    )
    from datalakejson_spark.plans.ledger import Ledger
    from datalakejson_spark.sources.catalog import register_curated_table
    from datalakejson_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    work = Path(tempfile.mkdtemp(prefix="datalakejson-demo-"))
    landing = work / "landing"
    n_rows = synthesize_landing(landing, n_files, per_file)
    print(f"[1] landing zone: {n_files} files, {n_rows} lines at {landing}")

    spark = get_spark("demo-pipeline")
    conf = IngestConfig(
        landing_dir=str(landing),
        curated_dir=str(work / "curated"),
        dlq_dir=str(work / "dlq"),
        archive_dir=str(work / "archive"),
        ledger_dir=str(work / "ledger"),
        # reference-parity batch size (sudo_code.txt:128). Tiny batches pay
        # ~3s of fixed Spark-job + ledger-snapshot cost each; at 10k files a
        # batch amortizes it (micro-batch cycling still demoed when
        # n_files > batch_size).
        batch_size=min(10_000, max(n_files // 2, 25)),
    )

    n_new = discover(spark, conf)
    print(f"[2] discovery: {n_new} files registered PENDING")

    t0 = time.time()
    results = run_until_drained(spark, conf)
    dt = time.time() - t0
    ok = sum(len(r.succeeded_files) for r in results)
    quarantined = sum(len(r.quarantined_files) for r in results)
    rows = sum(r.good_rows for r in results)
    print(
        f"[3] ingest: {len(results)} batches, {ok} files succeeded, "
        f"{quarantined} quarantined, {rows} rows curated in {dt:.1f}s "
        f"({n_files / dt:.0f} files/s vs reference ceiling ~11 files/s)"
    )
    print(f"    ledger: {Ledger(spark, conf.ledger_dir).counts()}")

    fq = register_curated_table(spark, conf.curated_dir, table="demo_curated")
    pruned = spark.sql(
        f"SELECT mode, count(*) AS n FROM {fq} WHERE year = 2024 AND month = 1 "
        "GROUP BY mode ORDER BY mode"
    )
    print(f"[4] catalog query over {fq} (partition-pruned):")
    for r in pruned.collect():
        print(f"    mode={r['mode']}: {r['n']} rows")

    curated = read_curated(spark, conf.curated_dir)
    docs = curated.selectExpr(
        "CAST(abs(hash(record_id)) AS BIGINT) AS doc_id",
        "concat_ws(' ', app_version, user_agent, transaction_id, ml_mode) AS text",
    )
    pairs = lsh_candidate_pairs(minhash_signatures(docs)).count()
    print(f"[5] tier-C: {pairs} MinHash near-dup candidate pairs over {docs.count()} docs")

    spark.stop()
    print(f"done. artifacts under {work}")


if __name__ == "__main__":
    main()
