"""Decade-4 pruned-probe point: a 10^8-ROW dedup index (round 12).

Extends tools/dedup_index_curve_r11.jsonl one more decade. The index is
FABRICATED (md5-shaped keys from spark.range — the corpus documents need
not exist; the probe machinery only ever sees the index files), written in
the exact compacted geometry of the r11 curve (range-disjoint, 4096-row
files), with 10 planted REAL probe docs so the audit has collisions (the
two SQLMetrics traps: count() eliminates the probes; zero collisions let
AQE drop executed stages from the final plan).

Checks the K x rows_per_file formula a third decade and reports the
autotune inversion (functions/incremental_dedup.autotune_target_rows_per_file).

Usage: python tools/dedup_probe_decade4.py [n_docs] [--out=PATH]
Default n_docs: 25_000_000 (= 10^8 band rows); out: /tmp/dedup_probe_d4.jsonl
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

TARGET_ROWS = 4096  # the r11 curve geometry
PROBE_DOCS = 100
PLANTED = 10
WORDS_PER_DOC = 24


def synth_docs(spark, start: int, n: int):
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)),
                lambda k: F.concat(F.lit("w"), F.col("id"), F.lit("x"), k),
            ),
        ).alias("text"),
    )


def main() -> None:
    from datalakejson_spark.functions.dedup import band_table, minhash_signatures
    from datalakejson_spark.functions import incremental_dedup as inc
    from datalakejson_spark.plans.metrics import executed_summary
    from datalakejson_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else 25_000_000
    out_path = "/tmp/dedup_probe_d4.jsonl"
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]

    spark = get_spark("dedup-probe-decade4")
    fh = open(out_path, "a", buffering=1)
    n_bands = inc._num_bands()
    fh.write(json.dumps({
        "phase": "meta", "start": time.strftime("%F %T"),
        "index_docs": n_docs, "band_rows": n_docs * n_bands,
        "target_rows": TARGET_ROWS,
    }) + "\n")
    root = Path(tempfile.mkdtemp(prefix=f"d4_{n_docs}_"))
    idx = str(root / "idx")
    try:
        planted = synth_docs(spark, 0, PLANTED)
        t0 = time.time()
        hashes = (
            spark.range(n_docs)
            .select(F.md5(F.col("id").cast("string")).alias("text_hash"))
            .unionByName(inc.exact_hash_index(planted))
        )
        bands = (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
            )
            .withColumn(
                "band_hash",
                F.md5(F.concat(F.col("band").cast("string"), F.lit(":"),
                               F.col("doc_id").cast("string"))),
            )
            .unionByName(band_table(minhash_signatures(planted)))
        )
        for sub, df, rows in (
            ("hashes", hashes, n_docs + PLANTED),
            ("bands", bands, (n_docs + PLANTED) * n_bands),
        ):
            key = inc._PRUNE_KEY[sub]
            parts = max(1, math.ceil(rows / TARGET_ROWS))
            df.repartitionByRange(parts, key).sortWithinPartitions(
                key
            ).write.mode("overwrite").parquet(os.path.join(idx, sub))
        inc.write_lane_meta(idx)
        build_sec = time.time() - t0
        t0 = time.time()
        n_files = {}
        for sub in inc._INDEX_SUBDIRS:  # one-time sidecar warm, untimed probe
            n_files[sub] = len(
                inc._file_stats(os.path.join(idx, sub), inc._PRUNE_KEY[sub])
            )
        warm_sec = time.time() - t0
        fh.write(json.dumps({
            "phase": "build", "build_sec": round(build_sec, 2),
            "sidecar_warm_sec": round(warm_sec, 2), "files": n_files,
        }) + "\n")

        novel = synth_docs(spark, n_docs + 10_000, PROBE_DOCS - PLANTED)
        delta = novel.unionByName(synth_docs(spark, 0, PLANTED)).localCheckpoint(
            eager=True
        )

        # full-scan audit (the unpruned posture)
        hframe = spark.read.parquet(f"{idx}/hashes")
        bframe = spark.read.parquet(f"{idx}/bands")
        t0 = time.time()
        audit = inc.dedup_audit(delta, hframe, bframe)
        full_rows = sorted(map(tuple, audit.collect()))
        audit_sec = round(time.time() - t0, 2)
        s = executed_summary(audit)

        # pruned audit (the loop's actual plan)
        t0 = time.time()
        hash_keys = [
            r[0] for r in delta.select(F.md5("text")).distinct().collect()
        ]
        band_keys = [
            r[0]
            for r in band_table(minhash_signatures(delta))
            .select("band_hash")
            .distinct()
            .collect()
        ]
        ph, pb, prune_stats = inc._read_index_pair_pruned(
            spark, idx, "doc_id", hash_keys, band_keys
        )
        pruned_audit = inc.dedup_audit(delta, ph, pb)
        pruned_rows = sorted(map(tuple, pruned_audit.collect()))
        pruned_sec = round(time.time() - t0, 2)
        ps = executed_summary(pruned_audit)
        assert pruned_rows == full_rows, "pruned audit diverged"
        n_planted_dups = sum(1 for r in full_rows if r[1])
        assert n_planted_dups == PLANTED, n_planted_dups

        # formula: each distinct key lands in ≤1 range-disjoint file;
        # expected distinct files ≈ birthday-corrected
        formula = (len(hash_keys) + len(band_keys)) * TARGET_ROWS
        dev = ps["scan_rows"] / formula if formula else None
        fh.write(json.dumps({
            "phase": "dedup_index",
            "index_docs": n_docs,
            "index_rows": n_docs * (n_bands + 1),
            "probe_docs": PROBE_DOCS,
            "target_rows_per_file": TARGET_ROWS,
            "audit_only_sec": audit_sec,
            "audit_scan_rows": s["scan_rows"],
            "audit_shuffle_bytes": s["shuffle_bytes"],
            "pruned_audit_sec": pruned_sec,
            "pruned_scan_rows": ps["scan_rows"],
            "pruned_shuffle_bytes": ps["shuffle_bytes"],
            "pruned_files": prune_stats,
            "pruned_equals_full": True,
            "formula_scan_rows": formula,
            "formula_vs_measured": round(dev, 4),
            "autotune_batch100": inc.autotune_target_rows_per_file(100),
            "autotune_batch1000": inc.autotune_target_rows_per_file(1000),
        }) + "\n")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    fh.write(json.dumps({"phase": "meta", "done": time.strftime("%F %T")}) + "\n")
    print(f"done -> {out_path}")


if __name__ == "__main__":
    main()
