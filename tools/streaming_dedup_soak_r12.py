"""Streaming dedup + inline index compaction soak (round 12, VERDICT #7).

Two claims, measured on the SAME stream that the correctness tests pin
(streaming/dedup_stream.py::streaming_dedup_ingest):

1. **Inline tiered compaction costs only its own batch.** Two identical
   landing backlogs drain with the compaction trigger ON (compact_max_runs
   small enough to fire repeatedly) vs OFF (None). The p50 micro-batch
   latency matches; only the triggering batches pay the O(appends) fold.
2. **The index maintenance plane and the file-source metadata log don't
   interact.** After fabricating 10^6 already-seen file entries into the
   checkpoint's source log (the r11 steady-state posture,
   tools/streaming_scale_curve.py::fabricate_seen_history), further drains —
   each a query RESTART paying the full log read, one of them the log's own
   compact-rewrite batch, several of them triggering index compactions —
   stay in the same per-batch latency family as the r11 steady curve
   (tools/streaming_scale_curve_r11.jsonl: inc_batch_p50 5.4-8.5 s at 10^6
   seen files).

Usage: python tools/streaming_dedup_soak_r12.py [--seen=1000000] [--out=PATH]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from streaming_scale_curve import batch_durations, du, fabricate_seen_history  # noqa: E402

DOCS_PER_FILE = 100
NOVEL_PER_FILE = 70  # rest are exact re-sends of file 0's docs


def landing_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )


def synth_doc_files(land: Path, n_files: int, start: int = 0) -> None:
    """JSON-lines doc files: per file, NOVEL_PER_FILE unique-vocabulary docs
    plus exact re-sends of the first file's docs (cross-batch duplicates the
    index must catch)."""
    land.mkdir(parents=True, exist_ok=True)
    for f in range(start, start + n_files):
        lines = []
        for d in range(NOVEL_PER_FILE):
            doc_id = f * DOCS_PER_FILE + d
            text = f"doc {doc_id} " + " ".join(
                f"w{doc_id}x{j}" for j in range(14)
            )
            lines.append(json.dumps({"doc_id": doc_id, "text": text}))
        for d in range(NOVEL_PER_FILE, DOCS_PER_FILE):  # re-sends of file 0
            src = d - NOVEL_PER_FILE
            text = f"doc {src} " + " ".join(f"w{src}x{j}" for j in range(14))
            lines.append(
                json.dumps({"doc_id": f * DOCS_PER_FILE + d, "text": text})
            )
        (land / f"f{f:06d}.json").write_text("\n".join(lines) + "\n")


def drain(spark, root: Path, compact_max_runs, files_per_trigger=1) -> dict:
    from datalakejson_spark.streaming.dedup_stream import streaming_dedup_ingest

    t0 = time.time()
    q = streaming_dedup_ingest(
        spark,
        landing_dir=str(root / "landing"),
        curated_dir=str(root / "curated"),
        index_dir=str(root / "idx"),
        checkpoint_dir=str(root / "ckpt"),
        schema=landing_schema(),
        max_files_per_trigger=files_per_trigger,
        compact_max_runs=compact_max_runs,
        compact_target_rows_per_file=5000,
    )
    q.awaitTermination()
    dt = time.time() - t0
    durs = batch_durations(q)
    ck_bytes, _ = du(str(root / "ckpt"))
    return {
        "drain_sec": round(dt, 2),
        "n_batches": len(durs),
        "batch_p50_sec": round(sorted(durs)[len(durs) // 2], 2) if durs else None,
        "batch_max_sec": round(max(durs), 2) if durs else None,
        "ckpt_bytes": ck_bytes,
    }


def curated_docs(spark, root: Path) -> int:
    from datalakejson_spark.plans.variant_ingest import resolve_replays

    return (
        resolve_replays(spark.read.parquet(str(root / "curated")))
        .select("doc_id")
        .distinct()
        .count()
    )


def main() -> None:
    from datalakejson_spark.plans import killpoints
    from datalakejson_spark.session import get_spark

    n_seen = 1_000_000
    out_path = "/tmp/streaming_dedup_soak_r12.jsonl"
    for a in sys.argv[1:]:
        if a.startswith("--seen="):
            n_seen = int(a.split("=", 1)[1])
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]

    spark = get_spark("streaming-dedup-soak")
    spark.conf.set("spark.sql.streaming.fileSource.log.compactInterval", "5")
    spark.sparkContext.setLogLevel("ERROR")
    fh = open(out_path, "a", buffering=1)
    fh.write(
        json.dumps(
            {"phase": "meta", "start": time.strftime("%F %T"), "n_seen": n_seen}
        )
        + "\n"
    )

    n_compactions = 0

    def count() -> None:
        nonlocal n_compactions
        n_compactions += 1

    killpoints.arm("dedup:compact_staged", count)
    roots = {}
    try:
        # ---- phase 1: compaction ON vs OFF over identical 12-file backlogs
        for mode, max_runs in (("compaction_on", 4), ("compaction_off", None)):
            root = Path(tempfile.mkdtemp(prefix=f"dsoak_{mode}_"))
            roots[mode] = root
            synth_doc_files(root / "landing", 12)
            before = n_compactions
            r = drain(spark, root, compact_max_runs=max_runs)
            novel = curated_docs(spark, root)
            fh.write(
                json.dumps(
                    {
                        "phase": "soak",
                        "mode": mode,
                        "files": 12,
                        **r,
                        "index_compactions": n_compactions - before,
                        "curated_novel_docs": novel,
                    }
                )
                + "\n"
            )
            # every file's 30 re-sends are (within-batch or cross-batch)
            # dups of file 0's novel docs → exactly 70 survivors per file
            assert novel == 12 * NOVEL_PER_FILE, novel

        on_docs = curated_docs(spark, roots["compaction_on"])
        off_docs = curated_docs(spark, roots["compaction_off"])
        assert on_docs == off_docs, (on_docs, off_docs)

        # ---- phase 2: fabricated 10^6-seen-file steady points on the ON root
        root = roots["compaction_on"]
        t0 = time.time()
        fabricate_seen_history(root / "ckpt", root / "landing", n_seen)
        fab_sec = round(time.time() - t0, 2)
        log_bytes, _ = du(str(root / "ckpt" / "sources"))
        start = 12
        # batches so far: 0-11; compactInterval=5 → log-compact batches are
        # 14, 19, ... With one file per drain (one batch each), the 3rd
        # steady drain (batch 14) pays the 10^6-entry log rewrite.
        for step in ("inc1", "inc2", "log_compact_rewrite", "inc3"):
            synth_doc_files(root / "landing", 1, start=start)
            before = n_compactions
            r = drain(spark, root, compact_max_runs=4)
            fh.write(
                json.dumps(
                    {
                        "phase": "steady_fabricated",
                        "step": step,
                        "seen_files": n_seen,
                        "fabricate_sec": fab_sec if step == "inc1" else None,
                        "source_log_bytes": log_bytes if step == "inc1" else None,
                        **{f"inc_{k}": v for k, v in r.items()},
                        "index_compactions": n_compactions - before,
                        "curated_novel_docs": curated_docs(spark, root),
                    }
                )
                + "\n"
            )
            start += 1
    finally:
        killpoints.disarm("dedup:compact_staged")
        for root in roots.values():
            shutil.rmtree(root, ignore_errors=True)
    fh.write(json.dumps({"phase": "meta", "done": time.strftime("%F %T")}) + "\n")
    print(f"done -> {out_path}")


if __name__ == "__main__":
    main()
