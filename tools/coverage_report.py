"""Generate COVERAGE.md: SURVEY.md §2 operator inventory → the query, module,
or test that implements each row, cross-referenced from the registry's
``survey`` tags plus a static map for the non-registry planes (ingest,
streaming, UDF, multimodal).

Usage: python tools/coverage_report.py   (writes COVERAGE.md)
"""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Non-registry coverage: operator id -> (implementation, verification)
STATIC = {
    "S1": ("plans/ingest.py PERMISSIVE read", "tests/test_ingest.py::test_ingest_end_to_end"),
    "S2": ("plans/ingest.py per-batch inference + IngestConfig.schema override", "tests/test_ingest.py"),
    "S3": ("plans/ingest.py input_file_name lineage", "tests/test_ingest.py (source_s3_path)"),
    "S4": ("plans/ingest.py discover()", "tests/test_ingest.py::test_discover_registers_pending_idempotently"),
    "S5": ("plans/jdbc_ledger.py JdbcLedger (embedded Derby; IngestConfig.jdbc_url = the reference's JDBC_URL)", "tests/test_jdbc_ledger.py (claims, fencing, e2e)"),
    "S6": ("plans/ingest.py partitioned parquet append", "tests/test_ingest.py (partition layout)"),
    "S7": ("plans/ingest.py DLQ json append", "tests/test_ingest.py (DLQ contents)"),
    "S8": ("sources/tables.py + plans/ingest.py read_curated", "all registry queries; tests/test_plans.py"),
    "S9": ("sources/catalog.py register_curated_table/save_as_managed_table", "tests/test_plans.py::test_partition_pruning_on_curated_lake"),
    "S10": ("plans/ingest.py _move_idempotent archive", "tests/test_ingest.py (archive moves)"),
    "S11": ("plans/ledger.py register (anti-join ON CONFLICT DO NOTHING)", "tests/test_ingest.py (idempotent discovery)"),
    "E1": ("plans/ingest.py corrupt split (cached single read)", "tests/test_ingest.py"),
    "E2": ("plans/ingest.py per-file outcome classification", "tests/test_ingest.py (QUARANTINED)"),
    "E3": ("plans/ledger.py claim_batch retry_count", "tests/test_ingest.py::test_failed_files_are_reclaimed_with_retry"),
    "E4": ("plans/ingest.py whole-batch FAILED on error", "tests/test_ingest.py::test_crash_recovery_marks_batch_failed"),
    "E5": ("plans/ingest.py lost-file reconciliation", "tests/test_ingest.py"),
    "T1": ("streaming/ingest_stream.py AvailableNow + checkpoint", "tests/test_streaming.py::test_streaming_ingest_available_now"),
    "T2": ("streaming/ingest_stream.py idempotent foreachBatch + batch id stamp", "tests/test_streaming.py"),
    "T3": ("streaming/ingest_stream.py DLQ inside micro-batch", "tests/test_streaming.py"),
    "T7": ("withWatermark late-row drop", "tests/test_streaming.py::test_watermark_drops_late_rows"),
    "T8": ("watermarked dropDuplicates", "tests/test_scale_patterns.py::test_streaming_dedup_with_watermark"),
    "D1": ("functions/udfs.py classify_priority_udf", "tests/test_udfs.py::test_d1_row_udf"),
    "D2": ("functions/udfs.py discounted_charge / zscore_clip", "tests/test_udfs.py (bit-equal vs builtin)"),
    "D3": ("functions/udfs.py interquartile_range", "tests/test_udfs.py::test_d3_grouped_agg_iqr"),
    "D4": ("functions/udfs.py add_group_minmax_scaled", "tests/test_udfs.py::test_d4_apply_in_pandas_scaling"),
    "D5": ("functions/udfs.py tokenize_mapinpandas; functions/multimodal.py", "tests/test_udfs.py::test_d5_map_in_pandas_tokenize"),
    "L5": ("functions/multimodal.py + imagecodecs.py/audiocodecs.py/containers.py (binary assets; REAL decode: PPM/BMP/PNG(all depths+Adam7)/JPEG(baseline+progressive)/GIF/TIFF(+LZW)/WebP-lossless(VP8L, r7 webpcodec.py) images, PCM(8/16/24/32+float+extensible)+IMA-ADPCM+FLAC+AU/AIFF-G.711(r7) audio, Y4M video; REAL container metadata: MP4 boxes, MP3 frame walk, WebP dims; streaming drain via streaming/media_stream.py; REAL transforms (r9): image resize (exact area box-filter + nearest, PPM interchange) and audio resample (box/linear to target rate, PCM16-WAV interchange), both mapInPandas narrow; pixel/PCM stub only for entropy-coded formats without a codec)", "tests/test_codecs.py + tests/test_containers.py + tests/test_streaming.py::test_streaming_media_features"),
    "F8": ("input_file_name in ingest lineage; md5 fingerprints for surrogate keys", "tests/test_ingest.py; l4c_fingerprint"),
    "X1": ("partitionBy write + catalog pruning", "tests/test_plans.py::test_partition_pruning_on_curated_lake"),
    "X2": ("parquet pushdown/pruning", "tests/test_plans.py::test_flagship_pushdown_and_pruning"),
    "X3": ("mergeSchema at read", "tests/test_ingest.py::test_schema_evolution_union"),
    "X4": ("IngestConfig.batch_size", "tests/test_ingest.py"),
    "X5": ("plans/jdbc_ledger.py guarded claims + run-id fencing (SKIP-LOCKED equivalent)", "tests/test_jdbc_ledger.py two-runner claim→process→commit soak + reclaim-contention soak"),
    "X7": ("graceful no-work exit", "tests/test_ingest.py::test_rerun_is_noop"),
    "X8": ("idempotent side effects + per-batch ledger commit", "tests/test_ingest.py"),
}


def main() -> None:
    from datalakejson_spark.registry import all_specs

    specs = all_specs()
    by_op: dict[str, list[str]] = defaultdict(list)
    for name, spec in sorted(specs.items()):
        for op in [t.strip() for t in spec.survey.split(",") if t.strip()]:
            by_op[op].append(name + ("" if spec.sql else " (rows-only)"))

    lines = [
        "# COVERAGE — SURVEY.md §2 operator inventory → implementation\n",
        "Generated by `python tools/coverage_report.py`. Registry rows are",
        "oracle-checked queries in `__spark_entry__.py:queries()` unless marked",
        "rows-only; plane rows point at module + test.\n",
        "| op | registry queries | plane implementation | verified by |",
        "|---|---|---|---|",
    ]
    ops = sorted(set(by_op) | set(STATIC), key=lambda s: (s[0], len(s), s))
    for op in ops:
        queries = "<br>".join(by_op.get(op, [])) or "—"
        impl, verify = STATIC.get(op, ("—", "oracle compare at sf0.01"))
        if op in by_op and op not in STATIC:
            impl = "operators/functions registry"
        lines.append(f"| {op} | {queries} | {impl} | {verify} |")
    n_q = len(specs)
    n_oracle = sum(1 for s in specs.values() if s.sql)
    lines.append(
        f"\n**Totals**: {n_q} registered queries ({n_oracle} oracle-checked, "
        f"{n_q - n_oracle} rows-only), {len(ops)} inventory rows covered.\n"
    )
    Path(__file__).resolve().parent.parent.joinpath("COVERAGE.md").write_text(
        "\n".join(lines)
    )
    print(f"COVERAGE.md written: {n_q} queries, {len(ops)} ops")


if __name__ == "__main__":
    main()
