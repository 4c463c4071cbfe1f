"""Schema-free JSON ingestion into a VARIANT-typed curated lake (Spark 4).

The reference pipeline (psuedo_code.txt:186-197) reads landing JSON
PERMISSIVE with an inferred struct schema, splits on ``_corrupt_record``,
and writes typed parquet. That design has a structural weakness at 100 TB:
the curated schema is *frozen per batch* — a new field appears, and either
re-inference rewrites the table schema (evolution machinery, SURVEY §1.3) or
an old reader silently drops the field.

This module is the variant-native alternative mode: each record is kept
whole as one binary-encoded VARIANT column. Properties:

- **No inference pass.** ``try_parse_json`` needs no schema sample, so the
  double-read the reference pays (infer + load) disappears.
- **Lossless under drift.** A record with brand-new fields lands unchanged;
  consumers address it with ``variant_get`` paths and observe drift via
  ``schema_of_variant_agg`` instead of failing the batch.
- **Same DLQ contract.** ``try_parse_json`` returns NULL for malformed
  input (psuedo_code.txt:192-193's split, one expression), and the DLQ
  keeps the verbatim raw line — exactly what the reference's
  ``_corrupt_record`` carries.
- **Distributed end-to-end.** text scan → parse → split → partitioned
  parquet append, all executor-side; the driver never sees a row.

This is a complement to plans/ingest.py (the typed, ledgered reference-parity
pipeline), not a replacement: use typed ingest when the schema is a managed
contract, variant ingest when the payload is open-ended.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# Column names share the ingest plane's underscore convention
# (plans/ingest.py lineage column) so curated consumers see one idiom.
LINEAGE_COL = "_ingest_file"
RAW_COL = "_raw"
RUN_COL = "_run_id"  # per-attempt stamp (streaming drain replay resolution)


def resolve_replays(curated: DataFrame) -> DataFrame:
    """Variant-mode twin of plans/ingest.deduplicate_replays: when a crash
    between the streaming drain's parquet append and its checkpoint commit
    replays a batch, the same source file's rows exist under two run stamps;
    keep only the newest attempt per file. The semi join moves (file, run)
    keys only. A no-op for batch-mode lakes without the stamp column."""
    if RUN_COL not in curated.columns:
        return curated
    latest = curated.groupBy(LINEAGE_COL).agg(F.max(RUN_COL).alias(RUN_COL))
    return curated.join(latest, [LINEAGE_COL, RUN_COL], "left_semi")


def variant_projection(raw_lines: DataFrame, column: str = "record") -> DataFrame:
    """(variant, raw, lineage) projection over a text source's ``value``
    column — THE parse step, shared verbatim by the batch scan and the
    streaming drain so the two modes cannot diverge. Blank lines are dropped
    (not corrupt, not data); any non-blank line that fails to parse carries
    a NULL variant and its verbatim text for the DLQ."""
    return (
        raw_lines.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.try_parse_json("value").alias(column),
            F.col("value").alias(RAW_COL),
            F.input_file_name().alias(LINEAGE_COL),
        )
    )


def with_partition_column(
    df: DataFrame,
    column: str,
    partition_path: str,
    partition_col: str,
    partition_default: str,
) -> DataFrame:
    """Derive the hive-partition column from a path INSIDE the variant
    (sudo_code.txt:193-196's MODE partitioning, schema-free) — shared by
    the batch and streaming curate paths."""
    return df.withColumn(
        partition_col,
        F.coalesce(
            F.variant_get(F.col(column), partition_path, "string"),
            F.lit(partition_default),
        ),
    )


def scan_json_as_variant(
    spark: SparkSession, landing: str, column: str = "record"
) -> DataFrame:
    """Batch scan of landing JSON-lines as (variant, raw, lineage) — no
    schema, no inference job (see variant_projection)."""
    return variant_projection(spark.read.text(landing), column)


def split_corrupt(scanned: DataFrame, column: str = "record") -> tuple[DataFrame, DataFrame]:
    """(good, corrupt): the variant-native form of the reference's
    ``_corrupt_record`` split (psuedo_code.txt:192-193). Good rows drop the
    raw text (the variant IS the record); corrupt rows keep it for the DLQ."""
    good = scanned.filter(F.col(column).isNotNull()).drop(RAW_COL)
    corrupt = scanned.filter(F.col(column).isNull()).drop(column)
    return good, corrupt


def curate_variant(
    spark: SparkSession,
    landing: str,
    curated_dir: str,
    dlq_dir: str,
    column: str = "record",
    partition_path: str | None = "$.MODE",
    partition_col: str = "mode",
    partition_default: str = "unknown",
) -> dict[str, int]:
    """One landing→curated pass in variant mode: scan, split, DLQ the
    corrupt lines as JSON (same sink shape as plans/ingest.py's DLQ), append
    good records as parquet partitioned by a path extracted FROM the variant
    (the reference partitions curated data by the MODE field,
    sudo_code.txt:193-196 — here the field never had to be in a schema).

    The scan is persisted across the split's two consumers (DLQ write +
    curated write), so the landing zone is read ONCE per pass — the same
    cache discipline the reference's PERMISSIVE pipeline needs
    (psuedo_code.txt:192-197 filters one RAW_DF twice) and the typed
    streaming path applies (streaming/ingest_stream.py)."""
    scanned = scan_json_as_variant(spark, landing, column).persist()
    try:
        good, corrupt = split_corrupt(scanned, column)

        n_corrupt = corrupt.count()
        if n_corrupt:
            corrupt.write.mode("append").json(dlq_dir)

        # per-PASS count, from the persisted scan — both counts in the
        # returned dict describe this pass, and the curated lake is never
        # re-scanned (an O(lake-size) cost per ingest pass at scale)
        n_good = good.count()
        if partition_path is not None:
            good = with_partition_column(
                good, column, partition_path, partition_col, partition_default
            )
            good.write.mode("append").partitionBy(partition_col).parquet(curated_dir)
        else:
            good.write.mode("append").parquet(curated_dir)
    finally:
        scanned.unpersist()

    return {"good_rows": n_good, "corrupt_rows": n_corrupt}


def drift_report(curated: DataFrame, column: str = "record") -> DataFrame:
    """Schema drift as a query instead of a failure: the merged variant
    schema and record count per ingest file. A new field shows up as a wider
    ``OBJECT<...>`` string for the files that carry it — the observable the
    reference's drift gate (psuedo_code.txt:362) derives from re-inference,
    here read straight off the stored variants with no extra scan of the
    landing zone."""
    return curated.groupBy(LINEAGE_COL).agg(
        F.count("*").alias("n_records"),
        F.schema_of_variant_agg(F.col(column)).alias("merged_schema"),
    )
