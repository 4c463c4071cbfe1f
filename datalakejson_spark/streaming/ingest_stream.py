"""Incremental ingest via Structured Streaming (SURVEY.md §2.10 T1-T3).

The reference's incremental loop is a cron trigger every 15 min + ledger
claim until drained (sudo_code.txt:107,136-139). The idiomatic Spark
replacement is a streaming file source with ``Trigger.AvailableNow``: the
checkpoint's file index plays the ledger's claim role (each file processed
exactly once), and one invocation drains all available work then stops —
exactly the cron semantics without external state.

Inside each micro-batch, ``foreachBatch`` runs the same corrupt-split +
transform + partitioned-append composition as the batch plane (E1/T3), so
batch and streaming share one code path (``apply_transformations``).

Exactly-once notes (T2): the file-source checkpoint guarantees each input
file enters exactly one micro-batch; the parquet append inside foreachBatch
is at-least-once under crash-between-write-and-checkpoint. Every row is
stamped with a per-ATTEMPT run id (nanosecond-ordered, so a replay of the
same batch id gets a strictly larger stamp) — the batch plane's
``deduplicate_replays`` then keeps only the newest attempt per source file,
the standard idempotent-foreachBatch pattern done in a way replays can
actually be told apart.

The audit ledger remains available: ``ledger_view`` derives per-file row
counts from the curated lake's lineage column instead of a mutable table —
at 100 TB an aggregation beats a transactional sidecar.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datalakejson_spark.plans.ingest import (
    CORRUPT_COL,
    PARTITION_COLS,
    apply_transformations,
)
from datalakejson_spark.session import configure_runtime


def streaming_ingest(
    spark: SparkSession,
    landing_dir: str,
    curated_dir: str,
    dlq_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    mode_default: str = "unknown",
    max_files_per_trigger: int | None = None,
    archive_dir: str | None = None,
):
    """Drain the landing zone once (AvailableNow) into the curated lake.

    ``schema`` is required: streaming JSON sources cannot infer (and at scale
    you never want per-batch inference anyway — SURVEY.md §2.1 S2). The
    corrupt column is pinned into it (E1 contract).

    ``archive_dir`` enables the streaming analogue of the batch plane's
    archive move (S10, sudo_code.txt archive step): processed files are
    moved out of the landing zone by the file source's completed-file
    cleaner (``cleanSource=archive``). At steady state this is what keeps
    the per-drain cost O(arrivals): every AvailableNow invocation re-lists
    the ENTIRE landing dir before the checkpoint filters seen files, so a
    landing zone that accumulates history makes each 15-min drain pay
    O(history) listing — measured in SCALE.md's streaming table. The
    archive dir must live outside the landing glob (Spark requirement).
    Returns the StreamingQuery; call ``.awaitTermination()``.
    """
    configure_runtime(spark)
    if CORRUPT_COL not in [f.name for f in schema.fields]:
        # copy — StructType.add mutates the caller's schema in place
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )

    reader = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if max_files_per_trigger:
        # batch-size analogue of BATCH_SIZE_FILES (sudo_code.txt:128)
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if archive_dir:
        # Spark requires the archive to live OUTSIDE the source pattern —
        # but enforces it only with a warn-level log and silently skips
        # archiving, so a misconfigured archive_dir would quietly return
        # the O(history) listing cost this option exists to prevent. Fail
        # loud instead (review catch, round 10). The glob root is the
        # longest wildcard-free prefix of landing_dir: anything under it
        # can match the pattern.
        def _scheme_path(p: str) -> tuple[str, str]:
            # Spark file sources accept URIs (file://, s3a://, hdfs://...);
            # os.path.abspath would mangle those into relative paths and
            # silently defeat the overlap check (review catch, round 11).
            # A bare local path and an explicit file:// URI are the same
            # filesystem, so both normalize to scheme "".
            from urllib.parse import urlparse

            u = urlparse(p)
            if u.scheme in ("", "file"):
                return "", os.path.abspath(u.path if u.scheme else p)
            return u.scheme, u.netloc + u.path

        l_scheme, glob_root = _scheme_path(landing_dir)
        a_scheme, arch = _scheme_path(archive_dir)
        wild = [i for i in (glob_root.find(c) for c in "*?[{") if i >= 0]
        if wild:
            # conservative: everything under the last separator before the
            # first wildcard can match the pattern
            glob_root = glob_root[: min(wild)]
            glob_root = glob_root[: glob_root.rfind("/") + 1]
        else:
            glob_root = glob_root.rstrip("/") + "/"
        arch = arch.rstrip("/") + "/"
        if l_scheme == a_scheme and (
            arch.startswith(glob_root) or glob_root.startswith(arch)
        ):
            raise ValueError(
                f"archive_dir {archive_dir!r} overlaps the landing source "
                f"pattern {landing_dir!r} (glob root {glob_root!r}). Spark "
                "silently skips archiving in this layout (warn-level log "
                "only) and the landing zone keeps accumulating history — "
                "place the archive outside the landing tree."
            )
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    stream = reader.json(landing_dir).withColumn(
        "source_s3_path", F.input_file_name()
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        import time

        # per-ATTEMPT id: a crash-replay of the same batch_id re-enters here
        # and gets a strictly larger stamp, making the replay deduplicable
        # (plain batch_id would stamp both attempts identically).
        run_id = f"stream-{time.time_ns():020d}-b{batch_id}"
        batch_df = batch_df.persist()
        try:
            corrupt = batch_df.filter(F.col(CORRUPT_COL).isNotNull())
            good = batch_df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
            if corrupt.limit(1).count():
                corrupt.select(CORRUPT_COL, "source_s3_path").withColumn(
                    "batch_id", F.lit(batch_id)
                ).write.mode("append").json(os.path.join(dlq_dir, f"batch-{batch_id}"))
            if good.limit(1).count():
                apply_transformations(good, mode_default).withColumn(
                    "ingest_batch_id", F.lit(batch_id)
                ).withColumn("ingest_run_id", F.lit(run_id)).write.mode(
                    "append"
                ).partitionBy(*PARTITION_COLS).parquet(curated_dir)
        finally:
            batch_df.unpersist()

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ledger_view(spark: SparkSession, curated_dir: str) -> DataFrame:
    """Audit-trail view (diagram3.mmd:22-23): rows contributed per source
    file, derived from lineage instead of a mutable status table."""
    configure_runtime(spark)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(curated_dir)
        .groupBy("source_s3_path")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("event_time_utc").alias("min_event_time"),
            F.max("event_time_utc").alias("max_event_time"),
        )
    )
