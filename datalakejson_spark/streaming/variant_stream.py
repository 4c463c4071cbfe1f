"""Streaming drain of a landing zone into the VARIANT curated lake.

The streaming twin of plans/variant_ingest.py: a text file-source (no
schema, no inference — the variant IS the schema escape hatch) drained with
``Trigger.AvailableNow``, each micro-batch running the same
parse→split→DLQ→partitioned-append composition as the batch path. The
checkpoint's file index provides the per-file exactly-once claim, exactly
as streaming/ingest_stream.py does for the typed pipeline
(sudo_code.txt:107,136-139's cron+ledger loop).

Why this mode matters at 100 TB: the typed streaming pipeline requires a
frozen StructType up front — a landing zone whose producers evolve freely
would either drop new fields or fail the stream. The variant drain never
re-reads, never re-infers, and never loses a field; schema drift surfaces
later as a query (plans/variant_ingest.drift_report) instead of an incident.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.plans.variant_ingest import (
    RUN_COL,
    split_corrupt,
    variant_projection,
    with_partition_column,
)
from datalakejson_spark.session import configure_runtime


def streaming_variant_ingest(
    spark: SparkSession,
    landing_dir: str,
    curated_dir: str,
    dlq_dir: str,
    checkpoint_dir: str,
    column: str = "record",
    partition_path: str | None = "$.MODE",
    partition_col: str = "mode",
    partition_default: str = "unknown",
    max_files_per_trigger: int | None = None,
    after_append_hook=None,
):
    """Drain all available landing files once into variant parquet.

    Returns the StreamingQuery; call ``.awaitTermination()``.

    ``after_append_hook(batch_id)``: fault-injection point for tests —
    invoked after the micro-batch's parquet/DLQ appends succeed but BEFORE
    the checkpoint commits the batch. Raising here simulates the T2 crash
    window: the data is on disk, the claim is not, and a restart must
    replay the batch under a newer run stamp (resolved exactly-once by
    plans/variant_ingest.resolve_replays).
    """
    configure_runtime(spark)
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # THE parse/split/partition logic is the batch module's, verbatim — only
    # the source (readStream), the per-attempt stamp, and the per-batch DLQ
    # directory are streaming-specific.
    stream = variant_projection(reader.text(landing_dir), column)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        import time

        # per-ATTEMPT stamp (same scheme as streaming/ingest_stream.py): a
        # crash between the parquet append and the checkpoint commit replays
        # this batch_id with a strictly larger stamp, so
        # variant_ingest.resolve_replays can keep only the newest attempt
        # per source file (T2 parity for the variant drain).
        run_id = f"stream-{time.time_ns():020d}-b{batch_id}"
        batch_df = batch_df.persist()
        try:
            good, corrupt = split_corrupt(batch_df, column)
            good = good.withColumn(RUN_COL, F.lit(run_id))
            if corrupt.limit(1).count():
                corrupt.withColumn("batch_id", F.lit(batch_id)).write.mode(
                    "append"
                ).json(os.path.join(dlq_dir, f"batch-{batch_id}"))
            if good.limit(1).count():
                if partition_path is not None:
                    good = with_partition_column(
                        good, column, partition_path, partition_col,
                        partition_default,
                    )
                    good.write.mode("append").partitionBy(partition_col).parquet(
                        curated_dir
                    )
                else:
                    good.write.mode("append").parquet(curated_dir)
            if after_append_hook is not None:
                after_append_hook(batch_id)
        finally:
            batch_df.unpersist()

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
