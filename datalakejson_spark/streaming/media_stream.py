"""Incremental multimodal feature ingestion (T-family × L5 composition).

The batch multimodal plane (functions/multimodal.py) decodes and
feature-extracts binary media; this module runs the SAME extractors over a
STREAMING binaryFile source, so a landing zone of media files drains
incrementally with the ingest plane's guarantees: each file enters exactly
one micro-batch (checkpointed file-source offsets), features append
idempotently per batch, and undecodable payloads surface as
``decoded_ok=false`` rows instead of failing the stream.

Spark-first: ``readStream.format("binaryFile")`` is the streaming twin of
the batch asset scan — same (path, content) rows, same downstream
``mapInPandas`` extractors, so there is exactly ONE decode codepath to
test. Feature rows are narrow (no payload column) — the blob never makes
it past the extractor's task, which is what keeps the parquet feature sink
tiny relative to the media it describes.

At 100 TB of media the unit of work stays the file: ``maxFilesPerTrigger``
bounds batch memory exactly like the ingest plane's BATCH_SIZE_FILES
(sudo_code.txt:128), and each batch's feature append is partitioned by the
batch id for idempotent replay auditing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.functions.multimodal import extract_features


def streaming_media_features(
    spark: SparkSession,
    landing_dir: str,
    features_dir: str,
    checkpoint_dir: str,
    glob: str = "*",
    max_files_per_trigger: int | None = None,
):
    """Drain a media landing zone once (AvailableNow) into a parquet
    feature table. Returns the StreamingQuery; call ``.awaitTermination()``.
    """
    # streaming sources require an explicit schema; binaryFile's is fixed
    reader = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    assets = reader.load(landing_dir).select(
        F.col("path").alias("asset_id"),
        F.element_at(F.split("path", r"\."), -1).alias("media_type"),
        F.col("content").alias("payload"),
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            extract_features(batch_df)
            .withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(features_dir)
        )

    return (
        assets.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
