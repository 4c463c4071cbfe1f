"""Streaming quality-gated corpus ingest: the continuously-running form of
the l22 keep/drop decision (functions/curation.py::quality_gate).

Reference parity: the ML consumption plane feeds model training from the
curated lake (diagram3:135-143); a continuously-arriving corpus needs the
quality verdict applied per micro-batch so bad documents never enter the
training set, while the rejects stay auditable WITH their reason-code
bitmask (the "why was this dropped" question compliance asks later).

Exactly-once posture — deliberately different from dedup_stream's
index-audit design, because the gate needs NO cross-batch state (the
verdict is a pure function of each document): every sink append is
partitioned by the micro-batch id and written with DYNAMIC partition
overwrite, so a crash-replayed batch overwrites its own partition with
byte-identical rows instead of duplicating them. No resolve-replays read
path needed; readers just scan the directory.

Per micro-batch cost: one l21-shaped signals pass over the BATCH only
(explained-linear shuffles keyed by doc id) plus a row-local verdict —
independent of how large the curated corpus has grown. At 100 TB of
accumulated corpus the stream's cost is still O(arrivals).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datalakejson_spark.functions.curation import quality_gate
from datalakejson_spark.session import configure_runtime


def streaming_quality_gated_ingest(
    spark: SparkSession,
    landing_dir: str,
    kept_dir: str,
    dropped_dir: str,
    checkpoint_dir: str,
    schema: T.StructType | str,
    newlines: bool = False,
    max_files_per_trigger: int | None = None,
):
    """Drain landing JSON-lines documents once (AvailableNow); each
    micro-batch runs :func:`quality_gate` and routes kept documents to
    ``kept_dir`` and rejected ones — carrying their ``reasons`` bitmask —
    to ``dropped_dir``. Both sinks partition by ``_batch_id`` and use
    dynamic partition overwrite, so foreachBatch replays are idempotent
    (the verdict is deterministic, so the replayed partition is
    byte-identical).

    A missing ``n_chars`` column is derived from the text (the gate's
    too-short rule needs it; landing corpora often carry only the text).

    Returns the StreamingQuery; call ``.awaitTermination()``.
    """
    configure_runtime(spark)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(landing_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df
        if "n_chars" not in docs.columns:
            docs = docs.withColumn("n_chars", F.length("text"))
        # Row identity is a SURROGATE key, frozen by localCheckpoint (the
        # sampled-exchange rule: monotonically_increasing_id re-evaluated
        # across plan branches may disagree). Gating and joining on the
        # surrogate instead of doc_id means (a) a NULL doc_id — e.g. a
        # corrupt landing line parsed all-null — still reaches a sink
        # instead of being silently dropped by null-key joins, and (b)
        # duplicate doc_ids within one micro-batch get INDEPENDENT
        # verdicts instead of merged repetition signals and multiplied
        # join rows. doc_id passes through untouched for downstream use.
        keyed = docs.withColumn(
            "_rid", F.monotonically_increasing_id()
        ).localCheckpoint()
        tagged = (
            keyed.join(quality_gate(keyed, id_col="_rid", newlines=newlines), "_rid")
            .withColumn("_batch_id", F.lit(batch_id))
            .drop("_rid")
            .persist()  # both sink writes read ONE gate evaluation
        )
        # Idempotent-replay contract: the per-WRITE dynamic option makes
        # overwrite replace ONLY the partitions present in the frame (this
        # micro-batch's _batch_id), never the sink root — and, unlike the
        # session conf, cannot leak static→dynamic semantics into other
        # partitioned overwrite writers on the shared session.
        # try/finally: a failed sink write must still release the cached
        # blocks, or foreachBatch retries leak a cache per attempt on a
        # long-lived session.
        try:
            (
                tagged.filter(F.col("keep"))
                .drop("keep", "reasons", "n_reasons")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(kept_dir)
            )
            (
                tagged.filter(~F.col("keep"))
                .drop("keep")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(dropped_dir)
            )
        finally:
            tagged.unpersist()

    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
