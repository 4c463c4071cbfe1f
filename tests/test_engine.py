"""Facade + CSV-landing tests: the full user workflow through DataLakeEngine,
and the ingest plane running on a CSV landing zone."""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import types as T

from datalakejson_spark.engine import DataLakeEngine
from datalakejson_spark.plans.ingest import IngestConfig, discover, ingest_batch, read_curated


def test_engine_full_workflow(spark, ingest_conf):
    engine = DataLakeEngine(spark, ingest_conf, table="t_engine")
    assert engine.discover() == 4
    results = engine.ingest_until_drained()
    assert sum(len(r.succeeded_files) for r in results) == 3

    curated = engine.curated(resolve_replays=True)
    assert curated.count() == 20

    fq = engine.register_catalog()
    out = engine.sql(
        f"SELECT mode, count(*) AS n FROM {fq} GROUP BY mode ORDER BY mode"
    ).collect()
    assert {r["mode"] for r in out} == {"train", "eval"}

    dlq = engine.dlq_summary()
    assert dlq.count() == 1  # the corrupt_mixed.json file

    counts = engine.ledger().counts()
    assert counts["SUCCEEDED"] == 3 and counts["QUARANTINED"] == 1

    # short name resolves in any query shape (no string rewriting)
    n = engine.sql("SELECT count(*) AS n FROM t_engine").first().n
    assert n == 20

    # later ingest → catalog refresh: new partitions must be visible
    from tests.conftest import good_record, write_ndjson

    write_ndjson(
        Path(ingest_conf.landing_dir) / "2024" / "week10" / "late_drop.json",
        [good_record(700, ts="2024-03-05T00:00:00Z")],
    )
    engine.discover()
    engine.ingest_until_drained()
    fresh = engine.sql(
        "SELECT count(*) AS n FROM t_engine WHERE year = 2024 AND month = 3"
    ).first().n
    assert fresh == 1


def test_csv_landing_ingest(spark, tmp_path: Path):
    landing = tmp_path / "csv_landing"
    (landing / "2024" / "week01").mkdir(parents=True)
    f = landing / "2024" / "week01" / "drop1.csv"
    f.write_text(
        "id,event_timestamp,MODE,extra_key\n"
        "a1,2024-01-10T00:00:00Z,train,k1\n"
        "a2,2024-01-10T01:00:00Z,eval,k2\n"
        "a3,not-a-timestamp-but-string-ok,train,k3\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("event_timestamp", T.StringType()),
            T.StructField("MODE", T.StringType()),
            T.StructField("extra_key", T.StringType()),
        ]
    )
    conf = IngestConfig(
        landing_dir=str(landing),
        curated_dir=str(tmp_path / "cc"),
        dlq_dir=str(tmp_path / "cd"),
        archive_dir=str(tmp_path / "ca"),
        ledger_dir=str(tmp_path / "cl"),
        schema=schema,
        landing_format="csv",
    )
    assert discover(spark, conf) == 1
    res = ingest_batch(spark, conf)
    assert res.good_rows == 3
    curated = read_curated(spark, conf.curated_dir)
    assert curated.count() == 3
    # the unparseable timestamp string casts to NULL event time → mode
    # partitioning still applies; row lands in the null-year partition
    assert curated.filter(F.col("record_id") == "a3").first().year is None
    assert curated.filter(F.col("extra_key") == "k1").first().mode == "train"


def test_engine_training_lifecycle(spark, ingest_conf, tmp_path: Path):
    """The training-data half of the facade: curated text → corpus prep →
    split assignment → shard export → Arrow feed, end-to-end from one
    engine object (the 'user of the reference could switch' workflow)."""
    engine = DataLakeEngine(spark, ingest_conf, table="t_lifecycle")
    engine.discover()
    engine.ingest_until_drained()

    # maintenance passes run and report per-partition outcomes
    compacted = engine.compact()
    assert isinstance(compacted, dict) and compacted
    vacuumed = engine.vacuum_replays()
    assert isinstance(vacuumed, dict)

    # corpus prep over a curated column (record ids as stand-in text)
    corpus = engine.prepare_training_corpus(
        text_col="record_id", min_chars=1, min_tokens=1, word_len_range=(0.0, 99.0)
    )
    assert {"doc_id", "shard_id"} <= set(corpus.columns)
    n_docs = corpus.count()
    assert n_docs > 0

    split = engine.assign_split(corpus)
    assert split.filter(F.col("split").isNull()).count() == 0

    # the l22 verdict over arbitrary docs through the facade
    gated = engine.quality_gate(
        spark.createDataFrame(
            [(1, "short", 5)], "doc_id long, text string, n_chars int"
        )
    ).collect()
    assert len(gated) == 1 and not gated[0].keep and gated[0].reasons > 0

    shard_dir = str(tmp_path / "shards")
    engine.export_shards(corpus, shard_dir)
    feed = engine.feed(shard_dir, batch_rows=7)
    fed = sum(b.num_rows for b in feed.batches())
    assert fed == n_docs


def test_engine_dedup_index_maintenance(spark, ingest_conf, tmp_path: Path):
    """Facade passthroughs for the incremental-dedup index maintenance ops:
    compact_dedup_index and (round 11) rebuild_dedup_index — the operator
    answer when the lane-definition guard refuses an index."""
    import hashlib
    import json
    import os

    from datalakejson_spark.functions.incremental_dedup import (
        _LANES_META,
        _current_lane_meta,
        ingest_batch_dedup,
    )

    engine = DataLakeEngine(spark, ingest_conf, table="t_dedupidx")
    idx = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [
            (i, " ".join("w" + hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8]
                          for j in range(12)))
            for i in range(8)
        ],
        "doc_id bigint, text string",
    )
    ingest_batch_dedup(spark, docs, idx)
    counts = engine.compact_dedup_index(idx)
    assert set(counts) == {"hashes", "bands"}

    # Drift the marker; the facade rebuild restores an auditable index.
    with open(os.path.join(idx, _LANES_META), "w") as fh:
        json.dump(dict(_current_lane_meta(), lane_hex=4), fh)
    written = engine.rebuild_dedup_index(docs, idx)
    assert written["hashes"] == 8 and written["bands"] == 32
    with open(os.path.join(idx, _LANES_META)) as fh:
        assert json.load(fh) == _current_lane_meta()
    replay = ingest_batch_dedup(spark, docs.limit(2), idx)
    assert replay.count() == 0  # the rebuilt index still knows the corpus
