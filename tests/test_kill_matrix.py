"""Kill-point matrix (VERDICT r6 #6): emulated hard process death at every
named seam of the ingest and incremental-dedup pipelines, then the standard
recovery step, asserting the exactly-once / idempotency contract at each.

``InjectedKill`` is a BaseException, so it sails through the batch's
``except Exception`` crash handler exactly like SIGKILL/OOM — the recovery
run sees only the on-disk state a dead process leaves behind (ledger rows
still PROCESSING, half-staged index pairs, un-archived landing copies),
which is the strictest version of each durability claim.

Reference contract sources: sudo_code.txt:189-224 (crash recovery),
psuedo_code.txt:252-259 (batch failure path); plus the repo's own staged
index commit and fenced-commit-then-archive ordering.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyspark.sql.functions as F
import pytest

from datalakejson_spark.plans import killpoints
from datalakejson_spark.plans.ingest import (
    IngestConfig,
    deduplicate_replays,
    discover,
    ingest_batch,
    read_curated,
)
from datalakejson_spark.plans.killpoints import InjectedKill
from datalakejson_spark.plans.ledger import Ledger, LedgerStatus
from tests.conftest import good_record, write_ndjson

# Multi-minute soak/race/kill/lifecycle suite: excluded from the default
# pytest run (pyproject addopts -m 'not soak') so the driver's verify
# window holds; run per round with `python -m pytest tests/ -m soak`.
pytestmark = pytest.mark.soak


@pytest.fixture(autouse=True)
def _clean_hooks():
    killpoints.disarm()
    yield
    killpoints.disarm()


@pytest.fixture()
def conf(tmp_path: Path, landing: Path) -> IngestConfig:
    # stale_lease_s=0: the recovery run reclaims the dead run's PROCESSING
    # rows immediately instead of waiting out the production lease
    return IngestConfig(
        landing_dir=str(landing),
        curated_dir=str(tmp_path / "curated"),
        dlq_dir=str(tmp_path / "dlq"),
        archive_dir=str(tmp_path / "archive"),
        ledger_dir=str(tmp_path / "ledger"),
        batch_size=100,
        stale_lease_s=0,
    )


# point → (rows visible in curated after recovery, DLQ corrupt rows total).
# curated=40 marks the replay cases (rows appended twice, resolved by
# deduplicate_replays); DLQ=4 marks at-least-once DLQ delivery (the DLQ is
# run-bucketed appends — duplicates across run dirs are the documented
# contract, resolved by bucket choice downstream).
INGEST_MATRIX = {
    "ingest:after_claim": (20, 2),
    "ingest:after_dlq_write": (20, 4),
    "ingest:after_curated_append": (40, 4),
    "ingest:after_commit_pre_archive": (20, 2),
    "ingest:mid_archive_move": (20, 2),
}


@pytest.mark.parametrize("point", list(INGEST_MATRIX))
def test_ingest_kill_matrix(spark, conf, point):
    expect_curated_raw, expect_dlq = INGEST_MATRIX[point]
    discover(spark, conf)
    killpoints.kill_once(point)
    with pytest.raises(InjectedKill):
        ingest_batch(spark, conf)

    # Standard recovery: the next scheduled cycle = discover (completes any
    # interrupted archive moves, registers nothing new) + ingest_batch
    # (reclaims whatever is still claimable; no-op for committed batches).
    assert discover(spark, conf) == 0
    ingest_batch(spark, conf)

    # Exactly-once curated rows (after replay resolution where applicable).
    curated = read_curated(spark, conf.curated_dir)
    assert curated.count() == expect_curated_raw
    deduped = deduplicate_replays(curated)
    assert deduped.count() == 20
    assert deduped.select("record_id").distinct().count() == 20

    # Terminal ledger state identical to the no-crash run.
    counts = Ledger(spark, conf.ledger_dir).counts()
    assert counts == {LedgerStatus.SUCCEEDED: 3, LedgerStatus.QUARANTINED: 1}

    # Archive reconciliation: good files moved exactly once, landing keeps
    # only the quarantined file. (mid_archive_move leaves one copied-but-
    # undeleted landing file for the sweep; a second discover is the
    # reconciliation point for archives deferred by the SECOND run too.)
    discover(spark, conf)
    landing_left = {p.name for p in Path(conf.landing_dir).rglob("*.json")}
    assert landing_left == {"corrupt_mixed.json"}
    archived = {p.name for p in Path(conf.archive_dir).rglob("*.json")}
    assert archived == {"good_a.json", "good_b.json", "late_week1.json"}

    # DLQ at-least-once: every corrupt row captured; replays add a second
    # run bucket, never lose one.
    dlq = spark.read.json(conf.dlq_dir + "/*")
    assert dlq.count() == expect_dlq

    # Final idempotency: one more full cycle changes nothing.
    assert discover(spark, conf) == 0
    assert ingest_batch(spark, conf).claimed == 0
    assert read_curated(spark, conf.curated_dir).count() == expect_curated_raw


@pytest.mark.parametrize(
    "point", ["ingest:after_claim", "ingest:after_curated_append"]
)
def test_ingest_kill_matrix_jdbc_ledger(spark, tmp_path, landing, point):
    """The JDBC ledger claims drop-in parity with the parquet ledger, so
    the crash contract must hold through it too: hard death at the two
    highest-traffic points, then the standard recovery, exactly-once."""
    from datalakejson_spark.plans.jdbc_ledger import JdbcLedger

    conf = IngestConfig(
        landing_dir=str(landing),
        curated_dir=str(tmp_path / "curated"),
        dlq_dir=str(tmp_path / "dlq"),
        archive_dir=str(tmp_path / "archive"),
        ledger_dir=str(tmp_path / "ledger"),
        jdbc_url=f"jdbc:derby:{tmp_path}/killdb;create=true",
        batch_size=100,
        stale_lease_s=0,
    )
    discover(spark, conf)
    killpoints.kill_once(point)
    with pytest.raises(InjectedKill):
        ingest_batch(spark, conf)
    assert discover(spark, conf) == 0
    ingest_batch(spark, conf)
    deduped = deduplicate_replays(read_curated(spark, conf.curated_dir))
    assert deduped.count() == 20
    assert deduped.select("record_id").distinct().count() == 20
    counts = JdbcLedger(spark, conf.jdbc_url).counts()
    assert counts == {LedgerStatus.SUCCEEDED: 3, LedgerStatus.QUARANTINED: 1}
    discover(spark, conf)
    landing_left = {p.name for p in Path(conf.landing_dir).rglob("*.json")}
    assert landing_left == {"corrupt_mixed.json"}


# ---------------------------------------------------------------------------
# Incremental-dedup staged index commit (functions/incremental_dedup.py)
# ---------------------------------------------------------------------------
def _docs(spark):
    rows = [
        (i, " ".join(f"w{i}t{j} tok{i}x{j} filler{i}" for j in range(6)))
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


DEDUP_MATRIX = {
    # markerless stage: recovery must NOT publish it (half pair / no marker),
    # re-audits against unchanged indexes → same survivors → duplicate
    # delivery (the documented at-least-once delivery, resolved by replay
    # stamps downstream), index rows land exactly once via the fresh stage
    "dedup:after_hash_stage": True,
    "dedup:before_commit_marker": True,
    # committed-but-unpublished: recovery rolls the stage FORWARD first, so
    # the replayed batch audits as all-duplicate → NO duplicate delivery
    "dedup:after_commit_marker": False,
}


@pytest.mark.parametrize("point", list(DEDUP_MATRIX))
def test_dedup_kill_matrix(spark, tmp_path, point):
    from datalakejson_spark.functions.incremental_dedup import ingest_batch_dedup

    redelivers = DEDUP_MATRIX[point]
    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    deliveries: list[set[int]] = []

    def on_kept(kept):
        deliveries.append({r.doc_id for r in kept.select("doc_id").collect()})

    batch1 = docs.filter("doc_id < 10")
    batch2 = docs.filter("doc_id >= 10")
    batch2_ids = set(range(10, 20))

    ingest_batch_dedup(spark, batch1, idx, on_kept=on_kept)
    assert deliveries == [set(range(10))]

    killpoints.kill_once(point)
    with pytest.raises(InjectedKill):
        ingest_batch_dedup(spark, batch2, idx, on_kept=on_kept)
    # the dying attempt delivered batch2 (delivery precedes index staging —
    # the reverse order would lose the batch permanently, see docstring)
    assert deliveries[-1] == batch2_ids

    # recovery: replay the same batch through the normal path
    kept = ingest_batch_dedup(spark, batch2, idx, on_kept=on_kept)
    if redelivers:
        assert {r.doc_id for r in kept.select("doc_id").collect()} == batch2_ids
        assert deliveries == [set(range(10)), batch2_ids, batch2_ids]
    else:
        assert kept.count() == 0
        assert deliveries == [set(range(10)), batch2_ids, set()]

    # Index-pair consistency: hashes and bands agree, every doc exactly once
    # — the crashed stage can never half-publish or double-publish. The hash
    # index is one distinct md5 row per unique text (20 distinct docs).
    hashes = spark.read.parquet(f"{idx}/hashes")
    assert hashes.count() == 20
    assert hashes.select("text_hash").distinct().count() == 20
    bands = spark.read.parquet(f"{idx}/bands")
    per_doc = bands.groupBy("doc_id").count().select("count").distinct().collect()
    assert len(per_doc) == 1  # uniform band count per doc → no double-append
    assert bands.select("doc_id").distinct().count() == 20

    # the whole corpus now audits as duplicate — the index is complete
    assert ingest_batch_dedup(spark, docs, idx).count() == 0


# ---------------------------------------------------------------------------
# WebDataset export: task death mid-shard leaves a torn tar; re-run must
# restore the complete, bit-reproducible shard set.
# ---------------------------------------------------------------------------
def test_webdataset_rerun_after_torn_shard(spark, tmp_path):
    import hashlib

    from datalakejson_spark.consumption.webdataset import (
        read_webdataset_samples,
        write_webdataset_shards,
    )

    corpus = spark.createDataFrame(
        [(f"k{i:03d}", f"payload {i}") for i in range(30)],
        "key string, text string",
    )
    clean = str(tmp_path / "clean")
    write_webdataset_shards(corpus, clean, "key", n_shards=4)
    clean_hashes = {
        p.name: hashlib.sha256(p.read_bytes()).hexdigest()
        for p in Path(clean).glob("shard-*.tar")
    }

    out = str(tmp_path / "wds")
    write_webdataset_shards(corpus, out, "key", n_shards=4)
    victim = Path(out) / "shard-000002.tar"
    blob = victim.read_bytes()
    victim.write_bytes(blob[: len(blob) // 2])  # task died mid-write

    # recovery = re-run the export: shard writes are deterministic
    # overwrites, so the torn tar is replaced wholesale
    write_webdataset_shards(corpus, out, "key", n_shards=4)
    got_hashes = {
        p.name: hashlib.sha256(p.read_bytes()).hexdigest()
        for p in Path(out).glob("shard-*.tar")
    }
    assert got_hashes == clean_hashes  # bit-identical to a clean export
    keys = {
        k for p in sorted(Path(out).glob("shard-*.tar"))
        for k, _ in read_webdataset_samples(str(p))
    }
    assert keys == {f"k{i:03d}" for i in range(30)}
