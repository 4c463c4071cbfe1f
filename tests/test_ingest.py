"""Ingest-plane e2e tests (SURVEY.md §5.2 step 2): discover → ingest → verify
curated layout, DLQ, ledger states, archive moves, rerun idempotency,
schema evolution (E1-E5, S4, S6-S7, S10-S11, U1)."""

from __future__ import annotations

import os
from pathlib import Path

import pyspark.sql.functions as F
import pytest

from datalakejson_spark.plans.ingest import (
    IngestConfig,
    apply_transformations,
    discover,
    ingest_batch,
    read_curated,
    run_until_drained,
)
from datalakejson_spark.plans.ledger import Ledger, LedgerStatus
from tests.conftest import good_record, write_ndjson


def test_discover_registers_pending_idempotently(spark, ingest_conf):
    n1 = discover(spark, ingest_conf)
    assert n1 == 4  # good_a, good_b, corrupt_mixed, late_week1
    ledger = Ledger(spark, ingest_conf.ledger_dir)
    assert ledger.counts() == {LedgerStatus.PENDING: 4}
    # idempotent re-run: ON CONFLICT DO NOTHING (sudo_code.txt:90)
    assert discover(spark, ingest_conf) == 0
    assert ledger.counts() == {LedgerStatus.PENDING: 4}


def test_ingest_end_to_end(spark, ingest_conf):
    discover(spark, ingest_conf)
    res = ingest_batch(spark, ingest_conf)

    assert res.claimed == 4
    assert res.good_rows == 20  # 10 + 5 + 2 (from mixed) + 3 late
    assert res.corrupt_rows == 2
    assert len(res.succeeded_files) == 3
    assert len(res.quarantined_files) == 1
    assert res.lost_files == []

    # curated lake: hive partition layout year=/month=/day=/mode=
    # (sudo_code.txt:180), partition values from EVENT time
    curated_root = Path(ingest_conf.curated_dir)
    parts = {
        str(p.relative_to(curated_root))
        for p in curated_root.glob("year=*/month=*/day=*/mode=*")
    }
    assert "year=2024/month=1/day=31/mode=train" in parts
    assert "year=2024/month=2/day=1/mode=eval" in parts
    # late file landed in its (old) event-time partition (SURVEY §2.10)
    assert "year=2024/month=1/day=5/mode=train" in parts

    curated = read_curated(spark, ingest_conf.curated_dir)
    assert curated.count() == 20
    for col in (
        "record_id",
        "event_time_utc",
        "ml_mode",
        "app_version",
        "user_agent",
        "transaction_id",
        "transaction_items",
        "extra_key",  # star passthrough (psuedo_code.txt:287)
        "source_s3_path",
    ):
        assert col in curated.columns, col
    # nested array<struct> preserved (psuedo_code.txt:284)
    assert curated.select(F.col("transaction_items")[0]["qty"]).first()[0] is not None

    # DLQ: 2 corrupt rows under the run id (sudo_code.txt:169)
    dlq = spark.read.json(os.path.join(ingest_conf.dlq_dir, res.run_id))
    assert dlq.count() == 2
    assert {r[0] for r in dlq.select("source_s3_path").collect()} != set()

    # archive: good files moved, substructure preserved, originals gone
    # (sudo_code.txt:196-215); quarantined file stays in landing
    assert (Path(ingest_conf.archive_dir) / "all_historical_files" / "good_a.json").exists()
    assert not (Path(ingest_conf.landing_dir) / "all_historical_files" / "good_a.json").exists()
    assert (Path(ingest_conf.landing_dir) / "2024" / "week05" / "corrupt_mixed.json").exists()

    # ledger states (sudo_code.txt:35 enum)
    counts = Ledger(spark, ingest_conf.ledger_dir).counts()
    assert counts == {LedgerStatus.SUCCEEDED: 3, LedgerStatus.QUARANTINED: 1}

    # retry_count incremented once by the claim (sudo_code.txt:141)
    rc = Ledger(spark, ingest_conf.ledger_dir).read().select("retry_count").distinct().collect()
    assert {r[0] for r in rc} == {1}


def test_rerun_is_noop(spark, ingest_conf):
    discover(spark, ingest_conf)
    ingest_batch(spark, ingest_conf)
    before = read_curated(spark, ingest_conf.curated_dir).count()
    res2 = ingest_batch(spark, ingest_conf)
    # QUARANTINED/SUCCEEDED are terminal → nothing claimable
    assert res2.claimed == 0
    assert read_curated(spark, ingest_conf.curated_dir).count() == before


def test_failed_files_are_reclaimed_with_retry(spark, ingest_conf, tmp_path):
    discover(spark, ingest_conf)
    ingest_batch(spark, ingest_conf)
    ledger = Ledger(spark, ingest_conf.ledger_dir)
    # simulate a transient failure: flip one terminal file back to FAILED
    victim = ledger.read().filter(F.col("status") == LedgerStatus.SUCCEEDED).first().s3_key
    ledger.set_status([victim], LedgerStatus.FAILED, error_message="simulated")
    res = ingest_batch(spark, ingest_conf)
    assert res.claimed == 1
    # file was archived already → crash-recovery path marks it SUCCEEDED again
    assert res.succeeded_files == [victim]
    row = ledger.read().filter(F.col("s3_key") == victim).first()
    assert row.status == LedgerStatus.SUCCEEDED
    assert row.retry_count == 2  # claimed twice


def test_schema_evolution_union(spark, ingest_conf):
    """New top-level key in a later drop → union-of-schemas read with NULL
    backfill for old rows (diagram3:110, psuedo_code.txt:356-358)."""
    discover(spark, ingest_conf)
    ingest_batch(spark, ingest_conf)
    # second drop with a brand-new column
    write_ndjson(
        Path(ingest_conf.landing_dir) / "2024" / "week06" / "drift_newcol.json",
        [good_record(400 + i, ts="2024-02-08T09:00:00Z", brand_new_col="v") for i in range(4)],
    )
    discover(spark, ingest_conf)
    ingest_batch(spark, ingest_conf)

    curated = read_curated(spark, ingest_conf.curated_dir)
    assert curated.count() == 24
    assert "brand_new_col" in curated.columns
    nulls = curated.filter(F.col("brand_new_col").isNull()).count()
    assert nulls == 20  # old rows NULL-backfilled


def test_crash_recovery_marks_batch_failed(spark, ingest_conf, monkeypatch):
    """Any uncaught error mid-batch → whole batch FAILED for the next run
    (sudo_code.txt:189-194)."""
    discover(spark, ingest_conf)
    import datalakejson_spark.plans.ingest as ing

    def boom(*a, **k):
        raise RuntimeError("simulated write failure")

    monkeypatch.setattr(ing, "apply_transformations", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        ingest_batch(spark, ingest_conf)
    counts = Ledger(spark, ingest_conf.ledger_dir).counts()
    assert counts == {LedgerStatus.FAILED: 4}
    monkeypatch.undo()
    # next run re-claims and succeeds
    res = run_until_drained(spark, ingest_conf)
    assert sum(len(r.succeeded_files) for r in res) == 3


def test_replay_after_partial_crash_is_deduplicable(spark, ingest_conf, monkeypatch):
    """Crash AFTER the curated append but BEFORE archive/ledger commit →
    next run re-appends the same source rows under a new run id;
    deduplicate_replays() restores exactly-once semantics (T2)."""
    from datalakejson_spark.plans.ingest import deduplicate_replays

    discover(spark, ingest_conf)

    real_commit = Ledger.apply_outcomes
    calls = {"n": 0}

    def crash_on_first_commit(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash after curated append")
        return real_commit(self, *a, **k)

    monkeypatch.setattr(Ledger, "apply_outcomes", crash_on_first_commit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ingest_batch(spark, ingest_conf)
    monkeypatch.undo()

    # batch marked FAILED; re-run re-processes, duplicating the good rows
    res2 = ingest_batch(spark, ingest_conf)
    assert res2.claimed == 4
    curated = read_curated(spark, ingest_conf.curated_dir)
    assert curated.count() == 40  # 20 rows x 2 runs: replay happened
    deduped = deduplicate_replays(curated)
    assert deduped.count() == 20
    # every surviving row carries the latest run id per source file
    assert deduped.select("ingest_run_id").distinct().count() == 1


def test_transform_handles_missing_fields(spark):
    """Apply_Transformations on records missing optional nested fields —
    flattened columns become NULL, not errors."""
    df = spark.createDataFrame(
        [("1", "2024-01-01T00:00:00Z")], "id string, event_timestamp string"
    )
    out = apply_transformations(df)
    row = out.first()
    assert row.record_id == "1"
    assert row.app_version is None
    assert row.year == 2024 and row.mode == "unknown"


def test_stale_processing_reclaimed(spark, ingest_conf):
    """ADVICE r01: a hard crash (SIGKILL) between claim and commit must not
    strand files in PROCESSING forever — once the processing lease expires,
    they are claimable again."""
    discover(spark, ingest_conf)
    ledger = Ledger(spark, ingest_conf.ledger_dir)
    dead = ledger.claim_batch(10, "run-died-mid-batch")
    assert len(dead) == 4
    assert ledger.counts() == {LedgerStatus.PROCESSING: 4}
    # a live runner's fresh PROCESSING rows are NOT claimable (SKIP LOCKED)
    assert ledger.claim_batch(10, "run-b") == []
    # once the lease expires the orphans are reclaimed, retry incremented
    reclaimed = ledger.claim_batch(10, "run-b", stale_lease_s=0)
    assert sorted(reclaimed) == sorted(dead)
    rows = {r.s3_key: r for r in ledger.read().collect()}
    assert all(r.retry_count == 2 and r.run_id == "run-b" for r in rows.values())


@pytest.mark.soak
def test_concurrent_runners_no_double_processing(spark, tmp_path):
    """Two concurrent batch runners over one landing zone + ledger
    (psuedo_code.txt:170-181 FOR UPDATE SKIP LOCKED): every file is processed
    by exactly one runner, no file is double-claimed, all work drains."""
    import threading

    from tests.conftest import good_record, write_ndjson

    land = tmp_path / "landing"
    n_files = 12
    for i in range(n_files):
        write_ndjson(land / f"f{i:02d}.json", [good_record(1000 + i * 10 + j) for j in range(3)])
    conf = IngestConfig(
        landing_dir=str(land),
        curated_dir=str(tmp_path / "curated"),
        dlq_dir=str(tmp_path / "dlq"),
        archive_dir=str(tmp_path / "archive"),
        ledger_dir=str(tmp_path / "ledger"),
        batch_size=2,  # many small batches → real claim interleaving
    )
    discover(spark, conf)

    results: dict[str, list] = {"a": [], "b": []}
    errors: list[BaseException] = []

    def runner(name: str) -> None:
        try:
            results[name] = run_until_drained(spark, conf, max_runs=20)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    ta = threading.Thread(target=runner, args=("a",))
    tb = threading.Thread(target=runner, args=("b",))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errors, errors

    ok_a = {p for r in results["a"] for p in r.succeeded_files}
    ok_b = {p for r in results["b"] for p in r.succeeded_files}
    # no file succeeded under both runners, and together they drained all
    assert ok_a & ok_b == set()
    assert len(ok_a | ok_b) == n_files
    ledger = Ledger(spark, conf.ledger_dir)
    assert ledger.counts() == {LedgerStatus.SUCCEEDED: n_files}
    # curated rows: every source file ingested by exactly ONE run
    curated = read_curated(spark, conf.curated_dir)
    per_file = curated.groupBy("source_s3_path").agg(
        F.count_distinct("ingest_run_id").alias("n_runs"),
        F.count("*").alias("n_rows"),
    )
    assert per_file.filter((F.col("n_runs") != 1) | (F.col("n_rows") != 3)).count() == 0
    assert curated.count() == n_files * 3


# ---------------------------------------------------------------------------
# Ledger lock hardening + run-id commit fencing (ADVICE r02)
# ---------------------------------------------------------------------------
def test_stale_lock_broken_and_acquired(spark, tmp_path):
    """A lock whose heartbeat stopped LOCK_STALE_S ago is broken (via atomic
    rename, not blind unlink) and the waiter acquires."""
    import time as _time

    from datalakejson_spark.plans import ledger as L

    led = Ledger(spark, str(tmp_path / "ledger"))
    led._lockfile.write_text("pid=999999 token=deadbeef")
    old = _time.time() - (L.LOCK_STALE_S + 10)
    os.utime(led._lockfile, (old, old))
    with led._mutex(timeout_s=5.0):
        assert led._lockfile.exists()
        body = led._lockfile.read_text()
        assert "deadbeef" not in body  # our token, not the dead holder's
    assert not led._lockfile.exists()  # released our own lock


def test_fresh_foreign_lock_respected(spark, tmp_path):
    """A live (fresh-mtime) foreign lock is never broken: acquisition times
    out and the foreign lock survives byte-identical."""
    led = Ledger(spark, str(tmp_path / "ledger"))
    led._lockfile.write_text("pid=999999 token=livelock")
    with pytest.raises(TimeoutError):
        with led._mutex(timeout_s=0.3):
            pass
    assert led._lockfile.read_text() == "pid=999999 token=livelock"


def test_release_never_unlinks_foreign_lock(spark, tmp_path):
    """If our lock is stolen mid-section (simulated), the finally-release
    must NOT delete the new owner's lock (ADVICE r02: token-verified
    unlink)."""
    led = Ledger(spark, str(tmp_path / "ledger"))
    with led._mutex(timeout_s=5.0):
        led._lockfile.write_text("pid=424242 token=newowner")
    assert led._lockfile.read_text() == "pid=424242 token=newowner"
    led._lockfile.unlink()


def test_heartbeat_keeps_lock_fresh(spark, tmp_path, monkeypatch):
    """A slow critical section does not go stale: the heartbeat thread
    refreshes the lockfile mtime while held."""
    import time as _time

    from datalakejson_spark.plans import ledger as L

    monkeypatch.setattr(L, "LOCK_HEARTBEAT_S", 0.05)
    led = Ledger(spark, str(tmp_path / "ledger"))
    with led._mutex(timeout_s=5.0):
        old = _time.time() - 3600
        os.utime(led._lockfile, (old, old))
        _time.sleep(0.3)  # several heartbeat ticks
        assert _time.time() - led._lockfile.stat().st_mtime < 60
    assert not led._lockfile.exists()


def test_commit_fenced_on_run_id(spark, tmp_path):
    """A slow runner whose lease expired and whose files were reclaimed must
    not overwrite the new owner's ledger state at commit (ADVICE r02: the
    reference's DB transaction prevents this; we fence on run_id)."""
    led = Ledger(spark, str(tmp_path / "ledger"))
    files = [(f"/data/f{i}.json", 100) for i in range(3)]
    led.register(spark.createDataFrame(files, "s3_key string, file_size_bytes long"))

    claimed_a = led.claim_batch(10, "run-000a")
    assert len(claimed_a) == 3
    # lease expires; runner B reclaims everything
    claimed_b = led.claim_batch(10, "run-000b", stale_lease_s=0)
    assert sorted(claimed_b) == sorted(claimed_a)

    # slow runner A commits late: every transition is fenced out
    fenced = led.apply_outcomes(
        [(claimed_a, LedgerStatus.SUCCEEDED, None)], run_id="run-000a"
    )
    assert sorted(fenced) == sorted(claimed_a)
    rows = {r.s3_key: r for r in led.read().collect()}
    assert all(
        r.status == LedgerStatus.PROCESSING and r.run_id == "run-000b"
        for r in rows.values()
    )
    assert led.owned_by(claimed_a, "run-000a") == set()
    assert led.owned_by(claimed_a, "run-000b") == set(claimed_a)

    # B commits fine (fence matches), then a dying A's FAILED rollback is
    # also fenced and cannot clobber B's SUCCEEDED
    assert led.apply_outcomes(
        [(claimed_b, LedgerStatus.SUCCEEDED, None)], run_id="run-000b"
    ) == []
    fenced2 = led.set_status(
        claimed_a, LedgerStatus.FAILED, error_message="batch error: late crash",
        run_id="run-000a", fence_run_id="run-000a",
    )
    assert sorted(fenced2) == sorted(claimed_a)
    assert led.counts() == {LedgerStatus.SUCCEEDED: 3}


def test_ingest_batch_aborts_side_effects_on_lost_claim(spark, tmp_path, monkeypatch):
    """End-to-end fencing: a runner that loses its claims mid-batch (lease
    expiry + reclaim by another runner) archives nothing, commits nothing,
    and reports the files as lost_claims. The reclaimer's later run wins
    deduplicate_replays (newer run_id)."""
    import datalakejson_spark.plans.ingest as ingest_mod

    land = tmp_path / "landing"
    for i in range(2):
        write_ndjson(land / f"f{i}.json", [good_record(200 + i)])
    conf = IngestConfig(
        landing_dir=str(land),
        curated_dir=str(tmp_path / "curated"),
        dlq_dir=str(tmp_path / "dlq"),
        archive_dir=str(tmp_path / "archive"),
        ledger_dir=str(tmp_path / "ledger"),
    )
    discover(spark, conf)

    real_transform = ingest_mod.apply_transformations
    state = {"stolen": False}

    def steal_then_transform(df, mode_default="unknown"):
        if not state["stolen"]:
            state["stolen"] = True
            # simulate: this runner stalls past its lease; runner B reclaims
            Ledger(spark, conf.ledger_dir).claim_batch(
                10, "run-9999999999999999999-thief", stale_lease_s=0
            )
        return real_transform(df, mode_default)

    monkeypatch.setattr(ingest_mod, "apply_transformations", steal_then_transform)
    res = ingest_batch(spark, conf)
    assert res.claimed == 2
    assert sorted(res.lost_claims) == sorted(
        str(land / f"f{i}.json") for i in range(2)
    )
    assert res.succeeded_files == []
    # nothing archived: the reclaimer still needs the landing copies
    assert not (tmp_path / "archive").exists() or not any(
        (tmp_path / "archive").rglob("*.json")
    )
    # ledger untouched by the fenced commit: still the thief's PROCESSING
    rows = {r.s3_key: r for r in Ledger(spark, conf.ledger_dir).read().collect()}
    assert all(
        r.status == LedgerStatus.PROCESSING and r.run_id.endswith("thief")
        for r in rows.values()
    )


def test_vacuum_replays_removes_stale_rows_physically(spark, ingest_conf, monkeypatch):
    """vacuum_replays makes deduplicate_replays' read-time filter permanent:
    after a crash-replay, vacuuming leaves only the newest run's rows ON
    DISK, with query results identical."""
    from datalakejson_spark.plans.compact import vacuum_replays
    from datalakejson_spark.plans.ingest import deduplicate_replays

    discover(spark, ingest_conf)
    real_commit = Ledger.apply_outcomes
    calls = {"n": 0}

    def crash_on_first_commit(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash after curated append")
        return real_commit(self, *a, **k)

    monkeypatch.setattr(Ledger, "apply_outcomes", crash_on_first_commit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ingest_batch(spark, ingest_conf)
    monkeypatch.undo()
    ingest_batch(spark, ingest_conf)  # replay: rows duplicated under new run

    before = read_curated(spark, ingest_conf.curated_dir)
    assert before.count() == 40
    expected = {
        tuple(r) for r in deduplicate_replays(before).select("record_id").collect()
    }

    removed = vacuum_replays(spark, ingest_conf.curated_dir)
    assert sum(removed.values()) == 20
    after = read_curated(spark, ingest_conf.curated_dir)
    assert after.count() == 20  # stale rows gone from storage
    assert {tuple(r) for r in after.select("record_id").collect()} == expected
    assert after.select("ingest_run_id").distinct().count() == 1
    # idempotent: second vacuum is a no-op
    assert vacuum_replays(spark, ingest_conf.curated_dir) == {}


def test_discover_distributed_matches_driver(spark, tmp_path):
    """S4 at 100 TB: the RDD-of-prefixes fan-out listing produces the exact
    same (path, size) discovery set as the driver walk, over a deep tree
    wide enough to trigger the fan-out automatically."""
    from datalakejson_spark.plans.ingest import DISCOVERY_FANOUT_THRESHOLD

    root = tmp_path / "landing"
    expect = set()
    n_prefixes = DISCOVERY_FANOUT_THRESHOLD + 4
    for i in range(n_prefixes):
        for j in range(3):
            p = root / f"2024/week{i:02d}".replace("2024/", f"p{i:02d}/") / f"sub{j}" / f"f_{i}_{j}.json"
            write_ndjson(p, [good_record(i * 10 + j)])
            expect.add(str(p))
    # a root-level file and a non-matching suffix that must be ignored
    rf = root / "root_file.json"
    write_ndjson(rf, [good_record(999)])
    expect.add(str(rf))
    write_ndjson(root / "p00" / "notes.txt", ["not a landing file"])

    def conf_for(tag: str) -> IngestConfig:
        return IngestConfig(
            landing_dir=str(root),
            curated_dir=str(tmp_path / tag / "curated"),
            dlq_dir=str(tmp_path / tag / "dlq"),
            archive_dir=str(tmp_path / tag / "archive"),
            ledger_dir=str(tmp_path / tag / "ledger"),
        )

    conf_drv, conf_dist, conf_auto = conf_for("drv"), conf_for("dist"), conf_for("auto")
    assert discover(spark, conf_drv, distributed=False) == len(expect)
    assert discover(spark, conf_dist, distributed=True) == len(expect)
    # auto mode picks the fan-out above the threshold — same result again
    assert discover(spark, conf_auto) == len(expect)

    def keys(conf: IngestConfig) -> dict[str, int]:
        return {
            r.s3_key: r.file_size_bytes
            for r in Ledger(spark, conf.ledger_dir).read().collect()
        }

    k_drv, k_dist = keys(conf_drv), keys(conf_dist)
    assert set(k_drv) == expect
    assert k_drv == k_dist == keys(conf_auto)  # identical paths AND sizes


def test_archive_failure_after_commit_is_swept_by_discover(spark, ingest_conf, monkeypatch):
    """ADVICE r03 ordering: the fenced commit decides archive ownership, so a
    crash between commit and archive leaves SUCCEEDED files in landing;
    ingest does NOT re-FAIL them (no replay), and the next discover() run
    completes the interrupted moves."""
    import datalakejson_spark.plans.ingest as ing

    discover(spark, ingest_conf)

    def boom(paths, conf):
        raise OSError("simulated archive outage")

    monkeypatch.setattr(ing, "_archive_parallel", boom)
    res = ingest_batch(spark, ingest_conf)  # no exception: commit is durable
    assert len(res.succeeded_files) == 3
    assert sorted(res.archive_deferred) == sorted(res.succeeded_files)
    monkeypatch.undo()

    # committed as SUCCEEDED despite the archive failure...
    ledger = Ledger(spark, ingest_conf.ledger_dir)
    counts = ledger.counts()
    assert counts[LedgerStatus.SUCCEEDED] == 3
    # ...landing copies still present, archive empty
    assert all(os.path.exists(p) for p in res.succeeded_files)

    # discover() is the reconciliation point: 0 new files, moves finished
    assert discover(spark, ingest_conf) == 0
    assert all(not os.path.exists(p) for p in res.succeeded_files)
    archived = {p.name for p in Path(ingest_conf.archive_dir).rglob("*.json")}
    assert {"good_a.json", "good_b.json", "late_week1.json"} <= archived
    # SUCCEEDED files stay SUCCEEDED — the sweep is pure file movement
    assert ledger.counts()[LedgerStatus.SUCCEEDED] == 3
    # and a re-run claims nothing new (no replay happened)
    assert ingest_batch(spark, ingest_conf).claimed == 0


def _synth_files(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("s3://lake/f"), F.col("id")).alias("s3_key"),
        F.lit(100).cast("long").alias("file_size_bytes"),
    )


def test_split_snapshot_segments_append_only(spark, tmp_path):
    """The status-partitioned snapshot (round 8): completed rows land in
    append-only terminal segments that later batches never rewrite; claims
    and commits rewrite only the active part; a terminal re-enqueue takes
    the full-compaction path and stays correct."""
    import json as J

    led = Ledger(spark, str(tmp_path / "led"))
    led.register(_synth_files(spark, 0, 20))

    c1 = led.claim_batch(10, "r1")
    led.apply_outcomes([(c1, LedgerStatus.SUCCEEDED, None)], run_id="r1")
    ptr1 = J.loads((tmp_path / "led" / "_LATEST").read_text())
    assert len(ptr1["terminal"]) == 1
    seg1 = tmp_path / "led" / ptr1["terminal"][0]
    sig1 = sorted((f.name, f.stat().st_mtime_ns) for f in seg1.rglob("*.parquet"))

    c2 = led.claim_batch(10, "r2")
    led.apply_outcomes([(c2, LedgerStatus.SUCCEEDED, None)], run_id="r2")
    ptr2 = J.loads((tmp_path / "led" / "_LATEST").read_text())
    # second commit APPENDED a segment; the first segment's files untouched
    assert ptr1["terminal"][0] in ptr2["terminal"] and len(ptr2["terminal"]) == 2
    assert sig1 == sorted(
        (f.name, f.stat().st_mtime_ns) for f in seg1.rglob("*.parquet")
    )
    assert led.counts() == {LedgerStatus.SUCCEEDED: 20}

    # claims read ONLY the active part: nothing claimable now
    assert led.claim_batch(10, "r3") == []

    # rare path: re-enqueue a completed file -> full compaction, one segment
    victim = sorted(c1)[0]
    led.set_status([victim], LedgerStatus.FAILED, error_message="requeue")
    ptr3 = J.loads((tmp_path / "led" / "_LATEST").read_text())
    assert len(ptr3["terminal"]) == 1
    rows = {r.s3_key: r.status for r in led.read().collect()}
    assert rows[victim] == LedgerStatus.FAILED
    assert sum(1 for s in rows.values() if s == LedgerStatus.SUCCEEDED) == 19
    assert led.claim_batch(10, "r4") == [victim]


def test_split_snapshot_segment_compaction_bound(spark, tmp_path, monkeypatch):
    """Segment count is bounded: pushing past MAX_TERMINAL_SEGMENTS folds
    all segments into one, with no row lost or duplicated."""
    import json as J

    from datalakejson_spark.plans import ledger as L

    monkeypatch.setattr(L, "MAX_TERMINAL_SEGMENTS", 3)
    led = Ledger(spark, str(tmp_path / "led"))
    led.register(_synth_files(spark, 0, 6))
    for i in range(6):
        c = led.claim_batch(1, f"r{i}")
        led.apply_outcomes([(c, LedgerStatus.SUCCEEDED, None)], run_id=f"r{i}")
    ptr = J.loads((tmp_path / "led" / "_LATEST").read_text())
    assert len(ptr["terminal"]) <= 3
    assert led.counts() == {LedgerStatus.SUCCEEDED: 6}
    assert led.read().select("s3_key").distinct().count() == 6


def test_legacy_single_snapshot_pointer_migrates(spark, tmp_path):
    """A pre-split ledger (bare version-name pointer, one dir holding every
    status) reads transparently and migrates to the split layout on its
    next write."""
    import json as J

    led = Ledger(spark, str(tmp_path / "led"))
    led.register(_synth_files(spark, 0, 8))
    c = led.claim_batch(4, "r1")
    led.apply_outcomes([(c, LedgerStatus.SUCCEEDED, None)], run_id="r1")

    # Rewrite the state as a LEGACY layout: one dir, bare pointer.
    full = led.read().persist()
    legacy_dir = tmp_path / "led" / "v1"
    full.write.mode("overwrite").parquet(str(legacy_dir))
    full.unpersist()
    ptr_file = tmp_path / "led" / "_LATEST"
    ptr_file.write_text("v1")

    led2 = Ledger(spark, str(tmp_path / "led"))
    assert led2.counts() == {
        LedgerStatus.SUCCEEDED: 4,
        LedgerStatus.PENDING: 4,
    }
    # next write migrates: terminal rows move out of the active dir
    c2 = led2.claim_batch(2, "r2")
    led2.apply_outcomes([(c2, LedgerStatus.SUCCEEDED, None)], run_id="r2")
    ptr = J.loads(ptr_file.read_text())
    assert ptr["terminal"]
    active_rows = spark.read.parquet(
        str(tmp_path / "led" / ptr["active"])
    ).collect()
    assert all(r.status != LedgerStatus.SUCCEEDED for r in active_rows)
    assert led2.counts() == {
        LedgerStatus.SUCCEEDED: 6,
        LedgerStatus.PENDING: 2,
    }


@pytest.mark.soak
def test_retired_segments_get_grace_window(spark, tmp_path, monkeypatch):
    """Segments dropped from the pointer by a fold are NOT deleted in that
    same publish (a lock-free reader holding the previous pointer still
    references them); they are retired first and deleted only after the
    same multi-publish grace the active versions get."""
    import json as J

    from datalakejson_spark.plans import ledger as L

    monkeypatch.setattr(L, "MAX_TERMINAL_SEGMENTS", 2)
    led = Ledger(spark, str(tmp_path / "led"))
    led.register(_synth_files(spark, 0, 8))
    seg_names = []
    for i in range(3):  # third commit folds (2+1 > 2)
        c = led.claim_batch(1, f"r{i}")
        led.apply_outcomes([(c, LedgerStatus.SUCCEEDED, None)], run_id=f"r{i}")
        ptr = J.loads((tmp_path / "led" / "_LATEST").read_text())
        seg_names.append(set(ptr["terminal"]))
    dropped = seg_names[1] - seg_names[2]
    assert dropped, "third commit must have folded the first two segments"
    # immediately after the fold every dropped dir still exists (grace)
    for name in dropped:
        assert (tmp_path / "led" / name).is_dir()
    # a reader that loaded the PRE-fold pointer can still read its dirs
    pre_fold = spark.read.parquet(
        *[str(tmp_path / "led" / n) for n in seg_names[1]]
    )
    assert pre_fold.count() == 2
    # after >= 3 further publishes the retired dirs are gone
    for i in range(3, 7):
        c = led.claim_batch(1, f"r{i}")
        led.apply_outcomes([(c, LedgerStatus.SUCCEEDED, None)], run_id=f"r{i}")
    assert not any((tmp_path / "led" / n).is_dir() for n in dropped)
    assert led.counts() == {
        LedgerStatus.SUCCEEDED: 7,
        LedgerStatus.PENDING: 1,
    }


def test_fenced_lost_claim_does_not_trigger_compaction(spark, tmp_path):
    """A slow runner committing a file that another runner reclaimed and
    completed must be fenced out WITHOUT a full-compaction rewrite: the
    routine lease-expiry race stays O(active), and the winner's terminal
    segment stays referenced untouched."""
    import json as J

    led = Ledger(spark, str(tmp_path / "led"))
    led.register(_synth_files(spark, 0, 4))
    slow = led.claim_batch(2, "slow", stale_lease_s=0.0)
    # lease 0: runner B immediately reclaims and completes the same files
    fast = led.claim_batch(2, "fast", stale_lease_s=0.0)
    assert set(fast) == set(slow)
    led.apply_outcomes([(fast, LedgerStatus.SUCCEEDED, None)], run_id="fast")
    ptr_before = J.loads((tmp_path / "led" / "_LATEST").read_text())
    # slow runner's commit: everything fenced out, winner's segment intact
    fenced = led.apply_outcomes(
        [(slow, LedgerStatus.SUCCEEDED, None)], run_id="slow"
    )
    assert set(fenced) == set(slow)
    ptr_after = J.loads((tmp_path / "led" / "_LATEST").read_text())
    assert set(ptr_before["terminal"]) <= set(ptr_after["terminal"]), (
        "full compaction replaced the winner's segment — the fenced "
        "lost-claim path must stay O(active)"
    )
    rows = {r.s3_key: r for r in led.read().collect()}
    assert all(rows[p].status == LedgerStatus.SUCCEEDED for p in fast)
    assert all(rows[p].run_id == "fast" for p in fast)
    # ADVICE r8: the fully-fenced-out commit (zero actual transitions) must
    # not have appended an EMPTY terminal segment.
    assert len(ptr_after["terminal"]) == len(ptr_before["terminal"])


def test_backfill_phase_defers_segment_split(spark, tmp_path):
    """Adaptive deferral (round 9): during an all-PENDING backfill, a batch
    whose completions are <= TERMINAL_SPLIT_MIN_FRAC of the active dir
    publishes ONE plain write — no terminal segment, no split machinery —
    and the terminal rows ride along in the active part. Once the fraction
    crosses the threshold, the next commit drains ALL accumulated terminal
    rows into a single appended segment."""
    import json as J

    led = Ledger(spark, str(tmp_path / "led"))
    led.register(_synth_files(spark, 0, 100))  # the 9 TB backfill in miniature

    c1 = led.claim_batch(3, "r1")  # 3/100 = 3% <= 5%: defer
    led.apply_outcomes([(c1, LedgerStatus.SUCCEEDED, None)], run_id="r1")
    ptr = J.loads((tmp_path / "led" / "_LATEST").read_text())
    assert ptr["terminal"] == []  # no segment yet — legacy-cost write
    assert led.counts()[LedgerStatus.SUCCEEDED] == 3
    # the deferred terminal rows live in the active dir...
    active = spark.read.parquet(str(tmp_path / "led" / ptr["active"]))
    assert active.filter(active.status == LedgerStatus.SUCCEEDED).count() == 3

    # ...and stay claimable-excluded; push the accumulated terminal fraction
    # past the threshold: the next commit drains EVERYTHING terminal (old
    # deferred + new) into a single segment
    c2 = led.claim_batch(97, "r2")
    assert len(c2) == 97 and not set(c1) & set(c2)
    led.apply_outcomes([(c2[:10], LedgerStatus.SUCCEEDED, None)], run_id="r2")
    ptr2 = J.loads((tmp_path / "led" / "_LATEST").read_text())
    assert len(ptr2["terminal"]) == 1
    seg = spark.read.parquet(str(tmp_path / "led" / ptr2["terminal"][0]))
    assert seg.count() == 13  # 3 deferred + 10 new, drained together
    active2 = spark.read.parquet(str(tmp_path / "led" / ptr2["active"]))
    assert active2.filter(
        active2.status == LedgerStatus.SUCCEEDED
    ).count() == 0
    assert led.counts()[LedgerStatus.SUCCEEDED] == 13


def test_segment_range_sidecars(spark, tmp_path, monkeypatch):
    """Per-segment key-range sidecars (round 9): every published segment
    carries _RANGE.json; folds combine ranges driver-side; the terminal
    probe and fenced-out read skip segments whose range excludes the batch,
    and a legacy segment WITHOUT a sidecar is conservatively included."""
    import json as J

    from datalakejson_spark.plans import ledger as L

    led = Ledger(spark, str(tmp_path / "led"))
    led.register(_synth_files(spark, 0, 40))
    # two disjoint-key segments: f0..f9 (lexical f0,f1,..) and f30..f39
    c1 = led.claim_batch(20, "r1")
    led.apply_outcomes([(c1, LedgerStatus.SUCCEEDED, None)], run_id="r1")
    c2 = led.claim_batch(20, "r2")
    led.apply_outcomes([(c2, LedgerStatus.SUCCEEDED, None)], run_id="r2")
    ptr = J.loads((tmp_path / "led" / "_LATEST").read_text())
    assert len(ptr["terminal"]) == 2
    for seg in ptr["terminal"]:
        r = led._seg_range(seg)
        assert r is not None and r[0] <= r[1]
        body = J.loads((tmp_path / "led" / seg / "_RANGE.json").read_text())
        assert set(body) == {"min", "max"}

    # pruning: keys wholly outside a segment's range exclude it
    seg_a, seg_b = ptr["terminal"]
    ra, rb = led._seg_range(seg_a), led._seg_range(seg_b)
    below_all = led._segs_for_keys([seg_a, seg_b], "a", "a")
    assert below_all == []
    only_a = led._segs_for_keys([seg_a, seg_b], ra[0], ra[0])
    assert seg_a in only_a
    if rb[0] > ra[1]:  # disjoint ranges: b must be pruned
        assert seg_b not in only_a
    # no keys -> nothing can hit
    assert led._segs_for_keys([seg_a, seg_b], None, None) == []
    # a legacy segment without a sidecar is conservatively included
    (tmp_path / "led" / seg_a / "_RANGE.json").unlink()
    assert seg_a in led._segs_for_keys([seg_a, seg_b], "zzz", "zzz")

    # folds write a combined sidecar (driver-side when inputs have ranges;
    # seg_a's deleted sidecar forces the data-scan fallback on this fold)
    monkeypatch.setattr(L, "MAX_TERMINAL_SEGMENTS", 1)
    led.register(_synth_files(spark, 40, 44))
    c3 = led.claim_batch(4, "r3")
    led.apply_outcomes([(c3, LedgerStatus.SUCCEEDED, None)], run_id="r3")
    ptr2 = J.loads((tmp_path / "led" / "_LATEST").read_text())
    assert len(ptr2["terminal"]) == 1
    merged = led._seg_range(ptr2["terminal"][0])
    assert merged is not None
    lo = min(x for x in [ra[0], rb[0]] if x)
    assert merged[0] <= lo and merged[1] >= max(ra[1], rb[1])
    assert led.counts()[LedgerStatus.SUCCEEDED] == 44


@pytest.mark.soak
def test_two_runner_soak_through_defer_and_drain(spark, tmp_path):
    """Concurrency soak across the round-9 deferral state machine: two
    runners drain a 400-file backlog in 5-file batches. Early commits sit
    under the 5% terminal threshold (defer: terminal rows ride in the
    active part), and as the backlog shrinks the fraction crosses the
    threshold mid-soak (drain: accumulated terminal rows move to segments)
    — both paths and the transition run under real claim interleaving,
    with the publish_seq counter and sidecar writes in the loop. Exactly-
    once per file, nothing lost, bookkeeping consistent at the end."""
    import json as J
    import threading

    led = Ledger(spark, str(tmp_path / "led"))
    n_files = 400
    led.register(_synth_files(spark, 0, n_files))

    done: dict[str, list[str]] = {"a": [], "b": []}
    errors: list[BaseException] = []

    def runner(name: str) -> None:
        try:
            while True:
                claimed = led.claim_batch(5, name)
                if not claimed:
                    return
                fenced = led.apply_outcomes(
                    [(claimed, LedgerStatus.SUCCEEDED, None)], run_id=name
                )
                done[name].extend(p for p in claimed if p not in set(fenced))
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    ta = threading.Thread(target=runner, args=("a",))
    tb = threading.Thread(target=runner, args=("b",))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errors, errors

    # exactly-once: no file committed by both runners, all drained
    assert set(done["a"]) & set(done["b"]) == set()
    assert len(done["a"]) + len(done["b"]) == n_files
    assert led.counts() == {LedgerStatus.SUCCEEDED: n_files}
    assert led.read().select("s3_key").distinct().count() == n_files

    # bookkeeping: the recorded deferral bound covers the actual deferred
    # terminal rows still riding in the active dir (bound may overcount —
    # fenced rows — but never undercount), and the monotonic publish
    # counter advanced at least one claim+commit pair per batch
    ptr = J.loads((tmp_path / "led" / "_LATEST").read_text())
    active = spark.read.parquet(str(tmp_path / "led" / ptr["active"]))
    from datalakejson_spark.plans.ledger import TERMINAL_STATUSES

    n_deferred_actual = active.filter(
        active.status.isin(*TERMINAL_STATUSES)
    ).count()
    assert n_deferred_actual <= ptr["deferred_terminal"]
    # each 5-file batch publishes twice (claim's PROCESSING flip + commit)
    assert ptr["publish_seq"] >= 2 * (n_files // 5)
    # every referenced segment carries a valid range sidecar
    for seg in ptr["terminal"]:
        r = led._seg_range(seg)
        assert r is not None and r[0] <= r[1]


def test_retirement_grace_is_publish_count_based(spark, tmp_path, monkeypatch):
    """ADVICE r8: the retired-segment journal stamps the pointer's MONOTONIC
    publish counter at retirement, never anything clock-derived (version
    names are minted by whichever machine publishes, so a name-comparison
    grace collapses under cross-machine clock skew), and is written
    atomically."""
    import json as J

    from datalakejson_spark.plans import ledger as L

    monkeypatch.setattr(L, "MAX_TERMINAL_SEGMENTS", 1)
    led = Ledger(spark, str(tmp_path / "led"))
    led.register(_synth_files(spark, 0, 6))
    for i in range(2):  # second commit folds (1+1 > 1) and retires a segment
        c = led.claim_batch(2, f"r{i}")
        led.apply_outcomes([(c, LedgerStatus.SUCCEEDED, None)], run_id=f"r{i}")
    retired = J.loads((tmp_path / "led" / "_RETIRED").read_text())
    assert retired, "fold must have retired the replaced segments"
    ptr = J.loads((tmp_path / "led" / "_LATEST").read_text())
    assert isinstance(ptr["publish_seq"], int) and ptr["publish_seq"] >= 1
    for stamp in retired.values():
        assert isinstance(stamp, dict) and isinstance(stamp["seq"], int)
        assert stamp["seq"] <= ptr["publish_seq"]
    assert not (tmp_path / "led" / "_RETIRED.tmp").exists()

    # Clock-skew immunity: a publish whose version NAME sorts below every
    # kept version (a skewed-behind runner's clock) must not fast-forward
    # the grace — the counter advances by one regardless of the name.
    seq_before = ptr["publish_seq"]
    orig_time_ns = L.time.time_ns
    monkeypatch.setattr(L.time, "time_ns", lambda: orig_time_ns() - 10**15)
    led.register(_synth_files(spark, 6, 7))  # one skewed publish
    monkeypatch.setattr(L.time, "time_ns", orig_time_ns)
    ptr2 = J.loads((tmp_path / "led" / "_LATEST").read_text())
    assert ptr2["publish_seq"] == seq_before + 1
    # surviving retired entries aged exactly one publish, not >= keep
    retired2 = J.loads((tmp_path / "led" / "_RETIRED").read_text())
    for name, stamp in retired2.items():
        if name in retired and ptr2["publish_seq"] - stamp["seq"] < 3:
            assert (tmp_path / "led" / name).is_dir(), (
                "segment deleted before its publish-count grace elapsed"
            )
