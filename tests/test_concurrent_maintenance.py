"""Concurrent index maintenance (round 12, VERDICT ask #4): one runner
compacts/rebuilds WHILE another audits+appends. The fencing contract:

- audits stay EXACT across concurrent tiered merges (the reader re-plans
  from a fresh listing when a subsumed file vanishes mid-scan);
- two racing maintenance publishes detect a loser via the `_SUBSUMED`
  snapshot check (the loser discards itself; the winner's layout wins);
- a publish interrupted AFTER its `_PUBLISHING` point-of-no-return rolls
  FORWARD on replay instead of misreading its own deletes as a lost race.
"""

from __future__ import annotations

import os
import shutil
import threading
import time

import pytest

from datalakejson_spark.functions import incremental_dedup as inc
from datalakejson_spark.functions.incremental_dedup import (
    compact_index,
    ingest_batch_dedup,
)

# Multi-minute soak/race/kill/lifecycle suite: excluded from the default
# pytest run (pyproject addopts -m 'not soak') so the driver's verify
# window holds; run per round with `python -m pytest tests/ -m soak`.
pytestmark = pytest.mark.soak


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _distinct_text(i: int) -> str:
    import hashlib

    return " ".join(
        hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8] for j in range(10)
    )


def _index_rows(spark, idx: str, sub: str) -> list[tuple]:
    return sorted(
        tuple(r) for r in spark.read.parquet(os.path.join(idx, sub)).collect()
    )


def test_concurrent_compaction_soak(spark, tmp_path):
    """Two-runner soak: an ingest loop appends novel batches while a
    maintenance loop tier-merges the same index as fast as it can. Every
    batch must keep ALL its novel docs (a half-read index would re-admit
    or falsely reject), the final index must know every ingested doc, and
    no stage may be left stranded."""
    idx = str(tmp_path / "idx")
    n_batches, per = 10, 8
    kept_counts: list[int] = []
    maint_errors: list[BaseException] = []
    compactions = 0
    stop = threading.Event()

    # bootstrap (also stamps the lane marker) before the racers start
    ingest_batch_dedup(
        spark,
        _docs(spark, [(i, _distinct_text(i)) for i in range(per)]),
        idx,
        compact_max_runs=None,
    )

    def maintenance():
        nonlocal compactions
        while not stop.is_set():
            try:
                compact_index(spark, idx, target_rows_per_file=16, max_runs=2)
                compactions += 1
            except BaseException as exc:  # noqa: BLE001 — the assertion
                maint_errors.append(exc)
                return
            time.sleep(0.05)

    t = threading.Thread(target=maintenance, daemon=True)
    t.start()
    try:
        for b in range(1, n_batches):
            kept = ingest_batch_dedup(
                spark,
                _docs(
                    spark,
                    [
                        (b * per + k, _distinct_text(b * per + k))
                        for k in range(per)
                    ],
                ),
                idx,
                compact_max_runs=None,
            )
            kept_counts.append(kept.count())
    finally:
        stop.set()
        t.join(timeout=120)
    assert not maint_errors, maint_errors
    assert compactions > 0  # the race was real
    assert kept_counts == [per] * (n_batches - 1)  # every novel doc kept

    # the final index knows every ingested doc: a full replay keeps nothing
    total = n_batches * per
    replay = ingest_batch_dedup(
        spark,
        _docs(
            spark,
            [(10_000 + i, _distinct_text(i)) for i in range(total)],
        ),
        idx,
        compact_max_runs=None,
    )
    assert replay.count() == 0
    # ...and a genuinely novel doc still passes
    kept = ingest_batch_dedup(
        spark,
        _docs(spark, [(20_000, "never before seen probe words")]),
        idx,
        compact_max_runs=None,
    )
    assert kept.count() == 1
    # index-pair consistency + no stranded committed stages
    hashes = spark.read.parquet(f"{idx}/hashes")
    assert hashes.distinct().count() == total + 1
    staging = os.path.join(idx, inc._STAGING)
    if os.path.isdir(staging):
        for token in os.listdir(staging):
            assert not os.path.exists(
                os.path.join(staging, token, "_COMMITTED")
            )


def test_publish_race_loser_is_discarded(spark, tmp_path):
    """Two committed maintenance stages subsuming the same snapshot: the
    first publish wins; the second must detect the missing subsumed files
    and discard itself — never delete the winner's output or resurrect
    duplicated rows."""
    from datalakejson_spark.plans import killpoints
    from datalakejson_spark.plans.killpoints import InjectedKill

    idx = str(tmp_path / "idx")
    for b in range(3):
        ingest_batch_dedup(
            spark,
            _docs(spark, [(b * 6 + k, _distinct_text(b * 6 + k)) for k in range(6)]),
            idx,
            compact_max_runs=None,
        )
    rows_before = _index_rows(spark, idx, "bands")

    killpoints.kill_once("dedup:compact_committed")
    with pytest.raises(InjectedKill):
        compact_index(spark, idx, target_rows_per_file=16, max_runs=1)
    staging = os.path.join(idx, inc._STAGING)
    (token,) = os.listdir(staging)
    # the racing twin: an identical committed stage from "another runner"
    shutil.copytree(
        os.path.join(staging, token), os.path.join(staging, "zz-racer")
    )

    inc._publish_staged(idx)  # publishes the winner, discards the loser
    assert not (os.path.isdir(staging) and os.listdir(staging))
    assert _index_rows(spark, idx, "bands") == rows_before  # no loss, no dup
    for sub in ("hashes", "bands"):
        assert len(inc._derive_runs(inc._live_files(f"{idx}/{sub}"))) == 1


def test_publishing_marker_rolls_forward_not_loses(spark, tmp_path):
    """A publish that crashed AFTER its _PUBLISHING point-of-no-return has
    already deleted some subsumed files; the replay must roll FORWARD
    (finish moves + deletes), not misread its own progress as a lost race
    and discard the stage (which would lose the moved-out rows)."""
    from datalakejson_spark.plans import killpoints
    from datalakejson_spark.plans.killpoints import InjectedKill

    idx = str(tmp_path / "idx")
    for b in range(3):
        ingest_batch_dedup(
            spark,
            _docs(spark, [(b * 6 + k, _distinct_text(b * 6 + k)) for k in range(6)]),
            idx,
            compact_max_runs=None,
        )
    rows_before = _index_rows(spark, idx, "bands")

    killpoints.kill_once("dedup:compact_committed")
    with pytest.raises(InjectedKill):
        compact_index(spark, idx, target_rows_per_file=16, max_runs=1)
    staging = os.path.join(idx, inc._STAGING)
    (token,) = os.listdir(staging)
    stage = os.path.join(staging, token)
    # simulate the crash window: marker down, one subsumed delete done
    with open(os.path.join(stage, "_PUBLISHING"), "w") as fh:
        fh.write("ok")
    import json

    with open(os.path.join(stage, "_SUBSUMED.json")) as fh:
        subsumed = json.load(fh)
    victim = subsumed["bands"][0]
    os.remove(os.path.join(idx, "bands", victim))

    inc._publish_staged(idx)
    assert not (os.path.isdir(staging) and os.listdir(staging))
    assert _index_rows(spark, idx, "bands") == rows_before  # rolled forward
    for sub in ("hashes", "bands"):
        assert len(inc._derive_runs(inc._live_files(f"{idx}/{sub}"))) == 1


def test_kill_at_publishing_marker_recovers(spark, tmp_path):
    """Crash immediately after the _PUBLISHING marker (before any move):
    the next entry point completes the whole publish."""
    from datalakejson_spark.plans import killpoints
    from datalakejson_spark.plans.killpoints import InjectedKill

    idx = str(tmp_path / "idx")
    for b in range(2):
        ingest_batch_dedup(
            spark,
            _docs(spark, [(b * 6 + k, _distinct_text(b * 6 + k)) for k in range(6)]),
            idx,
            compact_max_runs=None,
        )
    rows_before = _index_rows(spark, idx, "bands")
    killpoints.kill_once("dedup:publish_publishing")
    with pytest.raises(InjectedKill):
        compact_index(spark, idx, target_rows_per_file=16, max_runs=1)
    # recovery via any entry point's roll-forward
    kept = ingest_batch_dedup(
        spark,
        _docs(spark, [(900, "wholly novel probe words here")]),
        idx,
        compact_max_runs=None,
    )
    assert kept.count() == 1
    probe_rows = _index_rows(spark, idx, "bands")
    base = [r for r in probe_rows if r[0] < 900]
    assert base == rows_before


def test_audit_retries_when_snapshot_file_vanishes(spark, tmp_path, monkeypatch):
    """The missing-file retry: make the FIRST audit attempt read a file
    list containing a just-deleted file (the concurrent-publish
    signature); the batch must succeed on re-plan, not raise."""
    idx = str(tmp_path / "idx")
    for b in range(2):
        ingest_batch_dedup(
            spark,
            _docs(spark, [(b * 6 + k, _distinct_text(b * 6 + k)) for k in range(6)]),
            idx,
            compact_max_runs=None,
        )
    compact_index(spark, idx, target_rows_per_file=8, max_runs=1)

    real = inc._read_index_pair_pruned
    calls = {"n": 0}

    def flaky(spark_, index_dir, id_col, hash_keys, band_keys):
        calls["n"] += 1
        h, b, stats = real(spark_, index_dir, id_col, hash_keys, band_keys)
        if calls["n"] == 1:
            # a frame whose execution fails like a vanished input file
            import pyspark.sql.functions as F

            bad = spark_.read.schema(
                "doc_id bigint, band int, band_hash string"
            ).parquet(os.path.join(index_dir, "bands", "nope.parquet"))
            return h, b.unionByName(bad), stats
        return h, b, stats

    monkeypatch.setattr(inc, "_read_index_pair_pruned", flaky)
    kept = ingest_batch_dedup(
        spark,
        _docs(spark, [(500, _distinct_text(2)), (501, "fresh novel words")]),
        idx,
        compact_max_runs=None,
    )
    assert calls["n"] == 2  # first attempt failed, second re-planned
    assert [r.doc_id for r in kept.collect()] == [501]
