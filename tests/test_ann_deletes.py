"""Delete/upsert lifecycle for the persisted ANN indexes (round 14): a
delete is LOGICAL first (immutable tombstone file + probe-side anti-filter,
immediate), physical removal is the staged vacuum admin verb behind a
measured trigger, and re-appending a tombstoned id fails loudly with the
upsert recipe (the probe filter is by id — a revived row would be
invisible)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from datalakejson_spark.functions.index_maintenance import (
    load_tombstones,
    needs_vacuum,
)
from datalakejson_spark.functions.ivf import (
    N_CELLS,
    N_PROBE,
    _ivf_live_files,
    build_ivf_index,
    compact_ivf_cells,
    ivf_index_append,
    ivf_index_delete,
    ivf_index_topk,
    ivf_index_upsert,
    ivf_needs_retrain,
    ivf_recall_probe,
    load_ivf_meta,
    vacuum_ivf_deletes,
)
from datalakejson_spark.plans import killpoints
from datalakejson_spark.plans.killpoints import InjectedKill

# Multi-minute soak/race/kill/lifecycle suite: excluded from the default
# pytest run (pyproject addopts -m 'not soak') so the driver's verify
# window holds; run per round with `python -m pytest tests/ -m soak`.
pytestmark = pytest.mark.soak

SF = "/root/testdata/sf0.01"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _twin(spark, emb, vec_id, new_id, eps=1e-4):
    base = emb.filter(F.col("vec_id") == vec_id).first()
    return spark.createDataFrame(
        [(new_id, [float(v) + eps for v in base.embedding])],
        "vec_id bigint, embedding array<double>",
    )


def test_delete_hides_immediately_and_vacuum_removes_physically(
    spark, tmp_path
):
    """Tombstone → the deleted twin vanishes from top-k in the SAME
    session with no rewrite; vacuum → it is physically gone, ONLY its cell
    was rewritten (file identity for every other cell), the tombstone
    files retire, the advisory count decrements, and the probe result is
    row-for-row identical before and after the vacuum."""
    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=N_CELLS)
    n = emb.count()

    # plant a twin so vec 7's top neighbor is known, then delete it
    ivf_index_append(spark, _twin(spark, emb, 7, 100000), idx)
    queries = emb.filter(F.col("vec_id") == 7)
    top = ivf_index_topk(spark, queries, idx).filter("rn = 1").first()
    assert top.neighbor_id == 100000

    assert ivf_index_delete(idx, [100000]) == 1
    rows_logical = sorted(
        (r.query_id, r.neighbor_id, r.rn)
        for r in ivf_index_topk(spark, queries, idx, nprobe=N_PROBE).collect()
    )
    assert all(nb != 100000 for _q, nb, _r in rows_logical)
    assert len(rows_logical) == 5  # still a full top-k from live rows
    # the row is still physically present (logical delete only)
    cells = os.path.join(idx, "cells")
    assert spark.read.parquet(cells).filter("vec_id = 100000").count() == 1

    layout_before = _ivf_live_files(idx)
    rep = vacuum_ivf_deletes(spark, idx)
    assert rep["vectors_removed"] == 1 and rep["rows_removed"] == 1
    assert rep["partitions_rewritten"] == 1
    assert rep["tombstone_files_cleared"] == 1
    assert spark.read.parquet(cells).filter("vec_id = 100000").count() == 0
    assert spark.read.parquet(cells).count() == n
    assert load_tombstones(idx) == (set(), [])
    assert load_ivf_meta(idx)["n_vectors"] == n
    # locality: every untouched cell's files survive by name
    after = _ivf_live_files(idx)
    changed = [c for c in layout_before if layout_before[c] != after.get(c)]
    assert len(changed) == 1, changed
    # probe parity across the physical removal
    rows_physical = sorted(
        (r.query_id, r.neighbor_id, r.rn)
        for r in ivf_index_topk(spark, queries, idx, nprobe=N_PROBE).collect()
    )
    assert rows_physical == rows_logical
    # idempotent: nothing left to vacuum
    assert vacuum_ivf_deletes(spark, idx)["rows_removed"] == 0


def test_append_of_tombstoned_id_fails_loudly_and_upsert_works(
    spark, tmp_path
):
    """A tombstoned id cannot be silently re-appended (the probe filter
    would hide the new row); the upsert verb (delete → vacuum → append)
    replaces the vector and the probe sees the NEW embedding."""
    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=N_CELLS)
    ivf_index_append(spark, _twin(spark, emb, 3, 200000), idx)
    ivf_index_delete(idx, [200000])

    with pytest.raises(ValueError, match="upsert"):
        ivf_index_append(spark, _twin(spark, emb, 3, 200000), idx)

    # upsert re-homes the id NEXT TO A DIFFERENT VECTOR: the probe must
    # see the new embedding, not the old one
    assert ivf_index_upsert(spark, _twin(spark, emb, 5, 200000), idx) == 1
    top5 = (
        ivf_index_topk(spark, emb.filter("vec_id = 5"), idx)
        .filter("rn = 1")
        .first()
    )
    assert top5.neighbor_id == 200000
    rows3 = ivf_index_topk(spark, emb.filter("vec_id = 3"), idx).collect()
    assert all(r.neighbor_id != 200000 or r.rn > 1 for r in rows3)
    # exactly one physical copy survived the upsert
    assert (
        spark.read.parquet(os.path.join(idx, "cells"))
        .filter("vec_id = 200000")
        .count()
        == 1
    )


def test_vacuum_trigger_is_measured(spark, tmp_path):
    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=N_CELLS)
    n = emb.count()
    assert not needs_vacuum(idx)[0]
    # cross the relative bound: > 1% of the advisory count
    ivf_index_delete(idx, range(int(n * 0.02)))
    fired, stats = needs_vacuum(idx)
    assert fired, stats
    assert stats["tombstoned"] == int(n * 0.02)
    vacuum_ivf_deletes(spark, idx)
    assert not needs_vacuum(idx)[0]


def test_vacuum_kill_windows(spark, tmp_path):
    """Kill after staging, before _COMMITTED: old layout wins, tombstones
    stay, probes stay filtered. Kill after _COMMITTED: the next entry
    publish rolls the rewrite forward; the tombstones retire on the next
    vacuum (which finds zero matches)."""
    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=N_CELLS)
    n = emb.count()
    ivf_index_delete(idx, [1, 2, 3])

    killpoints.kill_once("ivf:vacuum_staged")
    try:
        with pytest.raises(InjectedKill):
            vacuum_ivf_deletes(spark, idx)
    finally:
        killpoints.disarm()
    cells = os.path.join(idx, "cells")
    assert spark.read.parquet(cells).count() == n  # old layout intact
    assert len(load_tombstones(idx)[0]) == 3

    killpoints.kill_once("ivf:vacuum_committed")
    try:
        with pytest.raises(InjectedKill):
            vacuum_ivf_deletes(spark, idx)
    finally:
        killpoints.disarm()
    # committed: a probe's entry publish completes the rewrite
    queries = emb.filter(F.col("vec_id") == 7)
    rows = ivf_index_topk(spark, queries, idx).collect()
    assert rows and all(r.neighbor_id not in (1, 2, 3) for r in rows)
    assert spark.read.parquet(cells).count() == n - 3
    # tombstones survive the crash (retirement is strictly post-publish) —
    # harmless no-op filters until the next vacuum retires them. Round 15:
    # the FIRST kill's uncommitted copier stage still lingers in staging,
    # and retirement refuses while any copier stage exists (it could hold
    # stale pinned copies — the multiproc soak's resurrection), so the
    # retire waits for the stale-stage sweep.
    rep = vacuum_ivf_deletes(spark, idx)
    assert rep["rows_removed"] == 0 and rep["tombstone_files_cleared"] == 0
    assert load_tombstones(idx)[0] == {1, 2, 3}
    staging = os.path.join(idx, "_staging")
    for t in os.listdir(staging):  # age the crashed stage past the grace
        if t.startswith("_SLOT_"):
            continue
        # the sweep ages on the NEWEST mtime in the tree (round 15: a live
        # stager's deep writes keep it alive) — backdate every entry
        top = os.path.join(staging, t)
        for root, dirs, files in os.walk(top):
            for name in dirs + files:
                os.utime(os.path.join(root, name), (1, 1))
        os.utime(top, (1, 1))
    rep = vacuum_ivf_deletes(spark, idx)  # entry publish sweeps it; retire
    assert rep["rows_removed"] == 0 and rep["tombstone_files_cleared"] >= 1
    assert load_tombstones(idx) == (set(), [])


def test_compaction_folds_out_tombstoned_rows(spark, tmp_path):
    """Rows a tiered fold rewrites anyway drop out when logically deleted
    — free partial cleanup; the tombstones stay (kept runs may still hold
    the ids) and the next vacuum retires them once nothing does."""
    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=N_CELLS)
    n = emb.count()
    for g in range(3):
        ivf_index_append(
            spark, _twin(spark, emb, g, 300000 + g), idx, batch_id=f"g{g}"
        )
    ivf_index_delete(idx, [300000, 300001])
    folded = compact_ivf_cells(spark, idx, max_runs_per_cell=1)
    assert folded
    cells = spark.read.parquet(os.path.join(idx, "cells"))
    assert cells.filter(F.col("vec_id").isin([300000, 300001])).count() == 0
    assert cells.count() == n + 1  # 300002 survived the fold
    # tombstones retire via vacuum, which now finds nothing to rewrite
    rep = vacuum_ivf_deletes(spark, idx)
    assert rep["rows_removed"] == 0 and rep["tombstone_files_cleared"] == 1


def test_recall_probe_and_retrain_ignore_deleted_vectors(spark, tmp_path):
    """Deletes must not read as drift: the recall probe excludes
    tombstoned vectors from BOTH sides (a deleted near-neighbor is not a
    miss), and a rebuild clears tombstones as part of the new identity."""
    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=N_CELLS, measure_recall=True)
    base = load_ivf_meta(idx)["baseline_recall"]
    # plant twins next to several vectors, then delete the twins: with the
    # exact side UNfiltered these would all read as probe misses
    for i in range(8):
        ivf_index_append(spark, _twin(spark, emb, i, 400000 + i), idx)
    ivf_index_delete(idx, range(400000, 400008))
    cur = ivf_recall_probe(spark, idx)
    # floor=0: isolate the DRIFT comparison (this unclustered fixture sits
    # near the absolute floor at nprobe=4 regardless of deletes — the
    # floor is about index quality, not delete hygiene)
    needs, _ = ivf_needs_retrain(spark, idx, drift_tolerance=0.1, floor=0.0)
    assert cur >= base - 0.05, (cur, base)
    assert not needs
    # rebuild = new identity: tombstones cleared
    build_ivf_index(emb, idx, n_cells=N_CELLS)
    assert load_tombstones(idx) == (set(), [])


def test_lsh_delete_vacuum_and_probe_filter(spark, tmp_path):
    """The LSH twin end-to-end: logical delete hides the neighbor in every
    table's bucket, vacuum removes all n_tables copies and only rewrites
    the buckets that held them, append-of-tombstoned fails loudly."""
    from datalakejson_spark.functions.lsh_index import (
        build_lsh_index,
        lsh_index_append,
        lsh_index_delete,
        lsh_index_topk,
        vacuum_lsh_deletes,
    )

    emb = _emb(spark)
    idx = str(tmp_path / "lsh")
    build_lsh_index(emb, idx, n_planes=4, n_tables=4)
    ivf_like_n = spark.read.parquet(os.path.join(idx, "buckets")).count()

    lsh_index_append(spark, _twin(spark, emb, 7, 500000), idx)
    queries = emb.filter(F.col("vec_id") == 7)
    assert (
        lsh_index_topk(spark, queries, idx).filter("rn = 1").first().neighbor_id
        == 500000
    )
    lsh_index_delete(idx, [500000])
    rows = lsh_index_topk(spark, queries, idx).collect()
    assert rows and all(r.neighbor_id != 500000 for r in rows)

    with pytest.raises(ValueError, match="upsert"):
        lsh_index_append(spark, _twin(spark, emb, 7, 500000), idx)

    rep = vacuum_lsh_deletes(spark, idx)
    assert rep["vectors_removed"] == 1
    assert rep["rows_removed"] == 4  # one copy per table
    assert 1 <= rep["partitions_rewritten"] <= 4
    live = spark.read.parquet(os.path.join(idx, "buckets"))
    assert live.filter("vec_id = 500000").count() == 0
    assert live.count() == ivf_like_n
    assert load_tombstones(idx) == (set(), [])


def test_lsh_maintenance_tick(spark, tmp_path):
    """The LSH ops loop in one verb: a fragmented index with pending
    deletes vacuums and folds from measured triggers, reports (never runs)
    a needed re-plane, and converges to a no-op tick."""
    from datalakejson_spark.functions.lsh_index import (
        build_lsh_index,
        lsh_index_append,
        lsh_index_delete,
        lsh_maintenance_tick,
        lsh_needs_compaction,
        load_lsh_meta,
    )

    emb = _emb(spark)
    idx = str(tmp_path / "lsh")
    build_lsh_index(emb, idx, n_planes=3, n_tables=2)
    # three appends of near-twins of the SAME vector: they hash into the
    # same buckets every time, so those buckets accumulate base + 3 runs
    for g in range(3):
        lsh_index_append(spark, _twin(spark, emb, 7, 600000 + g), idx)
    lsh_index_delete(idx, range(600000, 600003))
    lsh_index_delete(idx, range(0, 12))  # 15 ids > 1% of ~503: trigger

    assert lsh_needs_compaction(idx, max_runs_per_bucket=2)
    report = lsh_maintenance_tick(
        spark, idx, max_runs_per_bucket=2, target_bucket_rows=15
    )
    verbs = [a["verb"] for a in report["actions"]]
    # vacuum runs first and IS a rewrite of the affected buckets — here
    # those are exactly the fragmented ones, so it clears the fold trigger
    # as a side effect; a fold still runs when OTHER buckets are over-run
    assert verbs[0] == "vacuum"
    # ~500 vectors x 2 tables over 16 tb partitions ≈ 62 mean rows, past
    # 4 x the 15-row target: the retune reading reports the autotuned
    # plane count, runs nothing
    assert report["recommend_replanes"] is not None
    assert load_lsh_meta(idx)["n_planes"] == 3  # never re-planed in-tick
    live = spark.read.parquet(os.path.join(idx, "buckets"))
    assert live.filter(F.col("vec_id") < 12).count() == 0  # vacuumed
    assert not lsh_needs_compaction(idx, max_runs_per_bucket=2)

    report2 = lsh_maintenance_tick(
        spark, idx, max_runs_per_bucket=2, target_bucket_rows=15
    )
    assert report2["actions"] == []


def test_upsert_reruns_vacuum_after_a_race_loss(spark, tmp_path, monkeypatch):
    """ivf_index_upsert must survive its vacuum losing a publish race
    (round 15 — found by the 10^6 delete soak: vacuum_deleted returns as a
    clean race loser with tombstones KEPT when a concurrent compaction
    publish wins, and a single-pass upsert then fed still-tombstoned ids
    to the append, which rejects them loudly). The verb now reruns the
    vacuum until its ids are physically gone."""
    import datalakejson_spark.functions.ivf as ivf_mod
    from datalakejson_spark.functions.ivf import ivf_index_upsert

    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=N_CELLS)

    real_vacuum = ivf_mod.vacuum_ivf_deletes
    calls = {"n": 0}

    def racing_vacuum(spark_, index_dir):
        calls["n"] += 1
        if calls["n"] == 1:
            # simulated race loser: the real verb's loser path returns the
            # zero report with tombstones kept (index untouched)
            return {
                "rows_removed": 0,
                "vectors_removed": 0,
                "partitions_rewritten": 0,
                "tombstone_files_cleared": 0,
            }
        return real_vacuum(spark_, index_dir)

    monkeypatch.setattr(ivf_mod, "vacuum_ivf_deletes", racing_vacuum)
    base = emb.filter(F.col("vec_id") == 3).first()
    replacement = spark.createDataFrame(
        [(3, [float(v) + 0.5 for v in base.embedding])],
        "vec_id bigint, embedding array<double>",
    )
    n = ivf_index_upsert(spark, replacement, idx)
    assert n == 1 and calls["n"] >= 2  # the loser pass was retried
    cells = spark.read.parquet(os.path.join(idx, "cells"))
    assert cells.filter("vec_id = 3").count() == 1  # replaced, not doubled
    assert load_tombstones(idx) == (set(), [])


def test_lsh_upsert_replaces_in_every_table(spark, tmp_path, monkeypatch):
    """lsh_index_upsert (round 15 — the LSH twin): replace-by-id removes
    every tb-partition copy of the old vector and appends the new one
    under the persisted family; the re-append of a tombstoned id would
    fail loudly, so the verb's vacuum retry (same soak-found race-loser
    hazard as the IVF twin) is load-bearing."""
    import datalakejson_spark.functions.lsh_index as lsh_mod
    from datalakejson_spark.functions.lsh_index import (
        build_lsh_index,
        lsh_index_topk,
        lsh_index_upsert,
    )

    emb = _emb(spark)
    idx = str(tmp_path / "lsh")
    build_lsh_index(emb, idx, n_planes=4, n_tables=4)

    real_vacuum = lsh_mod.vacuum_lsh_deletes
    calls = {"n": 0}

    def racing_vacuum(spark_, index_dir):
        calls["n"] += 1
        if calls["n"] == 1:  # simulated race loser: tombstones kept
            return {
                "rows_removed": 0,
                "vectors_removed": 0,
                "partitions_rewritten": 0,
                "tombstone_files_cleared": 0,
            }
        return real_vacuum(spark_, index_dir)

    monkeypatch.setattr(lsh_mod, "vacuum_lsh_deletes", racing_vacuum)
    base = emb.filter(F.col("vec_id") == 5).first()
    replacement = spark.createDataFrame(
        [(5, [float(v) + 0.5 for v in base.embedding])],
        "vec_id bigint, embedding array<double>",
    )
    assert lsh_index_upsert(spark, replacement, idx) == 1
    assert calls["n"] >= 2  # the loser pass was retried
    buckets = spark.read.parquet(os.path.join(idx, "buckets"))
    # exactly one copy per table the family hashes vec 5 into — never the
    # old and new rows side by side
    dups = (
        buckets.filter("vec_id = 5")
        .groupBy("tb")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dups == 0
    assert load_tombstones(idx) == (set(), [])
    # the replacement embedding is what probes now score
    got = buckets.filter("vec_id = 5").select("embedding").first()[0]
    assert abs(got[0] - (float(base.embedding[0]) + 0.5)) < 1e-6  # float32 index dtype
    # and the index still answers
    q = emb.filter(F.col("vec_id") == 3)
    assert lsh_index_topk(spark, q, idx).count() > 0


def test_index_report_reads_everything_driver_side(spark, tmp_path):
    """index_report (round 15): one no-Spark-job read of the operator's
    whole picture — family, advisory count, layout/run stats, tombstone
    state with the vacuum verdict, pending committed stages, owning
    streams, and the last advisory readings."""
    from datalakejson_spark.functions.index_maintenance import index_report
    from datalakejson_spark.streaming.ann_stream import (
        process_ann_batch,
        process_delete_batch,
    )

    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=N_CELLS)
    n = emb.count()
    process_ann_batch(
        spark, _twin(spark, emb, 7, 700000), 0, idx, stream_id="appendR"
    )
    feed = spark.createDataFrame([(700000,)], "vec_id bigint")
    process_delete_batch(spark, feed, 0, idx, stream_id="deleteR")

    rep = index_report(idx)
    assert rep["plane"] == "ivf" and rep["subdir"] == "cells"
    assert rep["family"]["n_cells"] == N_CELLS
    assert rep["n_vectors"] == n + 1
    assert rep["layout"]["partitions"] > 0
    assert rep["layout"]["files"] >= rep["layout"]["partitions"]
    assert rep["layout"]["max_runs_per_partition"] >= 1
    assert rep["tombstones"]["ids"] == 1
    assert rep["tombstones"]["needs_vacuum"] is False  # 1 of n: under trigger
    assert rep["committed_stages_pending"] == []
    assert rep["streams"] == {"append": "appendR", "delete": "deleteR"}
    assert rep["last_readings"]["recall"] is None  # no monitor ran

    # the LSH plane reports through the same verb
    from datalakejson_spark.functions.lsh_index import build_lsh_index

    lidx = str(tmp_path / "lsh")
    build_lsh_index(emb, lidx, n_planes=4, n_tables=2)
    lrep = index_report(lidx)
    assert lrep["plane"] == "lsh" and lrep["subdir"] == "buckets"
    assert lrep["family"]["n_planes"] == 4
    assert lrep["n_vectors"] == n


def test_tombstone_files_fold_past_the_file_bound(spark, tmp_path):
    """compact_tombstones (round 15 self-review): the vacuum trigger
    bounds tombstone IDS, not FILES — a hot one-id-per-batch delete feed
    accumulates one tiny file per batch and every probe pays one
    open+parse per file. Past TOMBSTONE_FOLD_MAX_FILES the set folds into
    one merged file with the id set EXACTLY preserved; under the bound the
    fold is a no-op; the delete-stream path folds automatically."""
    from datalakejson_spark.functions.index_maintenance import (
        compact_tombstones,
    )
    from datalakejson_spark.streaming.ann_stream import process_delete_batch

    emb = _emb(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=N_CELLS)

    # 70 single-id deletes through the batch verb: files pile up
    for i in range(70):
        ivf_index_delete(idx, [10_000 + i])
    ids_before, names_before = load_tombstones(idx)
    assert len(names_before) == 70
    folded = compact_tombstones(idx)
    assert folded == 70
    ids_after, names_after = load_tombstones(idx)
    assert ids_after == ids_before  # exactly preserved
    assert len(names_after) == 1
    assert compact_tombstones(idx) == 0  # under the bound: no-op

    # a delete racing the fold window survives (it was not in the input
    # snapshot) and the probes still filter everything
    ivf_index_delete(idx, [99_999])
    assert load_tombstones(idx)[0] == ids_before | {99_999}

    # the delete stream folds automatically once its batches cross the
    # bound (65 more single-id batches on top of the 2 files present)
    for b in range(65):
        feed = spark.createDataFrame([(20_000 + b,)], "vec_id bigint")
        process_delete_batch(spark, feed, b, idx, stream_id="foldstream")
    assert len(load_tombstones(idx)[1]) <= 65  # folded at least once
    want = ids_before | {99_999} | {20_000 + b for b in range(65)}
    assert load_tombstones(idx)[0] == want
    # vacuum clears the folded set exactly like loose files
    rep = vacuum_ivf_deletes(spark, idx)
    assert rep["tombstone_files_cleared"] == len(load_tombstones(idx)[1]) or (
        load_tombstones(idx) == (set(), [])
    )
    assert load_tombstones(idx) == (set(), [])


def test_concurrent_folds_and_deletes_preserve_the_id_set(spark, tmp_path):
    """Two runners folding the same tombstone directory while deletes keep
    landing (the multi-runner ops-loop shape): folds may duplicate ids
    across merged files transiently — set-masked by load_tombstones — but
    the UNION of tombstoned ids is never wrong and no delete is lost."""
    import threading

    from datalakejson_spark.functions.index_maintenance import (
        add_tombstones,
        compact_tombstones,
        load_tombstones,
    )

    idx = str(tmp_path / "ivf")
    os.makedirs(idx, exist_ok=True)
    expected: set[int] = set()
    lock = threading.Lock()
    stop = threading.Event()
    errors: list[BaseException] = []

    def folder():
        while not stop.is_set():
            try:
                compact_tombstones(idx, max_files=8)
            except BaseException as exc:  # noqa: BLE001 — the audit line
                errors.append(exc)
                return

    threads = [threading.Thread(target=folder) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        for i in range(300):
            add_tombstones(idx, [i])
            with lock:
                expected.add(i)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=60)
    assert not errors, errors
    ids, names = load_tombstones(idx)
    assert ids == expected  # no delete lost, none invented
    # a closing fold converges the file count under the bound
    compact_tombstones(idx, max_files=8)
    assert len(load_tombstones(idx)[1]) <= 9
    assert load_tombstones(idx)[0] == expected
