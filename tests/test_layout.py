"""Z-order clustered layout (plans/layout.py): content preservation, plan
shape, and the measured data-skipping win over arrival-order layout."""

from __future__ import annotations

import pyspark.sql.functions as F

from datalakejson_spark.plans.layout import (
    cluster_write,
    prunable_fraction,
    rowgroup_stats,
    zorder_key,
)
from datalakejson_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
COLS = ["user_id", "value"]


def _boxes(events):
    """Nine narrow 2-D boxes spread over the key space (≈10% of each dim)."""
    lo = events.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    umin, umax, vmin, vmax = lo
    du, dv = (umax - umin) / 10, (vmax - vmin) / 10
    return [
        {
            "user_id": (umin + i * 3 * du, umin + (i * 3 + 1) * du),
            "value": (vmin + j * 3 * dv, vmin + (j * 3 + 1) * dv),
        }
        for i in range(3)
        for j in range(3)
    ]


def test_cluster_write_preserves_content_and_plan(spark, tmp_path):
    events = load_table(spark, SF, "events")
    out = str(tmp_path / "z")
    cluster_write(events, out, COLS, n_files=8)
    back = spark.read.parquet(out)
    assert back.columns == events.columns
    assert back.exceptAll(events).count() == 0 and events.exceptAll(back).count() == 0

    # One shuffle (the range partition); no global Sort node after it.
    zdf, z = zorder_key(events, COLS)
    plan = (
        zdf.withColumn("_zkey", z)
        .repartitionByRange(8, "_zkey")
        .sortWithinPartitions("_zkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange rangepartitioning") == 1
    # Sort node's second arg false = partition-local sort, not a global sort.
    assert "Sort [_zkey" in plan and "], false, 0" in plan


def test_zorder_skipping_beats_arrival_order(spark, tmp_path):
    """Identical rows, identical predicates — the clustered layout lets a
    min/max-pruning reader skip the large majority of row groups while the
    arrival-order layout skips almost nothing."""
    events = load_table(spark, SF, "events")
    arrival, clustered = str(tmp_path / "arrival"), str(tmp_path / "clustered")
    # Arrival order: round-robin into the same number of files (what a plain
    # append of unsorted micro-batches produces).
    events.repartition(8).write.mode("overwrite").parquet(arrival)
    cluster_write(events, clustered, COLS, n_files=8)

    preds = _boxes(events)
    f_arrival = prunable_fraction(rowgroup_stats(arrival, COLS), preds)
    f_clustered = prunable_fraction(rowgroup_stats(clustered, COLS), preds)
    # The claim of the module, measured from the actual footers.
    assert f_clustered >= 0.6, (f_arrival, f_clustered)
    assert f_clustered >= f_arrival + 0.4, (f_arrival, f_clustered)

    # And the result of a boxed query is identical on both layouts.
    (ulo, uhi), (vlo, vhi) = preds[0]["user_id"], preds[0]["value"]
    box = (
        (F.col("user_id") >= ulo)
        & (F.col("user_id") <= uhi)
        & (F.col("value") >= vlo)
        & (F.col("value") <= vhi)
    )
    a = spark.read.parquet(arrival).filter(box)
    c = spark.read.parquet(clustered).filter(box)
    assert a.exceptAll(c).count() == 0 and c.exceptAll(a).count() == 0


def test_optimize_table_compacts_and_clusters(spark, tmp_path):
    """OPTIMIZE ZORDER over a micro-batch-appended partitioned lake: file
    count drops to target, rows survive byte-identically, and the measured
    prunable fraction jumps — append-order layout in, clustered layout out."""
    from datalakejson_spark.plans.compact import optimize_table, partition_file_stats

    events = load_table(spark, SF, "events").withColumn(
        "mode", F.when(F.col("user_id") % 2 == 0, "a").otherwise("b")
    )
    lake = str(tmp_path / "lake")
    # Six small unsorted appends per partition — what an ingest loop leaves.
    for i in range(6):
        events.filter(F.col("event_id") % 6 == i).write.mode("append").partitionBy(
            "mode"
        ).parquet(lake)

    n_before = spark.read.parquet(lake).count()
    part_a = f"{lake}/mode=a"
    files_before, _ = partition_file_stats(part_a)
    skip_before = prunable_fraction(
        rowgroup_stats(part_a, COLS), _boxes(events)
    )

    # Small target size so the tiny test partition still yields several
    # files — at the real 128 MB default a 100 KB partition would collapse
    # to one file/row group and there'd be no skipping granularity to measure.
    res = optimize_table(spark, lake, zorder_cols=COLS, target_file_bytes=8 * 1024)
    assert all(res.values()) and len(res) == 2

    after = spark.read.parquet(lake)
    assert after.count() == n_before
    # Content identical to the source rows the six appends wrote.
    assert after.select(*events.columns).exceptAll(events).count() == 0
    files_after, _ = partition_file_stats(part_a)
    assert files_after < files_before
    skip_after = prunable_fraction(rowgroup_stats(part_a, COLS), _boxes(events))
    assert skip_after >= skip_before + 0.3, (skip_before, skip_after)


def test_zorder_key_rejects_non_numeric_columns(spark):
    """Clear fail-fast instead of an opaque mid-compaction TypeError when a
    cluster column is non-numeric or all NULL."""
    import pytest

    events = load_table(spark, SF, "events")
    with pytest.raises(ValueError, match="event_type"):
        zorder_key(events, ["event_type"])
    with pytest.raises(ValueError, match="user_id"):
        zorder_key(events.limit(0), ["user_id"])


def test_prunable_fraction_missing_stats_is_unprunable():
    """A row group without statistics (stats disabled, or min/max None for
    all-null chunks) must count as unprunable — not raise KeyError."""
    groups = [
        {"file": "a", "row_group": 0, "stats": {"user_id": (0, 10)}},  # no 'value'
        {"file": "a", "row_group": 1, "stats": {"user_id": (100, 200), "value": (0.0, 1.0)}},
        {"file": "a", "row_group": 2, "stats": {"user_id": (None, None), "value": (None, None)}},
    ]
    preds = [{"user_id": (50, 60), "value": (5.0, 6.0)}]
    # Group 0: user_id disjoint -> pruned (missing 'value' never consulted
    # because the loop breaks, but reordering must not crash either).
    # Group 1: user_id disjoint -> pruned. Group 2: no stats -> kept.
    assert prunable_fraction(groups, preds) == 2 / 3
    # Predicate on a column with stats missing everywhere: nothing pruned.
    assert prunable_fraction(groups, [{"missing_col": (0, 1)}]) == 0.0
