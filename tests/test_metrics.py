"""Executed-plan SQLMetrics extraction (plans/metrics.py): the AQE-aware
walk must surface non-zero runtime metrics (round 4's naive walk saw only
zeros) and the rollup must reflect the known shape of the flagship query."""

from __future__ import annotations

from datalakejson_spark.plans.metrics import executed_summary, node_metrics
from datalakejson_spark.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_metrics_walk_reaches_inner_nodes(spark):
    df = all_specs()["g3_flagship_pricing_summary"].fn(spark, SF)
    df.collect()
    nodes = node_metrics(df)
    names = [n for n, _ in nodes]
    assert any(n.startswith("Scan") for n in names)  # unwrapped past AQE
    assert any(v for _, vals in nodes for v in vals.values())  # non-zero


def test_flagship_summary_shape(spark):
    df = all_specs()["g3_flagship_pricing_summary"].fn(spark, SF)
    df.collect()
    s = executed_summary(df)
    assert s["output_rows"] == 6  # the 6 (returnflag, linestatus) groups
    n_lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert s["scan_files"] >= 1 and s["scan_rows"] == n_lineitem  # full scan
    assert s["n_exchanges"] == 1  # two-phase agg: exactly one shuffle
    assert s["shuffle_records"] > 0 and s["shuffle_bytes"] > 0
    assert s["spill_bytes"] == 0  # nothing spills at test scale
    assert s["peak_memory_bytes"] > 0


def test_star_join_broadcasts_dims(spark):
    df = all_specs()["j3_star_join_revenue"].fn(spark, SF)
    df.collect()
    s = executed_summary(df)
    assert s["n_broadcasts"] >= 1  # dimension chain broadcast, measured
