"""Executed-plan SQLMetrics extraction (X10 observability, scale evidence).

Spark publishes per-operator runtime metrics (shuffle bytes, spill sizes,
scan selectivity, peak memory) on the *executed* physical plan. This module
walks that plan after an action and aggregates the numbers a scale review
actually wants — the measured counterpart to PLANS.md's plan *shapes*:

- how many bytes crossed each Exchange (the 100 TB cost center),
- whether anything spilled,
- how selective the pushed-down scan was (rows out of the scan vs file rows),
- peak per-operator memory.

The walk must unwrap AQE's indirection: under adaptive execution the root
is ``AdaptiveSparkPlanExec`` (final tree behind ``.executedPlan()``) and
stage boundaries are ``QueryStageExec`` nodes (subtree behind ``.plan()``);
metrics live on the inner nodes. (A plain ``qe.executedPlan().metrics()``
walk returns only zeros — round-4's failed attempt, STATUS.md.)
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

#: metric keys rolled up per query. shuffle_bytes keys are FALLBACK
#: alternatives (first present wins: shuffleBytesWritten when the exchange
#: reports it, its dataSize estimate otherwise). spill keys are handled
#: separately: they are facets of the same spill event on one node
#: (in-memory size vs compressed on-disk bytes), so the rollup takes the
#: per-node MAX — a conservative byte figure that is nonzero iff anything
#: spilled, which is what the "nothing spills" evidence needs.
_ROLLUP = {
    "shuffle_records": ("shuffleRecordsWritten",),
    "shuffle_bytes": ("shuffleBytesWritten", "dataSize"),
    "scan_rows": ("numOutputRows",),  # only summed on scan nodes
    "scan_files": ("numFiles",),
    "scan_bytes": ("filesSize",),
}
_SPILL_KEYS = ("spillSize", "memoryBytesSpilled", "diskBytesSpilled")


def node_metrics(df: DataFrame) -> list[tuple[str, dict[str, int]]]:
    """(node_name, {metric: value}) for every node of ``df``'s EXECUTED plan.
    Call after an action on ``df`` itself (e.g. ``df.collect()``); a plan
    that never executed reports zeros."""
    out: list[tuple[str, dict[str, int]]] = []

    def visit(node, depth: int) -> None:
        cls = node.getClass().getSimpleName()
        vals: dict[str, int] = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = kv._2().value()
        out.append((node.nodeName(), vals))
        if "AdaptiveSparkPlanExec" in cls:
            visit(node.executedPlan(), depth + 1)
            return
        if "QueryStageExec" in cls:
            visit(node.plan(), depth + 1)
            return
        for i in range(node.children().size()):
            visit(node.children().apply(i), depth + 1)

    visit(df._jdf.queryExecution().executedPlan(), 0)
    return out


def executed_summary(df: DataFrame) -> dict[str, Any]:
    """Aggregate rollup of :func:`node_metrics` — one dict per query for
    METRICS.md / bench extras. ``df`` must already have executed."""
    nodes = node_metrics(df)
    agg = {k: 0 for k in _ROLLUP}
    agg["spill_bytes"] = 0
    n_exchanges = n_broadcasts = 0
    peak_memory = 0
    output_rows = None
    for name, vals in nodes:
        is_scan = name.startswith("Scan")
        is_exchange = name == "Exchange"
        is_broadcast = "BroadcastExchange" in name
        n_exchanges += is_exchange
        n_broadcasts += is_broadcast
        peak_memory = max(peak_memory, vals.get("peakMemory", 0))
        agg["spill_bytes"] += max(vals.get(k, 0) for k in _SPILL_KEYS)
        for out_key, metric_keys in _ROLLUP.items():
            if out_key.startswith("scan_") != is_scan:
                continue
            if out_key in ("shuffle_records", "shuffle_bytes") and not is_exchange:
                continue
            for mk in metric_keys:
                v = vals.get(mk, 0)
                if v > 0:
                    agg[out_key] += v
                    break  # first present key wins (dataSize fallback)
        if output_rows is None and "numOutputRows" in vals and not is_scan:
            # first (topmost) operator with row accounting = result rows
            output_rows = vals["numOutputRows"]
    agg.update(
        n_exchanges=n_exchanges,
        n_broadcasts=n_broadcasts,
        peak_memory_bytes=peak_memory,
        output_rows=output_rows if output_rows is not None else 0,
    )
    return agg
