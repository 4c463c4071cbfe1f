"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <scale factor>}

Each query executes fully via the ``noop`` sink (computes every row, writes
nothing), which is the honest cost of the query without collect()-to-driver
or disk-write noise. Session setup time is excluded; a warm-up query runs
first so JVM/codegen warm-up isn't billed to the first benchmark entry.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from datalakejson_spark.registry import all_specs
from datalakejson_spark.session import get_spark

# Headline set: one representative per operator family, weighted toward the
# queries whose plans matter at 100 TB (wide agg, star join, windows, dedup,
# similarity, JSON extraction, event-time windows).
HEADLINE = [
    "g3_flagship_pricing_summary",  # wide grouped aggregate (TPC-H Q1 shape)
    "j3_star_join_revenue",         # fact-fact shuffle join + broadcast dims
    "j5_left_outer_join",           # outer join + agg
    "g4_count_distinct_users",      # expand + two-phase distinct agg
    "g6_rollup_time_hierarchy",     # grouping sets
    "w1_ranking",                   # window: rank family
    "w3_running_sum",               # window: running frame
    "f3_json_extraction",           # JSON path extraction + agg
    "t4_tumbling_window",           # event-time tumbling window
    "l1_exact_dedup",               # hash dedup
    "l2_minhash_lsh_pairs",         # shingle -> minhash -> LSH bucket join
    "l3_cosine_topk",               # brute-force cosine top-k
]


def run_one(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    spark = get_spark("datalakejson-bench")
    specs = all_specs()

    # Warm-up: touch the biggest table + codegen paths once.
    run_one(spark, specs["g3_flagship_pricing_summary"].fn, sf_dir)

    # Best-of-2: the first execution of a query pays one-time whole-stage
    # codegen compilation (hundreds of ms) that a long-lived session never
    # pays again; min is the steady-state cost.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        first = run_one(spark, specs[name].fn, sf_dir)
        second = run_one(spark, specs[name].fn, sf_dir)
        timings[name] = round(min(first, second), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
