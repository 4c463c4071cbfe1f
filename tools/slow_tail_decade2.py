"""Decade-2 scaling exponents for the L-family slow tail.

The headline sf10 table (SCALE.md) covers the 12 bench headliners; the
queries most likely to hide a super-linear term are the L-family scale
paths (LSH/simhash/clustering/decontamination/incremental dedup/ANN) and
the two-phase ranking. This runner times each at sf1 AND sf10
(best-of-2 steady-state, after one warm-up rep) and prints the per-query
decade-2 exponent log10(t_sf10/t_sf1).

Usage: python tools/slow_tail_decade2.py [sf1_dir] [sf10_dir]
Defaults: /tmp/datalakejson_sf1, /tmp/datalakejson_sf10 (generated via
tools/make_scaled_sf.py if missing).
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

SLOW_TAIL = [
    "l7c_decontamination_lsh",
    "l7b_embedding_decontamination",
    "l2f_simhash_pairs",
    "l2g_verified_neardup_pairs",
    "l15_incremental_dedup",
    "l2e_dedup_clusters",
    "l3b_ann_lsh_topk",
    "l3c_ann_ivf_topk",
    "w1b_distributed_ranking",
    "l19_line_boilerplate",
    "l20_within_doc_line_dedup",
    "l21_repetition_signals",
    "l19b_line_boilerplate_newlines",
    "l21b_repetition_signals_newlines",
    "l22_quality_gate",
    "l22b_quality_gate_newlines",
]


def main() -> None:
    from make_scaled_sf import make_scaled_sf

    from datalakejson_spark.registry import all_specs
    from datalakejson_spark.session import get_spark

    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/datalakejson_sf1"
    sf10_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/datalakejson_sf10"
    base = "/root/testdata/sf0.1"
    make_scaled_sf(base, sf1_dir, 10)
    make_scaled_sf(base, sf10_dir, 100)

    spark = get_spark("slow-tail-decade2")
    specs = all_specs()
    out = {}
    log_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/slow_tail_decade2.jsonl"
    log = open(log_path, "a", buffering=1)  # line-buffered: survives a kill
    for name in SLOW_TAIL:
        fn = specs[name].fn
        row = {}
        # sf1: warm-up rep (codegen) + best-of-2 steady; sf10: the warm-up
        # already happened at sf1 (same plan), so warm-up + 1 is enough and
        # keeps the slowest queries (~100s+/rep at sf10) affordable.
        for label, d, n_reps in (("sf1", sf1_dir, 3), ("sf10", sf10_dir, 2)):
            reps = []
            for _ in range(n_reps):
                t0 = time.time()
                fn(spark, d).write.mode("overwrite").format("noop").save()
                reps.append(time.time() - t0)
            row[label] = round(min(reps[1:]), 3)
        row["exponent"] = round(
            math.log10(max(row["sf10"], 0.001) / max(row["sf1"], 0.001)), 2
        )
        out[name] = row
        log.write(json.dumps({name: row}) + "\n")
        print(json.dumps({name: row}), flush=True)
    log.write(json.dumps({"slow_tail_decade2": out}) + "\n")
    print(json.dumps({"slow_tail_decade2": out}))
    spark.stop()


if __name__ == "__main__":
    main()
