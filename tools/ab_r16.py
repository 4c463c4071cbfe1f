"""Interleaved A/B micro-bench for candidate r16 optimizations.

Same methodology as tools/ab_r15.py (guide §1): variant pairs run in ONE
session, alternating A/B/A/B so position/thermal noise cancels, min-of-N via
the noop sink, and a collect-and-compare equality gate BEFORE timing so a
fast-but-wrong variant can never look good.

Usage: python tools/ab_r16.py <case> [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from datalakejson_spark.registry import all_specs
from datalakejson_spark.session import get_spark
from datalakejson_spark.sources.tables import load_table


def timed(spark, label, fn, sf_dir, reps):
    outs = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        outs.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
    return outs


def rows_equal(spark, a_fn, b_fn, sf_dir) -> None:
    a = a_fn(spark, sf_dir)
    b = b_fn(spark, sf_dir)
    sa = [(f.name, f.dataType) for f in a.schema.fields]
    sb = [(f.name, f.dataType) for f in b.schema.fields]
    assert sa == sb, f"schema mismatch:\nA={a.schema}\nB={b.schema}"

    def k(row):
        return tuple((v is None, v) for v in row)

    ra = sorted(map(tuple, a.collect()), key=k)
    rb = sorted(map(tuple, b.collect()), key=k)
    assert ra == rb, (
        f"rows differ: {len(ra)} vs {len(rb)}; first diff: "
        f"{next(((x, y) for x, y in zip(ra, rb) if x != y), None)}"
    )
    print(f"  results equal ({len(ra)} rows)")


def ab(spark, name, a_fn, b_fn, sf_dir, reps=5, check=True):
    print(f"== {name} @ {sf_dir}")
    if check:
        rows_equal(spark, a_fn, b_fn, sf_dir)
    ta, tb = [], []
    timed(spark, f"{name}:warmA", a_fn, sf_dir, 1)
    timed(spark, f"{name}:warmB", b_fn, sf_dir, 1)
    for _ in range(reps):
        ta += timed(spark, f"{name}:A", a_fn, sf_dir, 1)
        tb += timed(spark, f"{name}:B", b_fn, sf_dir, 1)
    print(f"  A(base): min={min(ta):.3f} all={[round(t, 3) for t in ta]}")
    print(f"  B(opt):  min={min(tb):.3f} all={[round(t, 3) for t in tb]}")
    print(f"  speedup min/min: {min(ta) / min(tb):.2f}x")


# ---------------------------------------------------------------- variants --

from datalakejson_spark.operators.deterministic import SCALE, ds_expr


def _g6_native(spark, sf_dir):
    """Pre-r15 form: native ROLLUP (Expand 3x every input row)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup(
        F.expr("year(l_shipdate)").alias("year"),
        F.expr("month(l_shipdate)").alias("month"),
    ).agg(ds_expr("l_extendedprice").alias("gross"), F.count("*").alias("n_rows"))


def _g6_rollup_over_finest(spark, sf_dir):
    """Candidate: ONE scan structurally (single lineage, no union, no
    reliance on runtime ReusedExchange): aggregate to the finest
    (year, month) grain first — scaled-int sums stay scaled — then a native
    rollup over the ~84-row finest re-derives all three levels. The Expand
    multiplies 84 rows, not the fact table. Bit-identical: integer sums are
    associative, and rollup-of-sums over a grain equal to the rollup's
    finest grouping set reproduces ROLLUP over the raw rows exactly
    (including NULL-shipdate rows, which form their own finest group)."""
    li = load_table(spark, sf_dir, "lineitem")
    finest = li.groupBy(
        F.expr("year(l_shipdate)").alias("year"),
        F.expr("month(l_shipdate)").alias("month"),
    ).agg(
        F.expr(f"sum(CAST(round(l_extendedprice * {SCALE}.0) AS BIGINT))").alias(
            "_gs"
        ),
        F.count("*").alias("_n"),
    )
    return finest.rollup("year", "month").agg(
        (F.sum("_gs").cast("double") / float(SCALE)).alias("gross"),
        F.sum("_n").alias("n_rows"),
    )


def case_g6(spark, sf_dir, reps):
    base = all_specs()["g6_rollup_time_hierarchy"].fn
    ab(spark, "g6 union(r15) vs rollup-over-finest", base,
       _g6_rollup_over_finest, sf_dir, reps)
    ab(spark, "g6 union(r15) vs native rollup", base, _g6_native, sf_dir, reps)
    ab(spark, "g6 native vs rollup-over-finest", _g6_native,
       _g6_rollup_over_finest, sf_dir, reps)


CASES = {"g6": case_g6}


def main():
    case = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("ab-r16")
    CASES[case](spark, sf_dir, reps)
    spark.stop()


if __name__ == "__main__":
    main()
