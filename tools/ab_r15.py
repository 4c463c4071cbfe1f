"""Interleaved A/B micro-bench for candidate r15 optimizations.

Runs variant pairs in ONE session, alternating A/B/A/B (position/thermal
noise cancels), min-of-N via the noop sink — the guide §1 empirical loop.
Also asserts the variant's result EQUALS the original (collect + sorted
compare) before timing, so a fast-but-wrong variant can never look good.

Usage: python tools/ab_r15.py <case> [sf_dir] [reps]
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
    # nullability is invisible to the oracle comparison (pandas dtypes);
    # compare names + types only
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
    # warm both once (codegen), untimed
    timed(spark, f"{name}:warmA", a_fn, sf_dir, 1)
    timed(spark, f"{name}:warmB", b_fn, sf_dir, 1)
    for _ in range(reps):
        ta += timed(spark, f"{name}:A", a_fn, sf_dir, 1)
        tb += timed(spark, f"{name}:B", b_fn, sf_dir, 1)
    print(f"  A(base): min={min(ta):.3f} all={[round(t, 3) for t in ta]}")
    print(f"  B(opt):  min={min(tb):.3f} all={[round(t, 3) for t in tb]}")
    print(f"  speedup min/min: {min(ta) / min(tb):.2f}x")


# ---------------------------------------------------------------- variants --

from datalakejson_spark.functions.dedup import (
    _BAND_EXPRS,
    _SPARK_SHINGLES,
    LANE_HEX,
    LANES_PER_MD5,
    NUM_HASHES,
)


def _numeric_lane_sigs(hashed, id_col):
    """mh lanes as BIGINT mins (HashAggregate-able), converted back to the
    canonical 8-char lowercase hex AFTER the aggregate. min over fixed-width
    lowercase hex == min over its numeric value, so the strings are
    byte-identical to the string-min form."""
    hashed = hashed.withColumn("h2", F.md5("h"))
    pre = hashed.select(
        F.col(id_col),
        *[
            F.conv(
                F.substring(
                    "h" if lane < LANES_PER_MD5 else "h2",
                    1 + LANE_HEX * (lane % LANES_PER_MD5),
                    LANE_HEX,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias(f"n{lane}")
            for lane in range(NUM_HASHES)
        ],
    )
    agg = pre.groupBy(id_col).agg(
        *[F.min(f"n{lane}").alias(f"m{lane}") for lane in range(NUM_HASHES)]
    )
    return agg.select(
        F.col(id_col),
        *[
            F.lpad(F.lower(F.hex(F.col(f"m{lane}"))), LANE_HEX, "0").alias(
                f"mh{lane}"
            )
            for lane in range(NUM_HASHES)
        ],
    )


def _l2_opt(spark, sf_dir, join_hint="shuffle_hash"):
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.col("doc_id"), F.split("text", " ").alias("w"))
    hashed = tok.select(
        F.col("doc_id"),
        F.explode(F.array_distinct(F.expr(_SPARK_SHINGLES))).alias("shingle"),
    ).select(F.col("doc_id"), F.md5("shingle").alias("h"))
    sigs = _numeric_lane_sigs(hashed, "doc_id")
    band_structs = F.array(
        *[
            F.struct(F.lit(band).alias("band"), F.expr(expr).alias("band_hash"))
            for band, expr in _BAND_EXPRS
        ]
    )
    bands = sigs.select(F.col("doc_id"), F.explode(band_structs).alias("bb")).select(
        F.col("doc_id"),
        F.col("bb.band").alias("band"),
        F.col("bb.band_hash").alias("band_hash"),
    )
    a = bands.alias("a").hint(join_hint)
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _l2_opt_groupby(spark, sf_dir):
    """Pair generation via per-bucket sorted-list combinations: no join at
    all — one ObjectHashAggregate on (band, band_hash) + explode + distinct."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.col("doc_id"), F.split("text", " ").alias("w"))
    hashed = tok.select(
        F.col("doc_id"),
        F.explode(F.array_distinct(F.expr(_SPARK_SHINGLES))).alias("shingle"),
    ).select(F.col("doc_id"), F.md5("shingle").alias("h"))
    sigs = _numeric_lane_sigs(hashed, "doc_id")
    band_structs = F.array(
        *[
            F.struct(F.lit(band).alias("band"), F.expr(expr).alias("band_hash"))
            for band, expr in _BAND_EXPRS
        ]
    )
    bands = sigs.select(F.col("doc_id"), F.explode(band_structs).alias("bb")).select(
        F.col("doc_id"),
        F.col("bb.band").alias("band"),
        F.col("bb.band_hash").alias("band_hash"),
    )
    buckets = (
        bands.groupBy("band", "band_hash")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.array_sort("ids").alias("ids"))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2, F.size("ids")),
                        lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def case_l2(spark, sf_dir, reps):
    base = all_specs()["l2_minhash_lsh_pairs"].fn
    ab(spark, "l2 numeric+SHJ", base, lambda s, d: _l2_opt(s, d), sf_dir, reps)
    ab(
        spark,
        "l2 numeric+groupby-pairs",
        base,
        _l2_opt_groupby,
        sf_dir,
        reps,
    )
    ab(
        spark,
        "l2 numeric+SMJ (lanes only)",
        base,
        lambda s, d: _l2_opt(s, d, join_hint="merge"),
        sf_dir,
        reps,
    )


CASES = {"l2": case_l2}


def main():
    case = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("ab-r15")
    CASES[case](spark, sf_dir, reps)
    spark.stop()


if __name__ == "__main__":
    main()
