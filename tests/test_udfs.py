"""UDF-surface tests (D1-D5) and multimodal plumbing tests (L5)."""

from __future__ import annotations

import pyspark.sql.functions as F

from datalakejson_spark.functions.multimodal import (
    ASSET_SCHEMA,
    extract_features,
    frame_sample_plan,
    read_binary_assets,
)
from datalakejson_spark.functions.udfs import (
    add_group_minmax_scaled,
    classify_priority_udf,
    discounted_charge,
    interquartile_range,
    tokenize_mapinpandas,
    zscore_clip,
)

SF = "/root/testdata/sf0.001"


def test_d1_row_udf(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = orders.select(classify_priority_udf()("o_orderpriority").alias("c"))
    vals = {r.c for r in out.distinct().collect()}
    assert vals <= {"rush", "standard"} and len(vals) == 2


def test_d2_scalar_pandas_udf_matches_builtin(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    both = li.select(
        discounted_charge("l_extendedprice", "l_discount", "l_tax").alias("udf_v"),
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("builtin_v"),
    )
    # same IEEE ops elementwise → bit-identical
    assert both.filter(F.col("udf_v") != F.col("builtin_v")).count() == 0


def test_d2_zscore_clip_bounds(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select("value")
    out = ev.select(zscore_clip("value").alias("z"))
    mx = out.agg(F.max(F.abs("z"))).first()[0]
    assert mx <= 3.0


def test_d3_grouped_agg_iqr(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    out = (
        li.groupBy("l_returnflag")
        .agg(interquartile_range("l_quantity").alias("iqr"))
        .collect()
    )
    assert all(0 < r.iqr < 50 for r in out)


def test_d4_apply_in_pandas_scaling(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = add_group_minmax_scaled(orders, "o_orderpriority", "o_totalprice")
    stats = out.groupBy("o_orderpriority").agg(
        F.min("scaled").alias("lo"), F.max("scaled").alias("hi")
    )
    for r in stats.collect():
        assert r.lo == 0.0 and r.hi == 1.0
    assert out.count() == orders.count()


def test_d5_map_in_pandas_tokenize(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = tokenize_mapinpandas(docs)
    n_tokens_udf = toks.count()
    n_tokens_builtin = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).first()[0]
    assert n_tokens_udf == n_tokens_builtin
    # positions are dense per doc
    first = toks.filter(F.col("position") == 0).count()
    assert first == docs.count()


def test_l5_binary_asset_pipeline(spark, tmp_path):
    # synthesize opaque "media" files
    for i in range(3):
        (tmp_path / f"img_{i}.png").write_bytes(bytes([i]) * (100 + i))
    assets = read_binary_assets(spark, str(tmp_path), glob="*.png")
    feats = extract_features(assets)
    rows = feats.collect()
    assert len(rows) == 3
    assert all(r.decoded_ok and r.n_bytes >= 100 and len(r.feat) == 8 for r in rows)
    # deterministic stub: same payload → same features
    again = {r.asset_id: r.feat for r in extract_features(assets).collect()}
    assert all(again[r.asset_id] == r.feat for r in rows)


def test_l5_frame_sampling_plan(spark):
    assets = spark.createDataFrame(
        [("v1", "video", None, (None, None, 3500, "h264"))], ASSET_SCHEMA
    )
    frames = frame_sample_plan(assets, every_ms=1000)
    assert [r.frame_ts_ms for r in frames.collect()] == [0, 1000, 2000, 3000]
