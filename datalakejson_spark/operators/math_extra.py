"""Math/comparison completions (F4): greatest/least, sign, truncation,
integer division, bitwise operators."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table


@register(
    "f4b_math_extended",
    survey="F4,F7",
    extended=True,  # F4/F7 covered in the driver tier by f4/f7
    sql="""
    -- DuckDB sign() returns TINYINT; Spark signum() returns DOUBLE — cast.
    SELECT l_orderkey, l_linenumber,
           greatest(l_quantity, l_discount * 100.0) AS g,
           least(l_tax, l_discount) AS l,
           CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS spread_sign,
           CAST(l_extendedprice AS BIGINT) // 1000 AS price_k,
           l_orderkey & 255 AS key_low_byte,
           l_orderkey | 1 AS key_odd,
           xor(l_orderkey, l_partkey) AS key_xor,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod
    FROM lineitem
    WHERE l_orderkey <= 500
    """,
)
def f4b_math_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """greatest/least, sign, truncating integer division, bitwise and/or/xor,
    modulo — the arithmetic long tail. (DuckDB `//` is floor division on
    BIGINT; Spark `div` matches for the non-negative values here.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") <= 500).select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100.0).alias("g"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("l"),
        F.signum(F.col("l_extendedprice") - 30000.0).alias("spread_sign"),
        F.expr("CAST(l_extendedprice AS BIGINT) div 1000").alias("price_k"),
        F.col("l_orderkey").bitwiseAND(255).alias("key_low_byte"),
        F.col("l_orderkey").bitwiseOR(1).alias("key_odd"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("key_xor"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
    )
