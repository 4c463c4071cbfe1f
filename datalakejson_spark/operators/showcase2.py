"""Showcase consumption queries, part 2: TPC-H Q6/Q18/Q19 shapes —
selective scan-aggregate, having-subquery semi join, and disjunctive
multi-column predicates."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.operators.deterministic import ds, dsum_sql
from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table


_Q6_SQL = f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
"""


@register("q6_forecast_revenue", survey="G3,P11,F4", extended=True, sql=_Q6_SQL)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6 shape: pure scan-side predicates feeding one global
    aggregate — everything pushes down; the job reduces a filtered scan
    with no shuffle beyond the final single-row combine."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            ds(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


_Q18_SQL = f"""
    SELECT c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           o_totalprice,
           {dsum_sql('l_quantity')} AS total_qty
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 210
    )
    GROUP BY c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
"""


@register("q18_large_volume_customers", survey="J3,J6,G3", extended=True, sql=_Q18_SQL)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: IN-subquery over a grouped HAVING — planned as an
    aggregate + semi join, then the main star join re-aggregates."""
    for name in ("orders", "customer", "lineitem"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q18_SQL)


_Q19_PRED = """
    (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 30)
    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 45 AND l_quantity BETWEEN 20 AND 40)
"""

_Q19_SQL = f"""
    SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE {_Q19_PRED}
"""


@register("q19_disjunctive_predicates", survey="J3,J4,F7,P10", extended=True, sql=_Q19_SQL)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape: OR-of-ANDs across both join sides. Catalyst extracts
    the common join key and pushes the per-side conjuncts below the join
    where possible; the part side broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def band(brand: str, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    pred = (
        band("Brand#12", 15, 1, 21)
        | band("Brand#23", 30, 10, 30)
        | band("Brand#34", 45, 20, 40)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(pred)
        .agg(
            ds(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )
