"""Showcase consumption queries, part 3: TPC-H Q4/Q15/Q21 shapes adapted to
the fixture star schema (no partsupp/receiptdate columns; the operator
composition — exists-with-filter, window-over-aggregate, multi-correlated
exists/not-exists — is preserved)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datalakejson_spark.operators.deterministic import dsum_sql, ds
from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table


_Q4_SQL = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY 1
"""


@register("q4_order_priority_check", survey="J6,G3,P11", extended=True, sql=_Q4_SQL)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: date-windowed orders having at least one late-shipped
    line — correlated EXISTS with a cross-table predicate → semi join."""
    for name in ("orders", "lineitem"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q4_SQL)


_Q15_SQL = f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", survey="G3,J3,O1", extended=True, sql=_Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: aggregate view + max-of-aggregate scalar subquery —
    the revenue CTE is computed once and reused for both the probe and the
    max (Catalyst reuses the subquery result)."""
    for name in ("supplier", "lineitem"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q15_SQL)


_Q21_SQL = """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY 1
"""


@register("q21_waiting_supplier", survey="J6,J3,G3", extended=True, sql=_Q21_SQL)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape: the sole at-fault supplier on multi-supplier orders —
    one correlated EXISTS and one NOT EXISTS against the same fact table,
    planned as a semi join plus an anti join (no per-row subquery
    re-execution)."""
    for name in ("supplier", "lineitem", "orders"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q21_SQL)
