"""Subquery operators via the SQL entry path (SURVEY.md §3.3).

The consumption plane is declared as ad-hoc ANSI SQL (diagram_1.txt:98-101);
these queries exercise Spark's SQL parser → Catalyst subquery rewrites
(EXISTS/IN → semi join, NOT EXISTS → anti join, correlated scalar subquery →
decorrelated aggregate+join; SURVEY.md §4 classic-rewrites checklist) rather
than hand-built DataFrame joins. Fixture tables are registered as temp views
on the fly, mirroring the catalog consumption pattern (S9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.operators.deterministic import davg_sql
from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "sq1_exists_semi",
    survey="J6,P10",
    # promoted to the driver tier in r12 (seat rotation: subquery-rewrite
    # queries had never had a driver-green row; j2 is the join-API form)
    sql="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def sq1_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → left semi join (Catalyst RewritePredicateSubquery)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        """
    )


@register(
    "sq2_not_in_anti",
    survey="J6",
    extended=True,  # seat rotation r14 (driver seats went to l3f + l22):
    # J6 keeps driver rows via j2 + sq1; the NOT IN null-semantics rewrite
    # stays local-sweep-verified
    sql="""
    SELECT p_partkey, p_brand
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
    """,
)
def sq2_not_in_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-nullable key → null-aware anti join."""
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_brand
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
        """
    )


_SQ3 = f"""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT {davg_sql('c_acctbal')} FROM customer)
"""


@register("sq3_scalar_subquery", survey="G3,F7", extended=True, sql=_SQ3)
def sq3_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: customers above global mean balance.
    (Deterministic avg, so the threshold is bit-identical across engines.)"""
    _views(spark, sf_dir, "customer")
    return spark.sql(_SQ3)


_SQ4 = f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 2.0 * (
        SELECT {davg_sql('o2.o_totalprice')}
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""


@register("sq4_correlated_scalar", survey="G3,J3", extended=True, sql=_SQ4)
def sq4_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders > 2× their customer's average —
    Catalyst decorrelates to an aggregate + join (RewriteCorrelatedScalarSubquery);
    no per-row re-execution."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_SQ4)


@register(
    "sq5_having",
    survey="G3",
    extended=True,  # G3 covered in the driver tier
    sql="""
    SELECT l_suppkey, count(*) AS n_lines
    FROM lineitem
    GROUP BY 1
    HAVING count(*) > 550
    """,
)
def sq5_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING through the SQL parser."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_suppkey, count(*) AS n_lines
        FROM lineitem
        GROUP BY 1
        HAVING count(*) > 550
        """
    )
