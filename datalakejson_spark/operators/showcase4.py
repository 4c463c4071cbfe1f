"""Fourth showcase sweep: the remaining TPC-H shapes expressible over the
fixture star schema (no ``partsupp`` table exists, so Q2/Q9/Q11/Q16/Q20 are
out of reach; Q22's phone-prefix predicate is adapted to nation keys).

All extended-tier: the §2 families they compose (J3/J5/J6/G3/O1/sq) already
have driver rows; these prove the shapes compose at realistic complexity and
are oracle-verified locally each round.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.operators.deterministic import da, davg_sql, ds, dsum_sql
from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# --------------------------------------------------------------------------
# Q5: local-supplier volume — customer and supplier in the SAME nation
# --------------------------------------------------------------------------
_Q5_SQL = f"""
    SELECT n_name AS nation,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY 1
    ORDER BY revenue DESC, nation
"""


@register("q5_local_supplier_volume", survey="J3,J4,G3,O2", extended=True, sql=_Q5_SQL)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5 shape: five-way star join with a same-nation equi-constraint
    between two dimension arms (customer and supplier must co-locate). The
    nation/region arm broadcasts; the fact side shuffles once on the order
    key, then once on the supplier key — the join-order problem Catalyst
    solves from statistics."""
    _views(spark, sf_dir, "customer", "orders", "lineitem", "supplier",
           "nation", "region")
    return spark.sql(_Q5_SQL)


# --------------------------------------------------------------------------
# Q7: volume shipping between two nations, split by year
# --------------------------------------------------------------------------
_Q7_SQL = f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
"""


@register("q7_nation_volume_shipping", survey="J3,J4,G3,F1", extended=True, sql=_Q7_SQL)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: the nation dimension joined TWICE under different
    roles (supplier's vs customer's nation) with a disjunctive cross-pair
    predicate — alias discipline plus broadcast of both tiny arms."""
    _views(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    return spark.sql(_Q7_SQL)


# --------------------------------------------------------------------------
# Q13: customer order-count distribution (zero-order customers included)
# --------------------------------------------------------------------------
_Q13_SQL = """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@register("q13_order_distribution", survey="J5,G3,G1,O2", extended=True, sql=_Q13_SQL)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape: outer join with an ON-clause filter (NOT a WHERE —
    the filter must not turn the outer join inner), then a two-level
    aggregate: per-customer counts, then the histogram of those counts.
    count(o_orderkey) over the null-extended rows yields the zero bucket."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13_SQL)


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue (correlated average subquery)
# --------------------------------------------------------------------------
_Q17_SQL = f"""
    SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
"""


@register("q17_small_quantity_revenue", survey="J3,J4,G3", extended=True, sql=_Q17_SQL)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: correlated scalar average subquery against the same
    fact table, decorrelated by Catalyst into a per-part aggregate joined
    back — never a per-row re-scan. l_quantity is integer-valued, so the
    inner avg is order-independent (exact integer sums in double) and safe
    to compare across engines without the scaled-sum rewrite."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17_SQL)


# --------------------------------------------------------------------------
# Q22: positive-balance customers with no orders (phone prefix → nation key)
# --------------------------------------------------------------------------
_Q22_SQL = f"""
    SELECT c_nationkey AS cntrycode,
           count(*) AS numcust,
           {dsum_sql('c_acctbal')} AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c_acctbal > (
          SELECT {davg_sql('c_acctbal')}
          FROM customer
          WHERE c_acctbal > 0.0
            AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      )
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY 1
    ORDER BY 1
"""


@register("q22_global_sales_opportunity", survey="J1,J6,G3,sq", extended=True,
          sql=_Q22_SQL)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: uncorrelated scalar subquery (the above-average
    balance threshold, broadcast as a literal at runtime) + NOT EXISTS anti
    join against orders. Adapted to the fixture: the phone-prefix predicate
    becomes c_nationkey (no phone column), and "no orders" becomes "no
    URGENT orders" (every fixture customer has orders). The average uses the
    scaled-integer deterministic form — c_acctbal is fractional, and a raw
    double avg would be partition-order-dependent at the comparison
    boundary."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22_SQL)


# --------------------------------------------------------------------------
# Q8: national market share (conditional share-of-total aggregate)
# --------------------------------------------------------------------------
_Q8_SQL = f"""
    SELECT o_year,
           round(
               {dsum_sql("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END")}
               / {dsum_sql('volume')}, 6) AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               sn.n_name AS nation
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN part     ON l_partkey = p_partkey
        WHERE r_name = 'ASIA' AND p_size <= 25
    )
    GROUP BY o_year
    ORDER BY o_year
"""


@register("q8_national_market_share", survey="J3,J4,G3,F7", extended=True, sql=_Q8_SQL)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: one nation's share of regional revenue per year — a
    conditional-sum / total-sum ratio over a seven-table star join with the
    nation dimension in two roles. Both sums ride ONE aggregate (no second
    scan for the denominator)."""
    _views(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region",
           "supplier", "part")
    return spark.sql(_Q8_SQL)
