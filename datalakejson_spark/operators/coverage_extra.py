"""Coverage completions for SURVEY.md §2: outer-join variants (J5), map
functions (F6), extended datetime surface (F1), global sort (O2), union-all
(U2) — the rows of the inventory not already carried by another query."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table


@register(
    "j5b_full_outer_join",
    survey="J5,F7",
    extended=True,  # J5 covered in the driver tier by j5
    sql="""
    SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
           coalesce(cn.n_customers, 0) AS n_customers,
           coalesce(sn.n_suppliers, 0) AS n_suppliers
    FROM (SELECT CAST(c_nationkey AS INTEGER) AS nationkey, count(*) AS n_customers
          FROM customer GROUP BY 1) cn
    FULL OUTER JOIN
         (SELECT CAST(s_nationkey AS INTEGER) AS nationkey, count(*) AS n_suppliers
          FROM supplier GROUP BY 1) sn
      ON cn.nationkey = sn.nationkey
    """,
)
def j5b_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER (SQL surface, diagram_1.txt:99): customer vs supplier
    presence per nation, either side may be missing."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    cn = customer.groupBy(
        F.col("c_nationkey").cast("int").alias("nationkey")
    ).agg(F.count("*").alias("n_customers"))
    sn = supplier.groupBy(
        F.col("s_nationkey").cast("int").alias("nationkey")
    ).agg(F.count("*").alias("n_suppliers"))
    return (
        cn.join(sn, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "f6_map_functions",
    survey="F6,F3",
    sql="""
    SELECT event_id,
           (map {'type': event_type, 'user': CAST(user_id AS VARCHAR)})['type'][1]
               AS m_type,
           cardinality(map {'type': event_type, 'user': CAST(user_id AS VARCHAR)})
               AS m_size
    FROM events
    WHERE event_id < 300
    """,
)
def f6_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction + element access + cardinality (Tier C JSON-object
    modeling, SURVEY §2.8 F6). Output is scalars so the comparison is
    map-representation-agnostic."""
    events = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return events.filter(F.col("event_id") < 300).select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.size(m).alias("m_size"),
    )


@register(
    "f1b_datetime_extended",
    survey="F1",
    extended=True,  # F1 covered in the driver tier by f1
    sql="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
           CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS review_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
           dayofweek(o_orderdate) + 1 AS dow,
           quarter(o_orderdate) AS qtr,
           weekofyear(o_orderdate) AS woy
    FROM orders
    WHERE o_orderkey <= 1500
    """,
)
def f1b_datetime_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended datetime surface: interval arithmetic (date_add/add_months),
    last_day, epoch seconds, dayofweek/quarter/weekofyear.

    Semantics notes pinned by the oracle: DuckDB DATE + INTERVAL MONTH
    saturates to month end exactly like Spark add_months; dayofweek is
    0=Sunday in DuckDB vs 1=Sunday in Spark (oracle shifts by one);
    weekofyear is ISO in both."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.filter(F.col("o_orderkey") <= 1500).select(
        "o_orderkey",
        F.date_add(d, 30).alias("due_date"),
        F.add_months(d, 3).alias("review_date"),
        F.last_day(d).alias("month_end"),
        F.col("o_orderdate").cast("timestamp").cast("long").alias("epoch_s"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekofyear("o_orderdate").alias("woy"),
    )


@register(
    "o2_global_sort_rank",
    survey="O2,W1",
    extended=True,  # O2 covered in the driver tier by g3_flagship
    sql="""
    SELECT rank_overall, s_suppkey, s_name, s_acctbal FROM (
        SELECT row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rank_overall,
               s_suppkey, s_name, s_acctbal
        FROM supplier
    )
    """,
)
def o2_global_sort_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global total order made value-visible via a rank column (a bare ORDER
    BY is invisible to an order-insensitive compare). Spark executes a
    range-partitioned sort; the empty-frame window collapses to one
    partition — acceptable for dimension-sized inputs only."""
    from pyspark.sql import Window

    supplier = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return supplier.select(
        F.row_number().over(w).alias("rank_overall"),
        "s_suppkey",
        "s_name",
        "s_acctbal",
    )


@register(
    "u2b_union_all",
    survey="U2",
    extended=True,  # U2 covered in the driver tier by u2
    sql="""
    SELECT kind, count(*) AS n FROM (
        SELECT 'c' AS kind, CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
        UNION ALL
        SELECT 's' AS kind, CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
    )
    GROUP BY 1
    """,
)
def u2b_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) vs U2's UNION (set semantics)."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    u = customer.select(
        F.lit("c").alias("kind"), F.col("c_nationkey").cast("int").alias("nationkey")
    ).union(
        supplier.select(
            F.lit("s").alias("kind"), F.col("s_nationkey").cast("int").alias("nationkey")
        )
    )
    return u.groupBy("kind").agg(F.count("*").alias("n"))
