"""Second coverage sweep: LIKE-family predicates, null-safe equality, array
algebra, unpivot/melt, explode_outer, and two more TPC-H consumption shapes
(conditional aggregation and ratio-of-sums)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.operators.deterministic import dsum_sql, ds
from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table


@register(
    "p13_like_predicates",
    survey="P10,F2",
    extended=True,  # P10/F2 covered in the driver tier
    sql="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE 'SMALL%'
      AND p_name NOT LIKE '%grey%'
      AND lower(p_brand) LIKE 'brand#1_'
    """,
)
def p13_like_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / NOT LIKE / single-char wildcard predicates (pushed to the scan
    as StringStartsWith/StringContains where the pattern allows)."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").like("SMALL%")
        & ~F.col("p_name").like("%grey%")
        & F.lower("p_brand").like("brand#1_")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "f7b_null_safe_equality",
    survey="F7",
    extended=True,  # F7 covered in the driver tier by f7/p2
    sql="""
    SELECT a.event_id AS event_id,
           (nullif(a.event_type, 'error') IS NOT DISTINCT FROM
            nullif(a.props, a.props)) AS both_null_check,
           (a.value IS NOT DISTINCT FROM a.value) AS self_eq
    FROM events a
    WHERE a.event_id < 100
    """,
)
def f7b_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM): NULL<=>NULL is true,
    NULL<=>x is false — the semantics JOIN keys with nulls need."""
    events = load_table(spark, sf_dir, "events")
    lhs = F.nullif("event_type", F.lit("error"))
    rhs = F.nullif("props", F.col("props"))  # always NULL
    return events.filter(F.col("event_id") < 100).select(
        "event_id",
        lhs.eqNullSafe(rhs).alias("both_null_check"),
        F.col("value").eqNullSafe(F.col("value")).alias("self_eq"),
    )


@register(
    "f5e_array_algebra",
    survey="F5,U3",
    extended=True,  # F5/U3 covered in the driver tier
    sql="""
    WITH t AS (
        SELECT doc_id,
               list_distinct(string_split(text, ' ')) AS vocab
        FROM documents WHERE doc_id < 10
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           len(list_filter(a.vocab, x -> NOT list_contains(b.vocab, x)))
               AS n_only_a,
           len(list_filter(a.vocab, x -> list_contains(b.vocab, x)))
               AS n_shared,
           list_contains(a.vocab, 'the') AS has_the
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    """,
)
def f5e_array_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: except/intersect/contains over vocabularies
    (array_except|intersect are order-unstable across engines, so the oracle
    compares CARDINALITIES — the set-semantic content)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    t = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("vocab")
    )
    a = t.select(F.col("doc_id").alias("doc_a"), F.col("vocab").alias("va"))
    b = t.select(F.col("doc_id").alias("doc_b"), F.col("vocab").alias("vb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_except("va", "vb")).alias("n_only_a"),
            F.size(F.array_intersect("va", "vb")).alias("n_shared"),
            F.array_contains("va", "the").alias("has_the"),
        )
    )


@register(
    "g9b_unpivot",
    survey="G3,G6,U2",
    extended=True,  # G3/G6/U2 covered in the driver tier
    sql="""
    SELECT c_custkey, metric, val FROM (
        SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
        UNION ALL
        SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val
        FROM customer
    )
    WHERE c_custkey <= 200
    """,
)
def g9b_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt wide→long via Spark's unpivot API (plans the same
    Expand the oracle's UNION ALL spells out — one scan, not one per
    metric)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return (
        cust.withColumn("nationkey_d", F.col("c_nationkey").cast("double"))
        .withColumnRenamed("c_acctbal", "acctbal")
        .withColumnRenamed("nationkey_d", "nationkey")
        .unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")
    )


@register(
    "f5f_explode_outer",
    survey="F5,J5",
    extended=True,  # F5/J5 covered in the driver tier
    sql="""
    WITH t AS (
        SELECT event_id,
               CASE WHEN event_type = 'error' THEN []
                    ELSE string_split(event_type, '') END AS chars
        FROM events WHERE event_id < 50
    )
    SELECT event_id, CASE WHEN len(chars) = 0 THEN NULL ELSE unnested END AS ch
    FROM (SELECT event_id, chars, unnest(
              CASE WHEN len(chars) = 0 THEN [NULL] ELSE chars END) AS unnested
          FROM t)
    """,
)
def f5f_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: empty arrays keep their parent row with NULL (plain
    explode would drop it) — the outer-join flavor of row expansion."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 50)
    chars = F.when(F.col("event_type") == "error", F.array().cast("array<string>")).otherwise(
        F.split("event_type", "")
    )
    return events.select(
        "event_id", F.explode_outer(chars).alias("ch")
    )


_Q12_SQL = """
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice >= 150000) AS BIGINT) AS n_high,
           CAST(count_if(o_totalprice < 150000) AS BIGINT) AS n_low
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_linenumber = 1
    GROUP BY 1
"""


@register("q12_priority_shipping", survey="J3,G1,G3,F7", extended=True, sql=_Q12_SQL)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape: join + conditional counts per class."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    return (
        orders.join(
            li.filter(
                (F.col("l_shipdate") >= lo)
                & (F.col("l_shipdate") < hi)
                & (F.col("l_linenumber") == 1)
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_totalprice") >= 150000).alias("n_high"),
            F.count_if(F.col("o_totalprice") < 150000).alias("n_low"),
        )
    )


_Q14_SQL = f"""
    SELECT round(100.0 * {dsum_sql("CASE WHEN p_type LIKE 'SMALL%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
                 / {dsum_sql('l_extendedprice * (1 - l_discount)')}, 6) AS small_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


@register("q14_promo_ratio", survey="J3,J4,G3,F7", extended=True, sql=_Q14_SQL)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: ratio of conditional revenue to total — one
    aggregation, broadcast part dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    lo = F.lit("1996-03-01").cast("timestamp_ntz")
    hi = F.lit("1996-04-01").cast("timestamp_ntz")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    small_rev = F.when(F.col("p_type").like("SMALL%"), rev).otherwise(F.lit(0.0))
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * ds(small_rev) / ds(rev), 6).alias("small_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
# U4: EXCEPT ALL / INTERSECT ALL (multiplicity-preserving set ops)
# --------------------------------------------------------------------------
_U4_SQL = """
    WITH a AS (SELECT event_type, user_id % 10 AS bucket FROM events
               WHERE event_id <= 6000),
         b AS (SELECT event_type, user_id % 10 AS bucket FROM events
               WHERE event_id > 4000)
    SELECT event_type, bucket, count(*) AS n FROM (
        SELECT * FROM a EXCEPT ALL SELECT * FROM b
    ) GROUP BY 1, 2
"""


@register("u4_except_intersect_all", survey="U3,G3", extended=True, sql=_U4_SQL)
def u4_except_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicity-preserving set difference (``EXCEPT ALL`` /
    ``exceptAll``): each duplicate survives max(n_a - n_b, 0) times — the
    bag semantics U3's DISTINCT variants erase. Planned as one aggregate
    over a union with signed counts (no join), which is exactly how you'd
    hand-write it at scale; the overlapping event_id slices make both
    multiplicity directions non-trivial."""
    events = load_table(spark, sf_dir, "events")
    bucket = (F.col("user_id") % 10).alias("bucket")
    a = events.filter(F.col("event_id") <= 6000).select("event_type", bucket)
    b = events.filter(F.col("event_id") > 4000).select("event_type", bucket)
    return a.exceptAll(b).groupBy("event_type", "bucket").agg(
        F.count("*").alias("n")
    )


# --------------------------------------------------------------------------
# F10: regexp_extract_all + flatten (multi-match extraction)
# --------------------------------------------------------------------------
_F10_SQL = """
    WITH m AS (
        SELECT doc_id, unnest(regexp_extract_all(text, 's[a-z]+')) AS tok
        FROM documents WHERE doc_id < 200
    )
    SELECT tok, count(*) AS n_matches, count(DISTINCT doc_id) AS n_docs
    FROM m GROUP BY 1
"""


@register("f10_regexp_extract_all", survey="F2,F5,G3", extended=True, sql=_F10_SQL)
def f10_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match regex extraction (every s-initial token) exploded and
    aggregated — the log-mining shape (pull all matches, not just the
    first). The extraction runs inside codegen; the only shuffle is the
    final bounded aggregate. The pattern sticks to character classes +
    literals, the regex subset Java and RE2-family engines agree on."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    m = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit("s[a-z]+"), 0)).alias("tok"),
    )
    return m.groupBy("tok").agg(
        F.count("*").alias("n_matches"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


# --------------------------------------------------------------------------
# F11: error-safe (try_) arithmetic and casts
# --------------------------------------------------------------------------
_F11_SQL = """
    SELECT event_type,
           CAST(SUM(CASE WHEN user_id % 7 = 0 THEN NULL
                         ELSE CAST(floor(event_id / (user_id % 7)) AS BIGINT)
                    END) AS BIGINT) AS sum_safe_div,
           CAST(count_if(try_cast(props AS INT) IS NULL) AS BIGINT)
               AS n_uncastable
    FROM events
    GROUP BY 1
"""


@register("f11_try_arithmetic", survey="F4,F7,E1", extended=True, sql=_F11_SQL)
def f11_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression semantics: ``try_divide`` returns NULL on
    division by zero and ``try_cast`` NULL on malformed input instead of
    failing the task — the row-level analogue of PERMISSIVE-mode scans
    (E1): bad values degrade to NULL and flow into aggregates that skip
    them, no task retry storms at 100 TB. The oracle encodes the identical
    NULL-on-error contract with guarded CASE / try_cast."""
    events = load_table(spark, sf_dir, "events")
    safe_div = F.try_divide(F.col("event_id"), F.col("user_id") % 7)
    return events.groupBy("event_type").agg(
        F.sum(F.floor(safe_div).cast("bigint")).cast("bigint").alias("sum_safe_div"),
        F.count_if(F.expr("try_cast(props AS INT)").isNull())
        .cast("bigint")
        .alias("n_uncastable"),
    )
