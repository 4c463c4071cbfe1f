"""Scalar function families (SURVEY.md §2.8).

F1 date/time, F2 string, F3 JSON, F4 math, F5 array/higher-order,
F7 conditional. All stay inside whole-stage codegen — no Python UDFs in any
of these paths (UDFs are reserved for the §2.11 surface where built-ins
genuinely can't express the op).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table, spread_scan


# --------------------------------------------------------------------------
# F1: date/time functions
# --------------------------------------------------------------------------
@register(
    "f1_datetime_functions",
    survey="F1",
    sql="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           dayofmonth(o_orderdate) AS dom,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(o_orderdate AS DATE) AS order_date,
           datediff('day', o_orderdate, TIMESTAMP '1999-01-01 00:00:00') AS days_to_1999
    FROM orders
    WHERE o_orderkey <= 2000
    """,
)
def f1_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/dayofmonth are the reference's partition-key derivations
    (sudo_code.txt:253-255); date_trunc/datediff/to_date complete the declared
    SQL surface (diagram_1.txt:99)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz").alias("month_start"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.datediff(
            F.lit("1999-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_1999"),
    )


# --------------------------------------------------------------------------
# F2: string functions
# --------------------------------------------------------------------------
@register(
    "f2_string_functions",
    survey="F2",
    sql="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substr(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           trim('  padded  ') AS trimmed,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits
    FROM customer
    """,
)
def f2_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface (diagram_1.txt:99): case, substring, length, concat,
    trim, regexp_extract. The reference's own string op is the prefix rewrite
    (P12, sudo_code.txt:200)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat(
            F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")
        ).alias("seg_nation"),
        F.trim(F.lit("  padded  ")).alias("trimmed"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
    )


# --------------------------------------------------------------------------
# F3: JSON functions (the engine's core domain)
# --------------------------------------------------------------------------
@register(
    "f3_json_extraction",
    survey="F3",
    sql="""
    -- sum(BIGINT) is HUGEINT in DuckDB (→ float64 via fetchdf); cast back to
    -- BIGINT so the driver's dtype-sensitive hash matches Spark's sum.
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           min(json_extract_string(props, '$.k')) AS min_k_str
    FROM events
    GROUP BY 1
    """,
)
def f3_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-level JSON parsing is the engine's core domain (PERMISSIVE scan,
    sudo_code.txt:155-157). Here: path extraction from the JSON-string
    ``props`` column + typed aggregation. ``get_json_object`` runs JVM-side
    (Jackson) inside codegen.

    r15: ``$.k`` is projected ONCE per row before the aggregate — referencing
    the extraction inside two aggregate functions parsed the JSON document
    twice per row. The adaptive repartition (guide §2.5) parallelizes the
    parse across cores when the fixture's single-row-group scan would pin it
    to one task; it is a no-op on real-scale inputs (measured 1.24×)."""
    events = spread_scan(load_table(spark, sf_dir, "events"), "event_id")
    projected = events.select(
        "event_type", F.get_json_object("props", "$.k").alias("k")
    )
    return projected.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("k").cast("bigint")).alias("sum_k"),
        F.min("k").alias("min_k_str"),
    )


@register(
    "f3_from_json_struct",
    survey="F3",
    extended=True,  # F3 covered in the driver tier by f3_json_extraction + f6
    sql="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    WHERE event_id <= 500
    """,
)
def f3_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` with an explicit schema — the typed-struct path our ingest
    transform uses for known nested fields (psuedo_code.txt:279-284)."""
    events = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return (
        events.filter(F.col("event_id") <= 500)
        .select("event_id", parsed.getField("k").alias("k_value"))
    )


# --------------------------------------------------------------------------
# F4: math functions
# --------------------------------------------------------------------------
@register(
    "f4_math_functions",
    survey="F4",
    sql="""
    -- DuckDB floor/ceil return DOUBLE; Spark F.floor/F.ceil return BIGINT.
    -- Cast the oracle side to BIGINT for the driver's dtype-sensitive hash.
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - l_quantity * 1000.0) AS abs_spread,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           sqrt(l_quantity) AS qty_sqrt,
           l_orderkey % 7 AS key_mod,
           power(1.0 + l_discount, 2.0) AS disc_sq
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def f4_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-engineering arithmetic (diagram_1.txt:105): abs/floor/ceil/
    sqrt/pow/% plus native column arithmetic. (No transcendental functions in
    the oracle-checked set: libm last-ULP behavior differs across engines;
    sqrt and pow-by-2 are IEEE-exact.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000.0).alias("abs_spread"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.pow(1.0 + F.col("l_discount"), 2.0).alias("disc_sq"),
    )


# --------------------------------------------------------------------------
# F5: array functions + explode (token expansion)
# --------------------------------------------------------------------------
@register(
    "f5_explode_tokens",
    survey="F5,L4",
    extended=True,  # F5 covered in the driver tier by f5_higher_order/f5c/f5d
    sql="""
    SELECT token, count(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    )
    GROUP BY token
    HAVING count(*) >= 50
    """,
)
def f5_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → explode → frequency count: the UDTF-style row expansion over
    preserved complex columns (psuedo_code.txt:284) and the backbone of the
    Tier C token pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= 50)
    )


@register(
    "f5_higher_order_array",
    survey="F5",
    sql="""
    SELECT vec_id,
           len(embedding) AS dim,
           list_aggregate([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding],
                          'sum') AS sq_norm,
           list_aggregate([CAST(x AS DOUBLE) for x in embedding if x > 0],
                          'count') AS n_positive
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def f5_higher_order_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter/aggregate) over the
    embedding vectors — all JVM-side, no UDF. Elements are cast float→double
    before arithmetic so both engines accumulate identically."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_norm = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n_pos = F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint")
    return emb.filter(F.col("vec_id") < 100).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        sq_norm.alias("sq_norm"),
        n_pos.alias("n_positive"),
    )


# --------------------------------------------------------------------------
# F7: conditional / null handling
# --------------------------------------------------------------------------
@register(
    "f7_conditional",
    survey="F7",
    sql="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debtor'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier,
           coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS segment_alias,
           CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal ELSE -c_acctbal END AS signed_bal
    FROM customer
    """,
)
def f7_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif — the status-classification logic shape of
    the archive loop (sudo_code.txt:202-224) as relational expressions."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debtor")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("AUTOMOBILE")), F.lit("CAR")).alias(
            "segment_alias"
        ),
        F.when(F.col("c_nationkey") % 2 == 0, F.col("c_acctbal"))
        .otherwise(-F.col("c_acctbal"))
        .alias("signed_bal"),
    )
