"""Window functions (SURVEY.md §2.5) — Tier B, justified by the "Complex
feature engineering / Direct DataFrame manipulation" consumption surface
(diagram_1.txt:105-106) and the ANSI SQL surface (diagram_1.txt:99).

Determinism contract: every ORDER BY inside a window ends with a unique key
(event_id / orderkey+linenumber) so ranking and frame results are identical
across engines regardless of physical row order.

Scale: each window is one shuffle on its partition key; consecutive windows
share the same partitioning where possible so Spark reuses the exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datalakejson_spark.operators.deterministic import dwin_sum, dwin_sum_sql
from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# W1: ranking functions
# --------------------------------------------------------------------------
@register(
    "w1_ranking",
    survey="W1",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def w1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per priority class."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --------------------------------------------------------------------------
# W2: lag / lead / first / last
# --------------------------------------------------------------------------
@register(
    "w2_lag_lead",
    survey="W2",
    # promoted to the driver tier in r12 (seat rotation: W2 had never had a
    # driver-green row; j10 covers J10, not lag/lead)
    sql="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER w AS first_value,
           value - coalesce(lag(value) OVER w, value) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY date_trunc('microseconds', ts), event_id)
    """,
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-sequence features: previous/next/first value and delta."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_v = F.lag("value").over(w)
    return events.select(
        "event_id",
        "user_id",
        "value",
        lag_v.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
        (F.col("value") - F.coalesce(lag_v, F.col("value"))).alias("delta"),
    )


# --------------------------------------------------------------------------
# W3 + W4: running aggregate (row frame) + trailing time-range frame
# --------------------------------------------------------------------------
@register(
    "w3_running_sum",
    survey="W3,W4",
    sql=f"""
    SELECT o_custkey, o_orderkey, o_totalprice,
           {dwin_sum_sql('o_totalprice', '''(
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')}
               AS lifetime_spend,
           count(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq,
           count(*) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_orders_30d
    FROM orders
    """,
)
def w3_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-spend running total (W3, ROWS frame) plus a trailing
    30-day order count (W4, RANGE frame over epoch days) — classic training-
    label features. The cumulative sum goes through a DECIMAL accumulator:
    windowed double sums are association-order-dependent (DuckDB uses segment
    trees) and would drift in the last ULP otherwise. Both windows partition
    by o_custkey, so Spark reuses one exchange for the two sorts."""
    orders = load_table(spark, sf_dir, "orders")
    # r16 (guide §5): both windows parse inside ONE selectExpr (the
    # Window-builder + .over() chains cost ~40 ms of py4j round-trips per
    # build). Same frames, same expressions: the ROWS frame pair shares one
    # exchange+sort exactly as before, and the RANGE frame's epoch-day key
    # (CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) = epoch seconds,
    # double-divided then floored) is the identical expression tree.
    rows_over = (
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    range_over = (
        "(PARTITION BY o_custkey"
        " ORDER BY floor(CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) / 86400)"
        " RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)"
    )
    return orders.selectExpr(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        f"{dwin_sum_sql('o_totalprice', rows_over)} AS lifetime_spend",
        f"count(*) OVER {rows_over} AS order_seq",
        f"count(*) OVER {range_over} AS n_orders_30d",
    )


# --------------------------------------------------------------------------
# W4: time-based range frame (sliding 1h feature)
# --------------------------------------------------------------------------
@register(
    "w4_time_range_frame",
    survey="W4",
    # promoted to the driver tier in r15 (seat rotation, VERDICT r14 #7):
    # the dedicated time-RANGE-frame carrier; W4 previously rode only w3
    sql=f"""
    SELECT event_id, user_id,
           {dwin_sum_sql('value', '''(
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)''')} AS sum_1h,
           count(*) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_1h
    FROM events
    """,
)
def w4_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour activity per user via a RANGE frame over epoch seconds
    (SURVEY §2.5 W4 mapping). Range frames aggregate ties together, so the
    epoch-seconds tie handling matches across engines without a unique key."""
    events = load_table(spark, sf_dir, "events")
    epoch_s = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s)
        .rangeBetween(-3600, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        dwin_sum("value", w).alias("sum_1h"),
        F.count("*").over(w).alias("n_1h"),
    )


# --------------------------------------------------------------------------
# W5: top-N per group
# --------------------------------------------------------------------------
@register(
    "w5_topn_per_group",
    survey="W5,W1",
    sql="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey
    )
    WHERE rn <= 3
    """,
)
def w5_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment: rank + filter. Spark pushes the rn<=3
    filter into the window sort (WindowGroupLimit) so each partition keeps
    only 3 rows — the scalable top-N-per-key pattern."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        joined.select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# W1b: two-phase distributed ranking — the scale path for low-cardinality
# window partitions (r6; the sf10 bench decade exposed w1 at exponent 1.26)
# --------------------------------------------------------------------------
def two_phase_ranking(
    df: DataFrame,
    part_cols: list[str],
    order_exprs: list,
    num_chunks: int = 64,
) -> DataFrame:
    """Distributed ``row_number`` over low-cardinality window partitions.

    ``Window.partitionBy(k)`` puts EVERY row of one key on ONE task: with 5
    priority classes, sf10's 15M orders sort in exactly 5 single-threaded
    tasks (visible in the stage view; measured on-box: 9.7s at sf10 and the
    worst decade-2 scaling of the headline set). 32 local cores mask most
    of the damage — a 1000-executor cluster would leave 995 idle, and one
    key's rows must FIT one task. This operator restores parallelism and
    bounds per-task size with the classic two-phase
    scheme: ``repartitionByRange`` over (partition keys + order keys) gives
    globally range-ordered chunks; a local window per (chunk, key) ranks
    within each chunk in parallel; per-chunk counts (a tiny aggregate,
    chunks x keys rows) are prefix-summed and broadcast back as offsets.
    global row_number = local row_number + offset of earlier chunks.

    ``order_exprs`` must end with a unique tiebreaker (the repo-wide window
    determinism contract) — which also makes rank() and dense_rank() equal
    to row_number(), so this one primitive covers the W1 ranking family;
    ntile follows arithmetically (see w1b). Non-unique orderings would need
    a distinct-value rank table on top; not required anywhere in §2.

    Output: the input columns plus ``rn`` (int) and ``_part_total`` (per-key
    row count, for ntile arithmetic); ``num_chunks`` bounds the parallelism
    and the offset-table size (chunks never need to exceed cluster cores)."""
    rep = df.repartitionByRange(num_chunks, *part_cols, *order_exprs).withColumn(
        "_chunk", F.spark_partition_id()
    )
    # CORRECTNESS-CRITICAL materialization: three subtrees (counts, totals,
    # the ranked branch) each contain this range exchange, and Spark does
    # not reuse it here — three executions of a SAMPLED partitioner can
    # draw different chunk boundaries, making the offsets disagree with
    # the local ranks (caught by the sf1 cross-engine sweep as a
    # nondeterministic off-by-small rn shift; sf0.01 fit one chunk and
    # masked it). A lazy localCheckpoint pins one materialized chunking
    # that every branch reads. At cluster scale this is one extra write of
    # the data being ranked — the price of a consistent global order.
    rep = rep.localCheckpoint(eager=False)
    counts = rep.groupBy("_chunk", *part_cols).agg(F.count("*").alias("_cnt"))
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_chunk",
        *part_cols,
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
    )
    totals = counts.groupBy(*part_cols).agg(F.sum("_cnt").alias("_part_total"))
    w_local = Window.partitionBy("_chunk", *part_cols).orderBy(*order_exprs)
    return (
        rep.withColumn("_rn_local", F.row_number().over(w_local))
        .join(F.broadcast(offsets), ["_chunk", *part_cols])
        .join(F.broadcast(totals), list(part_cols))
        .withColumn("rn", (F.col("_rn_local") + F.col("_off")).cast("int"))
        .drop("_chunk", "_rn_local", "_off")
    )


def exact_ntile(rn, total, n: int):
    """SQL-exact NTILE(n) from a global row_number and the partition row
    count: the first ``total % n`` buckets take ``total div n + 1`` rows,
    the rest ``total div n`` (ISO SQL / Spark / DuckDB all agree)."""
    q = F.floor(total / n)
    r = total % n
    big = q + 1
    return (
        F.when(rn <= r * big, F.floor((rn - 1) / big) + 1)
        .otherwise(r + F.floor((rn - 1 - r * big) / F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )


@register(
    "w1b_distributed_ranking",
    survey="W1",
    extended=True,
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def w1b_distributed_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w1's ranking family via two_phase_ranking — IDENTICAL semantics and
    oracle to w1_ranking, but parallelism num_chunks x keys instead of one
    task per priority class. The ordering's unique tiebreaker (o_orderkey)
    makes rank/dense_rank coincide with row_number; ntile(4) is derived
    arithmetically from (rn, partition total). Measured on-box A/B
    (best-of-3, noop sink): sf10 6.2s vs w1's 9.7s (and 5 running tasks vs
    34-64 in the sort stages); at sf1 the two extra broadcast joins make it
    SLOWER (1.6s vs 1.0s) — this is the >=10M-rows-per-key path, not a
    universal replacement. The structural win is parallelism num_chunks x
    keys vs exactly-keys: on a real cluster w1 caps at 5 busy cores forever
    while w1b scales with the executor count (SCALE.md)."""
    orders = load_table(spark, sf_dir, "orders")
    ranked = two_phase_ranking(
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"),
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
    )
    return ranked.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "rn",
        F.col("rn").alias("rnk"),
        F.col("rn").alias("drnk"),
        exact_ntile(F.col("rn"), F.col("_part_total"), 4).alias("quartile"),
    )
