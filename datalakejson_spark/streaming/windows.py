"""Event-time windowed aggregation (SURVEY.md §2.10 T4/T5/T6).

The reference's consumption plane analyzes timestamped rows
(psuedo_code.txt:275 event_time_utc); these are the standard event-time
windows over the ``events`` fixture. The same expressions run unchanged under
Structured Streaming (readStream → groupBy(window(...)) → writeStream);
the batch registrations here are what the DuckDB oracle can check.

Window alignment: Spark tumbling windows align to the 1970 epoch; DuckDB
``time_bucket`` aligns 10-minute buckets identically (2000-01-03 origin is a
multiple of 10 minutes from the epoch), so boundaries agree.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.operators.deterministic import ds, dsum_sql
from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table


@register(
    "t4_tumbling_window",
    survey="T4",
    sql=f"""
    SELECT time_bucket(INTERVAL '10 minutes', date_trunc('microseconds', ts))
               AS window_start,
           event_type,
           count(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def t4_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling event-time windows per event type."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "10 minutes").start.cast("timestamp_ntz").alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), ds("value").alias("sum_value"))
    )


@register(
    "t5_sliding_window",
    survey="T5",
    sql=f"""
    SELECT window_start, count(*) AS n_events, {dsum_sql('value')} AS sum_value
    FROM (
        SELECT time_bucket(INTERVAL '10 minutes', date_trunc('microseconds', ts))
                   AS window_start, value
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '10 minutes', date_trunc('microseconds', ts))
                   - INTERVAL '10 minutes' AS window_start, value
        FROM events
    )
    GROUP BY 1
    """,
)
def t5_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-minute windows sliding every 10 minutes: each event lands in exactly
    two windows. The oracle expresses the same assignment as a union of two
    shifted tumbling buckets."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "20 minutes", "10 minutes")
            .start.cast("timestamp_ntz")
            .alias("window_start")
        )
        .agg(F.count("*").alias("n_events"), ds("value").alias("sum_value"))
    )


_T6_SQL = f"""
    WITH e AS (
        SELECT user_id, date_trunc('microseconds', ts) AS ts, value FROM events
    ),
    flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         < INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_sess
        FROM e
    ),
    numbered AS (
        SELECT user_id, ts, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           user_id,
           count(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM numbered
    GROUP BY user_id, sess_id
"""


@register("t6_session_window", survey="T6", sql=_T6_SQL)
def t6_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap — Spark's
    native session_window. The oracle expresses the same merge semantics via
    the gaps-and-islands pattern: a session break is a gap >= the 30-minute
    timeout (session_window's [ts, ts+gap) intervals are end-exclusive, so
    a gap of exactly 30:00 starts a new session); session end = last event
    + gap, matching session_window.end."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), ds("value").alias("sum_value"))
        .select(
            F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_window.end").cast("timestamp_ntz").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
