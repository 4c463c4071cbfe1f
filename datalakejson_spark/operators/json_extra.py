"""JSON function completions (F3): json_tuple multi-extraction and to_json
re-serialization — the engine's JSON round-trip surface beyond
get_json_object/from_json (which f3_* cover).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table


@register(
    "f3c_json_tuple_roundtrip",
    survey="F3",
    extended=True,  # F3 covered in the driver tier by f3/p6/f6
    sql="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           to_json(struct_pack(event_id := event_id, event_type := event_type,
                               k := CAST(json_extract_string(props, '$.k') AS BIGINT))
                  )::VARCHAR AS reserialized
    FROM events
    WHERE event_id < 400
    """,
)
def f3c_json_tuple_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple extraction + to_json re-serialization. Both engines emit
    compact key-ordered-as-declared JSON, so the strings compare byte-equal
    (pinned by the oracle)."""
    events = load_table(spark, sf_dir, "events")
    with_k = events.filter(F.col("event_id") < 400).select(
        "event_id",
        "event_type",
        F.json_tuple("props", "k").alias("k_str"),
    )
    return with_k.select(
        "event_id",
        "k_str",
        F.to_json(
            F.struct(
                F.col("event_id"),
                F.col("event_type"),
                F.col("k_str").cast("bigint").alias("k"),
            )
        ).alias("reserialized"),
    )
