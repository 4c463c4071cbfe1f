"""Semi-structured VARIANT surface (Spark 4 native) for the JSON lake.

The reference engine's core domain is JSON records of unknown/evolving shape
(psuedo_code.txt:186-193: PERMISSIVE scan + corrupt-record segregation;
SURVEY.md §1.3: inferred + evolving schema). Spark 4's ``VariantType`` is the
idiomatic modernization of that data model: instead of forcing every record
through one inferred struct schema (where a new field means re-inference and
an old reader drops data), the open-ended tail of the record is kept as a
binary-encoded variant column that

- round-trips through parquet losslessly (variant has a parquet logical type),
- is path-addressable JVM-side (``variant_get`` runs inside whole-stage
  codegen — no Python, no Jackson-per-row UDF),
- carries per-row type information (``schema_of_variant``) so schema drift is
  observable instead of fatal.

Everything here is built-in-function composition — zero UDFs. Oracle parity:
DuckDB has no VARIANT type, so every query extracts to *typed* columns
(bigint/string) and the oracle does the same with ``json_extract`` — the
comparison is over the typed results, which is exactly what a consumer sees.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# F9: parse_json -> variant_get typed extraction + aggregation
# --------------------------------------------------------------------------
@register(
    "f9_variant_extraction",
    survey="F3,F9",
    # driver tier (r5): the VARIANT surface's hard driver-green signal —
    # took the slot of the fully-redundant j8_cross_join
    sql="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def f9_variant_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The variant rewrite of f3_json_extraction: parse once into a variant,
    then typed path extraction (``variant_get`` with a target type) feeding a
    grouped aggregate. Against a string column ``get_json_object`` re-parses
    per path; a variant parses once and serves every path from the binary
    encoding — the difference matters when one record feeds many extractions.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# --------------------------------------------------------------------------
# F9b: deep-path extraction over heterogeneous nested structure
# --------------------------------------------------------------------------
@register(
    "f9b_variant_nested_paths",
    survey="F3,F9",
    extended=True,
    sql="""
    WITH built AS (
        SELECT event_id,
               to_json(struct_pack(
                   event_id := event_id,
                   info := struct_pack(t := event_type, u := user_id),
                   ids := [user_id, event_id]
               )) AS js
        FROM events WHERE event_id <= 2000
    )
    SELECT event_id,
           json_extract_string(js, '$.info.t') AS info_type,
           CAST(json_extract(js, '$.info.u') AS BIGINT) AS info_user,
           CAST(json_extract(js, '$.ids[1]') AS BIGINT) AS second_id
    FROM built
    """,
)
def f9b_variant_nested_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep-path addressing (``$.info.t``, ``$.ids[1]``) through objects and
    arrays inside one variant. The nested document is constructed in-query
    (``to_json(struct(...))`` -> ``parse_json``) so the oracle can build the
    identical document with DuckDB ``struct_pack`` — the assertion is that
    both engines agree on every extracted path over 2,000 nested records."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    js = F.to_json(
        F.struct(
            F.col("event_id"),
            F.struct(
                F.col("event_type").alias("t"), F.col("user_id").alias("u")
            ).alias("info"),
            F.array("user_id", "event_id").alias("ids"),
        )
    )
    v = F.parse_json(js)
    return events.select(
        "event_id",
        F.variant_get(v, "$.info.t", "string").alias("info_type"),
        F.variant_get(v, "$.info.u", "bigint").alias("info_user"),
        F.variant_get(v, "$.ids[1]", "bigint").alias("second_id"),
    )


# --------------------------------------------------------------------------
# F9c: try_parse_json malformed-record audit (E1 semantics, variant-native)
# --------------------------------------------------------------------------
@register(
    "f9c_variant_malformed_audit",
    survey="F9,E1",
    extended=True,
    sql="""
    WITH tainted AS (
        SELECT event_type,
               CASE WHEN event_id % 13 = 0 THEN '}' ELSE '' END || props AS raw
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN json_valid(raw) THEN 0 ELSE 1 END) AS BIGINT)
               AS n_corrupt,
           CAST(SUM(CASE WHEN json_valid(raw)
                    THEN CAST(json_extract(raw, '$.k') AS BIGINT) ELSE 0
               END) AS BIGINT) AS sum_k_good
    FROM tainted
    GROUP BY event_type
    """,
)
def f9c_variant_malformed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant-native corrupt-record segregation (psuedo_code.txt:192-197
    splits on ``_corrupt_record``): ``try_parse_json`` yields NULL for
    malformed input instead of failing the scan, so the good/bad split and
    the DLQ count become one expression — no PERMISSIVE re-read. Corruption
    is injected deterministically (every 13th record gets a stray LEADING
    brace — leading, because Spark's Jackson-based parser accepts trailing
    garbage after a complete value while DuckDB's json_valid rejects it) so
    the oracle reproduces the same taint with string concat + json_valid."""
    events = load_table(spark, sf_dir, "events")
    raw = F.concat(
        F.when(F.col("event_id") % 13 == 0, F.lit("}")).otherwise(F.lit("")),
        F.col("props"),
    )
    v = F.try_parse_json(raw)
    good_k = F.variant_get(v, "$.k", "bigint")
    return events.select(F.col("event_type"), v.alias("v"), good_k.alias("k")).groupBy(
        "event_type"
    ).agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_corrupt"),
        F.sum(F.when(F.col("v").isNotNull(), F.col("k")).otherwise(0)).alias(
            "sum_k_good"
        ),
    )
