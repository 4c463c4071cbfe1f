"""Extended string-function surface (F2 completion): padding, repetition,
reversal, character translation, boolean match predicates, field splitting."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.registry import register
from datalakejson_spark.sources.tables import load_table


@register(
    "f2b_string_extended",
    survey="F2",
    extended=True,  # F2 covered in the driver tier by f2/p12/o3
    sql="""
    SELECT n_nationkey,
           lpad(n_name, 20, '.') AS padded,
           repeat(substr(n_name, 1, 2), 3) AS repeated,
           reverse(n_name) AS reversed,
           translate(n_name, 'aeiou', '_____') AS devoweled,
           contains(n_name, 'an') AS has_an,
           starts_with(n_name, 'un') AS starts_un,
           ends_with(n_name, 'a') AS ends_a,
           split_part(n_name, 'a', 1) AS first_field,
           ascii(n_name) AS first_code,
           left(n_name, 3) AS l3,
           right(n_name, 3) AS r3
    FROM nation
    """,
)
def f2b_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad/repeat/reverse/translate/contains/starts_with/ends_with/
    split_part/ascii/left/right — the long tail of the F2 surface, one row
    per nation so every function's output is directly inspectable."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.lpad("n_name", 20, ".").alias("padded"),
        F.repeat(F.substring("n_name", 1, 2), 3).alias("repeated"),
        F.reverse("n_name").alias("reversed"),
        F.translate("n_name", "aeiou", "_____").alias("devoweled"),
        F.contains("n_name", F.lit("an")).alias("has_an"),
        F.startswith("n_name", F.lit("un")).alias("starts_un"),
        F.endswith("n_name", F.lit("a")).alias("ends_a"),
        F.split_part("n_name", F.lit("a"), F.lit(1)).alias("first_field"),
        F.ascii("n_name").alias("first_code"),
        F.substring("n_name", 1, 3).alias("l3"),
        F.expr("right(n_name, 3)").alias("r3"),
    )
