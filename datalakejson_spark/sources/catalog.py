"""Catalog integration (SURVEY.md §2.1 S9).

Reference parity: the Glue Data Catalog holds the curated table's evolving
schema, auto-updated on write (psuedo_code.txt:27, diagram3:120-124);
``saveAsTable`` creates/updates it (psuedo_code.txt:330) and partitions are
surfaced for pruning (diagram3:133). Spark's session catalog plays the Glue
role: external parquet tables with hive-style partitions, refreshed with
``recoverPartitions`` (MSCK REPAIR analogue) after each append, and the
schema widened to the union on evolution (ALTER-free: re-register reads the
merged schema).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datalakejson_spark.session import configure_runtime

DEFAULT_DB = "datalake"


def register_curated_table(
    spark: SparkSession,
    curated_dir: str,
    table: str = "curated_records",
    database: str = DEFAULT_DB,
    partition_cols: tuple[str, ...] = ("year", "month", "day", "mode"),
) -> str:
    """Register (or refresh) the curated lake as an external partitioned
    table. Returns the fully-qualified name. Idempotent: drops and
    re-creates the *metadata* only — data files are untouched — so the
    registered schema always equals the current union-of-schemas."""
    configure_runtime(spark)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    fq = f"{database}.{table}"
    merged = spark.read.option("mergeSchema", "true").parquet(curated_dir)
    data_cols = [f for f in merged.schema.fields if f.name not in partition_cols]
    part_fields = [f for f in merged.schema.fields if f.name in partition_cols]
    cols_ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in data_cols)
    parts_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in part_fields
    )
    spark.sql(f"DROP TABLE IF EXISTS {fq}")
    spark.sql(
        f"CREATE TABLE {fq} ({cols_ddl}) USING PARQUET "
        f"PARTITIONED BY ({parts_ddl}) LOCATION '{curated_dir}'"
    )
    # MSCK REPAIR: discover the hive-layout partition directories
    spark.sql(f"MSCK REPAIR TABLE {fq}")
    return fq


def save_as_managed_table(
    df: DataFrame,
    table: str,
    database: str = DEFAULT_DB,
    partition_cols: tuple[str, ...] = (),
    mode: str = "append",
) -> str:
    """The reference's ``saveAsTable`` path (psuedo_code.txt:330): managed
    table, catalog auto-updated on write."""
    spark = df.sparkSession
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    fq = f"{database}.{table}"
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.saveAsTable(fq)
    return fq


def table_partitions(spark: SparkSession, fq_table: str) -> DataFrame:
    """Partition inventory for pruning-aware consumers (diagram3:133)."""
    return spark.sql(f"SHOW PARTITIONS {fq_table}")
