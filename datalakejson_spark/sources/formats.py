"""Additional source/sink formats (S-family generalization).

The reference's lake is JSON-in / Parquet-out; real deployments also land
CSV drops and exchange ORC. Both get the same contracts the JSON path has:
PERMISSIVE parsing with corrupt-record capture for text formats, and
schema-merged reads for columnar ones. The ingest plane is format-agnostic
above the reader — swap ``read_csv_permissive`` into ``ingest_batch``'s scan
and everything downstream (DLQ, transform, partitioned append) is unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datalakejson_spark.session import configure_runtime

CORRUPT_COL = "_corrupt_record"


def read_csv_permissive(
    spark: SparkSession,
    paths: list[str] | str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV scan with the JSON path's corrupt-record contract (S1 analogue):
    malformed lines land whole in ``_corrupt_record`` instead of failing the
    read. CSV cannot infer reliably at scale, so the schema is required.

    Caller note (applies to all PERMISSIVE text scans): persist the frame
    before running queries that reference only ``_corrupt_record`` — Spark
    rejects corrupt-column-only queries on raw scans."""
    configure_runtime(spark)
    if CORRUPT_COL not in [f.name for f in schema.fields]:
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(paths)
        .withColumn("source_s3_path", F.input_file_name())
    )


def write_columnar(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_cols: tuple[str, ...] = (),
    mode: str = "append",
) -> None:
    """Columnar sink (parquet or orc) with optional hive partitioning —
    the S6 sink generalized over format."""
    writer = df.write.mode(mode).format(fmt)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def read_columnar(
    spark: SparkSession, path: str, fmt: str = "parquet", merge_schema: bool = True
) -> DataFrame:
    """Columnar scan with schema-union semantics (S8 generalized; ORC
    supports mergeSchema like parquet)."""
    configure_runtime(spark)
    return (
        spark.read.format(fmt)
        .option("mergeSchema", str(merge_schema).lower())
        .load(path)
    )
