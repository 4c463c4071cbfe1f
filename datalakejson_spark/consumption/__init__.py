"""Consumption plane: batch-feeding the curated lake to ML training.

The reference declares this surface in diagram3:135 ("Integration with
PyTorch/TensorFlow (e.g., via Petastorm, Dask, Ray Data)") and
diagram3:138-143 ("Reads large datasets in batches from `curated-data-lake/`
(leveraging S3, Parquet, and partitioning) ... Supports distributed
training"). :mod:`datalakejson_spark.consumption.feed` is the Spark-first
re-expression: shard-partitioned parquet export plus a partition-pruned,
deterministic Arrow record-batch iterator.
"""

from datalakejson_spark.consumption.feed import (  # noqa: F401
    ShardFeed,
    export_shards,
    shard_manifest,
)
