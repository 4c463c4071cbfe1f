"""Measured before/after evidence for small-file compaction (plans/compact.py).

Synthesizes the pathology compaction exists for — a curated lake whose
micro-batch appends left 1000+ tiny parquet files across hive partitions —
then compacts and measures: file count, full-scan wall time (count +
aggregate over a data column, the file-open-bound shape), and row identity.
Prints one JSON line for SCALE.md.

Usage: python tools/compaction_curve.py [n_files_target]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def scan_time(spark, path: str) -> float:
    """Full-scan wall time: count + sum over a data column, best-of-3.
    Clears the file-listing cache first so listing cost is billed."""
    import pyspark.sql.functions as F

    reps = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.time()
        df = spark.read.parquet(path)
        df.agg(F.count("*"), F.sum("v")).collect()
        reps.append(time.time() - t0)
    return min(reps)


def main() -> None:
    import pyspark.sql.functions as F

    from datalakejson_spark.plans.compact import (
        compact,
        list_partition_dirs,
        partition_file_stats,
    )
    from datalakejson_spark.session import get_spark

    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1280
    spark = get_spark("compaction-curve")
    root = tempfile.mkdtemp(prefix="compact_curve_")
    curated = f"{root}/curated"

    # 8 partitions × (n_target/8) files each, ~60k rows total: the shape a
    # few weeks of micro-batch appends produce.
    n_parts = 8
    files_per_part = n_target // n_parts
    rows = spark.range(60_000).select(
        (F.col("id") % n_parts).alias("day"),
        F.col("id").alias("k"),
        (F.rand(seed=7) * 100).alias("v"),
    )
    (
        rows.repartition(files_per_part)
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(curated)
    )

    parts = list_partition_dirs(curated)
    before_files = sum(partition_file_stats(p)[0] for p in parts)
    before_rows = spark.read.parquet(curated).count()
    before_checksum = spark.read.parquet(curated).agg(
        F.expr("bit_xor(xxhash64(k, v, day))")
    ).collect()[0][0]
    before_scan = scan_time(spark, curated)

    t0 = time.time()
    compact(spark, curated)
    compact_sec = time.time() - t0

    after_files = sum(partition_file_stats(p)[0] for p in parts)
    after_rows = spark.read.parquet(curated).count()
    after_checksum = spark.read.parquet(curated).agg(
        F.expr("bit_xor(xxhash64(k, v, day))")
    ).collect()[0][0]
    after_scan = scan_time(spark, curated)

    assert after_rows == before_rows, (before_rows, after_rows)
    assert after_checksum == before_checksum, "row content changed"
    print(
        json.dumps(
            {
                "before_files": before_files,
                "after_files": after_files,
                "before_scan_sec": round(before_scan, 3),
                "after_scan_sec": round(after_scan, 3),
                "speedup": round(before_scan / after_scan, 2),
                "compact_sec": round(compact_sec, 2),
                "rows": before_rows,
                "row_identity": True,
            }
        )
    )
    spark.stop()
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
