"""Multimodal column plumbing (SURVEY.md §2.12 L5).

Images/audio/video are opaque ``BinaryType`` payloads with a typed metadata
struct, read via ``spark.read.format("binaryFile")`` or carried as columns in
parquet. The Spark-side plumbing — schemas, partition-friendly layout,
Arrow-batched UDF signatures — is real and tested; the actual codec work is
STUBBED (``decode_stub``) because media libraries are not in this container:
swap ``_decode_image_stub`` for PIL/libvips/ffmpeg calls in production, the
dataflow is unchanged.

Scale notes: media blobs are large and incompressible — never a shuffle key,
never broadcast. The pattern is: derive features per-partition (mapInPandas),
keep the blob column pruned away from every downstream join (feature tables
carry only ``asset_id``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "asset_id string, media_type string, n_bytes long, sha256 string, "
    "decoded_ok boolean, feat array<float>"
)


def read_binary_assets(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile scan (S-family source for L5): one row per file with
    (path, modificationTime, length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.col("path").alias("asset_id"),
            F.element_at(F.split("path", r"\."), -1).alias("media_type"),
            F.col("content").alias("payload"),
        )
    )


def _decode_image_stub(payload: bytes) -> list[float] | None:
    """STUB for the codec step (PIL/torchvision not available here).

    Deterministic fake: 8 floats derived from the sha256 digest — stands in
    for a real decode→resize→embed pipeline while keeping every Spark-side
    contract (nullability, fixed-width output) honest. Raise
    NotImplementedError here instead if silent fakes are unacceptable."""
    if payload is None:
        return None
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas:
    bounded memory per batch, no blob ever shuffles)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, hashes, sizes = [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    oks.append(False)
                    hashes.append(None)
                    sizes.append(0)
                    continue
                raw = bytes(payload)
                feats.append(_decode_image_stub(raw))
                oks.append(True)
                hashes.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": sizes,
                    "sha256": hashes,
                    "decoded_ok": oks,
                    "feat": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each asset into (asset_id,
    frame_ts_ms) rows from metadata duration — the decode of each frame is
    the stubbed step. JVM-side sequence(), so the expansion never touches
    Python."""
    return assets.filter(F.col("media_type") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
