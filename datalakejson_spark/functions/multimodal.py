"""Multimodal column plumbing (SURVEY.md §2.12 L5).

Images/audio/video are opaque ``BinaryType`` payloads with a typed metadata
struct, read via ``spark.read.format("binaryFile")`` or carried as columns in
parquet. The Spark-side plumbing — schemas, partition-friendly layout,
Arrow-batched UDF signatures — is real and tested; the codec step is GATED
on importability (``decode_image``): Pillow decodes for real where it is
installed, and a clearly-marked deterministic stub (``_decode_image_stub``)
stands in where media libraries are absent (this container). Audio/video
codecs slot into the same gate (ffmpeg), the dataflow is unchanged.

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


def _has_pil() -> bool:
    """Codec availability, probed where the decode actually runs (driver for
    unit calls, each executor's Python worker for mapInPandas batches)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


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


def _decode_image_pil(payload: bytes) -> list[float] | None:
    """Real codec path, used automatically when Pillow is importable:
    decode → RGB → 8-float stat embedding (per-channel mean + std, plus
    log-area and aspect ratio). Undecodable bytes → None (decoded_ok=False
    downstream), never an exception — one bad blob must not fail a batch."""
    import io
    import math

    import numpy as np
    from PIL import Image

    if payload is None:
        return None
    try:
        with Image.open(io.BytesIO(payload)) as img:
            w, h = img.size
            arr = np.asarray(img.convert("RGB"), dtype="float32") / 255.0
    except Exception:  # noqa: BLE001 — corrupt/unsupported media
        return None
    return [
        *(float(m) for m in arr.mean(axis=(0, 1))),
        *(float(s) for s in arr.std(axis=(0, 1))),
        math.log1p(float(w) * float(h)),
        float(w) / float(max(h, 1)),
    ]


def decode_image(payload: bytes, use_pil: bool | None = None) -> list[float] | None:
    """The L5 codec gate (ADVICE r03): Pillow when importable, the
    deterministic stub otherwise; ``use_pil`` forces a branch for tests."""
    use = _has_pil() if use_pil is None else use_pil
    return _decode_image_pil(payload) if use else _decode_image_stub(payload)


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas:
    bounded memory per batch, no blob ever shuffles)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = _has_pil()  # probed once per worker, not per row
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
                feat = decode_image(raw, use_pil=use_pil)
                feats.append(feat)
                oks.append(feat is not None)
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
