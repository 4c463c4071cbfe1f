"""Multimodal column plumbing (SURVEY.md §2.12 L5).

Images/audio/video are opaque ``BinaryType`` payloads with a typed metadata
struct, read via ``spark.read.format("binaryFile")`` or carried as columns in
parquet. The Spark-side plumbing — schemas, partition-friendly layout,
Arrow-batched UDF signatures — is real and tested; the codec step is a
THREE-TIER gate (``decode_image``): Pillow where importable (all formats),
a pure-numpy/stdlib decoder tier for PPM/BMP (r5) AND the compressed
PNG (all depths, Adam7) / JPEG (baseline AND progressive) / GIF formats
plus TIFF, uncompressed AND LZW (r6, imagecodecs.py — REAL pixel decode, runs and
is tested in this container), WebP-lossless VP8L (r7, webpcodec.py), and a
clearly-marked deterministic stub only for formats outside that set with no
codec present (lossy-VP8 WebP — whose container metadata is still real,
containers.py).
Audio gains real IMA-ADPCM compressed decode (audiocodecs.py) beside PCM.
Compressed containers (MP4/MP3): the CONTAINER layer — duration, track
dims, codec fourcc, sample counts — is REAL (containers.py parses ISO-BMFF
boxes and MPEG audio frame headers from their public specs); only the inner
H.264/AAC/MP3-granule bitstream decode still needs the ffmpeg/codec gate —
the dataflow is unchanged either way.

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
    "decoded_ok boolean, decode_tier string, feat array<float>"
)

#: decode_tier values — which codec tier produced (or attempted) the row's
#: features, so a consumer can audit/filter fake embeddings downstream:
#: "pil" real decode via Pillow; "numpy" real pure-numpy/stdlib decode
#: (PPM/BMP/PNG/JPEG/GIF/TIFF/WebP-lossless); "stub" deterministic FAKE
#: embedding (format with no codec present); "none" nothing attempted (null
#: payload).
DECODE_TIERS = ("pil", "numpy", "stub", "none")


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
    """STUB for the codec step — reached only for formats outside the real
    numpy tier (PPM/BMP/PNG/JPEG/GIF/TIFF/WebP-lossless), e.g. lossy-VP8
    WebP, when PIL is absent.

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
    return _stat_embedding(arr, w, h)


def _stat_embedding(arr, w: int, h: int) -> list[float]:
    """The shared 8-float stat embedding over an (h, w, 3) float array in
    [0, 1]: per-channel mean + std, log-area, aspect — identical math in the
    PIL and numpy decode tiers, so the embedding does not depend on which
    codec happened to be installed."""
    import math

    return [
        *(float(m) for m in arr.mean(axis=(0, 1))),
        *(float(s) for s in arr.std(axis=(0, 1))),
        math.log1p(float(w) * float(h)),
        float(w) / float(max(h, 1)),
    ]


def _decode_ppm_numpy(payload: bytes):
    """Binary PPM (P6) decode in pure numpy — no media libraries needed.
    Returns (h, w, 3) float array in [0,1], or None for malformed data."""
    import numpy as np

    try:
        if not payload.startswith(b"P6"):
            return None
        # header: P6 <ws> width <ws> height <ws> maxval <single ws> raw RGB
        fields, pos = [], 2
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment to end of line
                pos = payload.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        n = w * h * 3
        raw = payload[pos : pos + n]
        if len(raw) != n or maxval <= 0 or maxval > 255:
            return None
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
        return arr.astype("float32") / float(maxval)
    except Exception:  # noqa: BLE001 — malformed header/payload
        return None


def _decode_bmp_numpy(payload: bytes):
    """Uncompressed 24-bit BMP decode in pure numpy (BITMAPINFOHEADER,
    bottom-up rows, BGR order, rows padded to 4 bytes)."""
    import struct

    import numpy as np

    try:
        if not payload.startswith(b"BM") or len(payload) < 54:
            return None
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if hdr_size < 40 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
            return None
        bottom_up = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4-byte boundaries
        need = data_off + stride * h
        if len(payload) < need:
            return None
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            rows = rows[::-1]
        return rows[:, :, ::-1].astype("float32") / 255.0  # BGR → RGB
    except Exception:  # noqa: BLE001
        return None


def _decode_image_numpy(payload: bytes) -> list[float] | None:
    """Middle codec tier: REAL pixel decode with only numpy + stdlib —
    available in any PySpark worker. Uncompressed formats (PPM P6, 24-bit
    BMP) plus, since r6, the COMPRESSED formats PNG (stdlib zlib DEFLATE +
    numpy unfiltering) and JPEG, baseline + progressive (numpy Huffman/IDCT) via
    imagecodecs.py. A payload that CLAIMS one of these formats but is
    malformed returns None (decoded_ok=False), same contract as the PIL
    tier."""
    arr = _decode_pixels_numpy(payload)
    if arr is False:
        return False  # let the gate fall through to the stub
    if arr is None:
        return None
    h, w = arr.shape[0], arr.shape[1]
    return _stat_embedding(arr, w, h)


def _decode_pixels_numpy(payload: bytes):
    """Format dispatch for the numpy tier, returning the RAW pixel array
    (H, W, 3) — shared by the embedding path above and the resize operator
    below. ``False`` = not a numpy-decodable format (fall to the stub
    tier); ``None`` = claims a known format but is malformed."""
    from datalakejson_spark.functions.imagecodecs import (
        decode_gif,
        decode_jpeg,
        decode_png,
        decode_tiff,
    )
    from datalakejson_spark.functions.webpcodec import (
        _find_vp8l_chunk,
        decode_webp,
    )

    return (
        _decode_ppm_numpy(payload)
        if payload.startswith(b"P6")
        else _decode_bmp_numpy(payload)
        if payload.startswith(b"BM")
        else decode_png(payload)
        if payload.startswith(b"\x89PNG")
        else decode_jpeg(payload)
        if payload.startswith(b"\xff\xd8")
        else decode_gif(payload)
        if payload.startswith((b"GIF87a", b"GIF89a"))
        else decode_tiff(payload)
        if payload.startswith((b"II*\x00", b"MM\x00*"))
        # WebP: only LOSSLESS (VP8L) has a real decoder; lossy VP8 needs the
        # boolean arithmetic decoder + full VP8 intra stack (codec-library
        # territory), so payloads without a VP8L chunk fall to the stub tier
        else decode_webp(payload)
        if payload.startswith(b"RIFF")
        and payload[8:12] == b"WEBP"
        and _find_vp8l_chunk(payload) is not None
        else False  # sentinel: not a numpy-decodable format at all
    )


def decode_image_tiered(
    payload: bytes, use_pil: bool | None = None
) -> tuple[list[float] | None, str]:
    """The L5 codec gate (ADVICE r03) with tier attribution: returns
    ``(features, tier)`` where tier ∈ DECODE_TIERS records which codec
    produced (or attempted) the decode. Three tiers: Pillow when importable
    (all formats); else a pure-numpy/stdlib decoder for PPM/BMP/PNG/JPEG
    (baseline + progressive)/GIF/TIFF/WebP-lossless (REAL pixels, compressed
    formats included — this tier runs and is tested in this container); else
    the clearly-marked deterministic stub for remaining formats (lossy VP8/...)
    without a codec. A malformed
    payload keeps its attempting tier's label with
    features None (decoded_ok=False downstream). ``use_pil`` forces the
    first branch on/off for tests."""
    if payload is None:
        return None, "none"
    use = _has_pil() if use_pil is None else use_pil
    if use:
        return _decode_image_pil(payload), "pil"
    via_numpy = _decode_image_numpy(payload)
    if via_numpy is not False:
        return via_numpy, "numpy"
    return _decode_image_stub(payload), "stub"


def decode_image(payload: bytes, use_pil: bool | None = None) -> list[float] | None:
    """Features-only view of decode_image_tiered (kept for callers that
    don't need tier attribution)."""
    return decode_image_tiered(payload, use_pil)[0]


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas:
    bounded memory per batch, no blob ever shuffles)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = _has_pil()  # probed once per worker, not per row
        for pdf in batches:
            feats, oks, tiers, hashes, sizes = [], [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    oks.append(False)
                    tiers.append("none")
                    hashes.append(None)
                    sizes.append(0)
                    continue
                raw = bytes(payload)
                feat, tier = decode_image_tiered(raw, use_pil=use_pil)
                feats.append(feat)
                oks.append(feat is not None)
                tiers.append(tier)
                hashes.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": sizes,
                    "sha256": hashes,
                    "decoded_ok": oks,
                    "decode_tier": tiers,
                    "feat": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# Image resize: real pixel resampling on the decodable tiers (round 9)
# --------------------------------------------------------------------------
RESIZE_SCHEMA = (
    "asset_id string, width int, height int, resized_ok boolean, "
    "decode_tier string, payload binary"
)


def _resample_weights(n_in: int, n_out: int):
    """(n_out, n_in) box-overlap weight matrix for 1-D AREA resampling:
    row i holds each input pixel's share of output bin i (overlap of the
    bins as real intervals), so every row sums to exactly 1 and the matrix
    product is the exact area average — the standard box filter, computed
    closed-form instead of via an imaging library. Deterministic: pure
    float64 arithmetic from integer endpoints, no iteration order."""
    import numpy as np

    scale = n_in / n_out
    edges = np.arange(n_out + 1, dtype="float64") * scale  # output bin edges
    lo, hi = edges[:-1, None], edges[1:, None]  # (n_out, 1)
    px = np.arange(n_in, dtype="float64")[None, :]  # input pixel [px, px+1)
    overlap = np.minimum(hi, px + 1.0) - np.maximum(lo, px)
    w = np.clip(overlap, 0.0, None)
    return w / scale  # rows sum to 1


def resize_pixels(arr, width: int, height: int, method: str = "area"):
    """Resize an (h, w, 3) float array to (height, width, 3).

    ``area``: exact box-filter resampling via two weight-matrix products
    (einsum over rows then columns) — the right default for training-data
    downscaling, anti-aliased by construction. ``nearest``: index-mapped
    sampling (center rule), the cheap path for label-preserving masks."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    if method == "nearest":
        ys = np.minimum((np.arange(height) + 0.5) * h / height, h - 1).astype("int64")
        xs = np.minimum((np.arange(width) + 0.5) * w / width, w - 1).astype("int64")
        return arr[ys][:, xs]
    wy = _resample_weights(h, height)  # (height, h)
    wx = _resample_weights(w, width)  # (width, w)
    out = np.einsum("Yh,hwc->Ywc", wy, arr.astype("float64"))
    return np.einsum("Xw,Ywc->YXc", wx, out).astype("float32")


def encode_ppm(arr) -> bytes:
    """(h, w, 3) float [0,1] array → binary PPM (P6, maxval 255) — the
    canonical uncompressed interchange payload for resized assets (readable
    by the same numpy tier that decodes it; no codec dependency)."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    pixels = np.clip(np.rint(arr * 255.0), 0, 255).astype("uint8")
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_pixels_tiered(payload: bytes, use_pil: bool | None = None):
    """(array, tier) raw-pixel analogue of decode_image_tiered, with the
    same DECODE_TIERS vocabulary and the same convention (a malformed
    payload keeps its attempting tier's label, array None). A PIL failure
    falls through to the numpy dispatch, so stub-class attribution — an
    entropy-coded format with no real decoder anywhere, which has no
    pixels to offer — is ENVIRONMENT-INDEPENDENT: the same payload never
    reads 'stub' on one worker and a failure tier on another just because
    that worker's PIL build lacks the format."""
    import numpy as np

    if use_pil is None:
        use_pil = _has_pil()
    if use_pil:
        try:
            import io

            from PIL import Image

            with Image.open(io.BytesIO(payload)) as img:
                rgb = img.convert("RGB")
                arr = np.asarray(rgb).astype("float32") / 255.0
            return arr, "pil"
        except Exception:  # noqa: BLE001 — fall to the numpy dispatch
            pass
    arr = _decode_pixels_numpy(payload)
    if arr is False:
        return None, "stub"  # no real codec for this format anywhere
    if arr is None:
        return None, "numpy"  # known format, malformed payload
    return arr, "numpy"


def resize_images(
    assets: DataFrame, width: int, height: int, method: str = "area"
) -> DataFrame:
    """Arrow-batched image resize over binary payloads: decode on the real
    tiers (decode_pixels_tiered), resample (area box filter by default),
    re-encode as canonical PPM. Undecodable payloads row through with
    resized_ok=false and their tier attribution, never a failed batch.

    100 TB shape: mapInPandas is a NARROW transform — blobs stream worker-
    local in Arrow batches, nothing shuffles, parallelism = input splits;
    per-row cost is O(pixels) with two dense matmuls whose weight matrices
    are built once per output size per batch row pair (h/w vary per image,
    so they are small and rebuilt — the arrays dominate)."""
    if width <= 0 or height <= 0:
        # Fail fast at the driver — never as a ZeroDivisionError inside
        # executor tasks after the job has spun up.
        raise ValueError(f"target dims must be positive, got {width}x{height}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = _has_pil()  # probed once per worker
        for pdf in batches:
            outs, oks, tiers = [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    outs.append(None)
                    oks.append(False)
                    tiers.append("none")
                    continue
                arr, tier = decode_pixels_tiered(bytes(payload), use_pil=use_pil)
                tiers.append(tier)
                if arr is None:
                    outs.append(None)
                    oks.append(False)
                    continue
                outs.append(encode_ppm(resize_pixels(arr, width, height, method)))
                oks.append(True)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "resized_ok": oks,
                    "decode_tier": tiers,
                    "payload": outs,
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each asset into (asset_id,
    frame_ts_ms) rows from metadata duration — the decode of each frame is
    the stubbed step. JVM-side sequence(), so the expansion never touches
    Python. For payload-derived durations (real MP4 container parse instead
    of caller metadata) use containers.frame_sample_plan_from_payloads."""
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


# --------------------------------------------------------------------------
# Audio tier: real PCM WAV decode + features, numpy only (r5)
# --------------------------------------------------------------------------
AUDIO_FEATURE_SCHEMA = (
    "asset_id string, n_bytes long, decoded_ok boolean, codec string, "
    "sample_rate int, n_samples long, duration_ms long, rms double, "
    "zero_cross_rate double"
)

#: codec values — the audio analogue of DECODE_TIERS: which decoder was
#: ATTEMPTED for the row (kept on failure, decoded_ok=False, so consumers
#: can audit failure rates per codec): "pcm"/"pcm_float"/"adpcm" (RIFF WAV
#: by RESOLVED format tag — EXTENSIBLE's SubFormat is unwrapped so the
#: attribution names the decoder that actually runs), "flac", "au", "aiff",
#: "unknown" (no decoder for the magic), "none" (null/empty).
AUDIO_CODECS = ("pcm", "pcm_float", "adpcm", "flac", "au", "aiff",
                "unknown", "none")


def _sniff_audio_codec(payload: bytes) -> str:
    """Attribute the decoder a payload will route to, without decoding:
    fLaC magic → flac; RIFF/WAVE → the fmt chunk's RESOLVED format tag
    (1 → pcm, 3 → pcm_float, 0x11 → adpcm; EXTENSIBLE 0xFFFE is unwrapped
    to its SubFormat code so the label matches the decoder that actually
    runs); ``.snd`` → au; FORM/AIFF|AIFC → aiff; anything else →
    unknown."""
    import struct

    if not payload:
        return "none"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:4] == b".snd":
        return "au"
    if payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC"):
        return "aiff"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos = 12
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            if cid == b"fmt " and pos + 10 <= len(payload):
                tag = struct.unpack_from("<H", payload, pos + 8)[0]
                if tag == 0xFFFE and size >= 26 and pos + 8 + 26 <= len(payload):
                    # SubFormat GUID bytes 0-1 at fmt-body offset 24
                    tag = struct.unpack_from("<H", payload, pos + 8 + 24)[0]
                return {1: "pcm", 3: "pcm_float", 0x11: "adpcm"}.get(
                    tag, "unknown"
                )
            pos += 8 + size + (size & 1)
        return "unknown"
    return "unknown"


def decode_wav(payload: bytes):
    """Pure-numpy WAV decode: integer PCM at 8/16/24/32 bits, IEEE float32
    (format 3), WAVE_FORMAT_EXTENSIBLE (0xFFFE — the real format code lives
    in the SubFormat GUID's first two bytes; what every DAW writes for
    >16-bit or multichannel), and COMPRESSED IMA ADPCM (format 0x11,
    audiocodecs.py — real 4:1 compressed-audio decode). 24/32-bit support
    added r7 after real CPython test WAVs (pluck-pcm24/32) exposed the gap.
    Returns (sample_rate, mono float array in [-1, 1]) or None for
    malformed/unsupported payloads — the audio analogue of the
    PPM/BMP/PNG/JPEG image tier."""
    import struct

    import numpy as np

    try:
        if not (payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"):
            return None
        pos, fmt, fmt_body, data = 12, None, b"", None
        while pos + 8 <= len(payload):
            cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
            body = payload[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", body, 0)
                fmt_body = body
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        audio_fmt, n_ch, rate, _, block_align, bits = fmt
        if n_ch < 1 or rate <= 0:
            return None
        if audio_fmt == 0xFFFE and len(fmt_body) >= 26:
            # EXTENSIBLE: real format code = SubFormat GUID bytes 0-1
            audio_fmt = struct.unpack_from("<H", fmt_body, 24)[0]
        if audio_fmt == 0x11:  # IMA ADPCM — real compressed-audio decode
            from datalakejson_spark.functions.audiocodecs import decode_ima_adpcm

            mono = decode_ima_adpcm(data, n_ch, block_align)
            return None if mono is None else (rate, mono)
        # PCM widening + downmix are SHARED with the AU/AIFF containers
        # (audiocodecs.py) — one copy of the sign-extension and odd-length
        # truncation logic, WAV's dialect being little-endian + unsigned 8
        from datalakejson_spark.functions.audiocodecs import (
            _downmix,
            float_pcm_to_float,
            pcm_to_float,
        )

        if audio_fmt == 3 and bits in (32, 64):  # IEEE float, clamped
            arr = float_pcm_to_float(data, bits, little_endian=True)
        elif audio_fmt == 1 and bits in (8, 16, 24, 32):
            arr = pcm_to_float(
                data, bits, little_endian=True, unsigned8=(bits == 8)
            )
        else:
            return None
        if arr is None:
            return None
        return rate, _downmix(arr, n_ch)
    except Exception:  # noqa: BLE001
        return None


def decode_audio(payload: bytes):
    """Audio container dispatch: RIFF/WAVE → decode_wav (PCM at every
    depth + IMA ADPCM); fLaC → audiocodecs.decode_flac (real lossless
    compressed decode, r6); ``.snd`` → Sun/NeXT AU (PCM/float + G.711
    mu-law/A-law, r7); FORM/AIFF|AIFC → AIFF (BE PCM, sowt, ulaw, alaw,
    r7). Same (sample_rate, mono float array) contract throughout."""
    if payload[:4] == b"fLaC":
        from datalakejson_spark.functions.audiocodecs import decode_flac

        return decode_flac(payload)
    if payload[:4] == b".snd":
        from datalakejson_spark.functions.audiocodecs import decode_au

        return decode_au(payload)
    if payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC"):
        from datalakejson_spark.functions.audiocodecs import decode_aiff

        return decode_aiff(payload)
    return decode_wav(payload)


def extract_audio_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched audio features over binary payloads: duration, RMS
    level, zero-crossing rate — the standard cheap audio-quality trio
    (silence/clipping/noise screens for a training-data pipeline). Same
    mapInPandas shape as the image path: blobs never shuffle, features only."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("asset_id", "n_bytes", "decoded_ok",
                                    "codec", "sample_rate", "n_samples",
                                    "duration_ms", "rms", "zero_cross_rate")}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                rows["asset_id"].append(asset_id)
                raw = bytes(payload) if payload is not None else b""
                rows["n_bytes"].append(len(raw))
                rows["codec"].append(_sniff_audio_codec(raw))
                decoded = decode_audio(raw) if raw else None
                if decoded is None or len(decoded[1]) == 0:
                    rows["decoded_ok"].append(False)
                    for k in ("sample_rate", "n_samples", "duration_ms",
                              "rms", "zero_cross_rate"):
                        rows[k].append(None)
                    continue
                rate, samples = decoded
                rows["decoded_ok"].append(True)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(samples))
                rows["duration_ms"].append(int(len(samples) * 1000 / rate))
                rows["rms"].append(float(np.sqrt(np.mean(samples**2))))
                signs = np.signbit(samples)
                rows["zero_cross_rate"].append(
                    float(np.mean(signs[1:] != signs[:-1])) if len(samples) > 1 else 0.0
                )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# Audio resample: deterministic rate conversion for corpus prep (round 9)
# --------------------------------------------------------------------------
RESAMPLE_SCHEMA = (
    "asset_id string, sample_rate int, n_samples long, resampled_ok boolean, "
    "codec string, payload binary"
)


def resample_signal(samples, in_rate: int, out_rate: int):
    """Mono float signal → ``out_rate``. Deterministic pure-numpy baseline:
    an INTEGER decimation factor is an exact box average (the common
    48k→16k/8k corpus-prep cases — anti-aliased by the box); non-integer
    ratios box-prefilter by the floor factor when downsampling, then
    linearly interpolate at the exact positions. This is the honest
    baseline, not a production polyphase windowed-sinc: the box is a weak
    low-pass (first null at the new Nyquist), adequate for feature/QA
    pipelines; swap in a real resampler library for fidelity-critical
    audio."""
    import numpy as np

    samples = np.asarray(samples, dtype="float64")
    if len(samples) == 0:
        return samples.astype("float32")
    if in_rate == out_rate:
        return samples.astype("float32")
    n_out = max(int(round(len(samples) * out_rate / in_rate)), 1)
    if in_rate % out_rate == 0:
        # Exact box decimation, length-consistent with the rate conversion:
        # full windows are exact means, a tail remainder becomes one last
        # window mean when rounding says the clip is long enough to owe one
        # (truncating the remainder would drop up to f-1 samples of audio
        # and disagree with round(n*out/in) bookkeeping).
        f = in_rate // out_rate
        n_full = len(samples) // f
        out = (
            samples[: n_full * f].reshape(-1, f).mean(axis=1)
            if n_full
            else np.empty(0, dtype="float64")
        )
        if len(out) < n_out:
            tail = samples[n_full * f :]
            out = np.concatenate([out, [tail.mean() if len(tail) else 0.0]])
        return out[:n_out].astype("float32")
    x, eff_rate = samples, float(in_rate)
    if out_rate < in_rate:
        f = int(in_rate // out_rate)
        if f > 1 and len(x) >= f:
            n = len(x) // f * f
            x = x[:n].reshape(-1, f).mean(axis=1)
            eff_rate = in_rate / f
    pos = np.arange(n_out) * (eff_rate / out_rate)
    out = np.interp(pos, np.arange(len(x), dtype="float64"), x)
    return out.astype("float32")


def encode_wav_pcm16(rate: int, samples) -> bytes:
    """Mono float [-1, 1] signal → canonical 16-bit PCM WAV (the
    interchange payload for resampled assets; decodable by decode_audio's
    real WAV tier, no codec dependency)."""
    import struct

    import numpy as np

    pcm = (
        np.clip(np.rint(np.asarray(samples, dtype="float64") * 32767.0),
                -32768, 32767)
        .astype("<i2")
        .tobytes()
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def resample_audio(assets: DataFrame, target_rate: int = 16_000) -> DataFrame:
    """Arrow-batched audio rate conversion over binary payloads: decode on
    the real tiers (WAV PCM/float/ADPCM, AU/AIFF G.711, FLAC), resample to
    ``target_rate`` (resample_signal), re-encode as canonical 16-bit PCM
    WAV — the standard normalization step in front of ASR/audio-LM corpus
    packing. Undecodable payloads row through with resampled_ok=false and
    their codec attribution.

    100 TB shape: mapInPandas narrow transform — blobs stream worker-local
    in Arrow batches, nothing shuffles; per-row cost is O(samples)."""
    if target_rate <= 0:
        raise ValueError(f"target_rate must be positive, got {target_rate}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, ns, oks, codecs, outs = [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                codecs.append(_sniff_audio_codec(raw))
                decoded = decode_audio(raw) if raw else None
                if decoded is None or len(decoded[1]) == 0:
                    rates.append(None)
                    ns.append(None)
                    oks.append(False)
                    outs.append(None)
                    continue
                rate, samples = decoded
                res = resample_signal(samples, rate, target_rate)
                rates.append(target_rate)
                ns.append(len(res))
                oks.append(True)
                outs.append(encode_wav_pcm16(target_rate, res))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "sample_rate": rates,
                    "n_samples": ns,
                    "resampled_ok": oks,
                    "codec": codecs,
                    "payload": outs,
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema=RESAMPLE_SCHEMA
    )


# --------------------------------------------------------------------------
# Video tier: real uncompressed Y4M (YUV4MPEG2) frame decode, numpy only (r5)
# --------------------------------------------------------------------------
FRAME_FEATURE_SCHEMA = (
    "asset_id string, decoded_ok boolean, n_frames int, width int, "
    "height int, frame_idx int, luma_mean double"
)


def decode_y4m(payload: bytes):
    """Pure-numpy YUV4MPEG2 parse (C420/C422/C444 planar, plus Cmono):
    returns (w, h, [luma planes]) or None. The uncompressed-video analogue
    of the PPM/WAV tiers — compressed containers (mp4 etc.) need the
    ffmpeg gate and fall to the metadata-driven plan (frame_sample_plan)."""
    import numpy as np

    try:
        end = payload.index(b"\n")
        header = payload[:end].decode("ascii")
        if not header.startswith("YUV4MPEG2"):
            return None
        w = h = None
        chroma = "420"
        for tok in header.split()[1:]:
            if tok[0] == "W":
                w = int(tok[1:])
            elif tok[0] == "H":
                h = int(tok[1:])
            elif tok[0] == "C":
                if tok.startswith("C420"):
                    chroma = "420"  # incl. C420jpeg/C420paldv — same layout
                elif tok[1:] in ("422", "444", "mono"):
                    chroma = tok[1:]
                else:
                    return None
        if not w or not h:
            return None
        chroma_bytes = {
            "420": 2 * ((w // 2) * (h // 2)),
            "422": 2 * ((w // 2) * h),
            "444": 2 * (w * h),
            "mono": 0,
        }[chroma]
        frame_bytes = w * h + chroma_bytes
        lumas, pos = [], end + 1
        while pos < len(payload):
            nl = payload.index(b"\n", pos)
            if not payload[pos:nl].startswith(b"FRAME"):
                return None
            data = payload[nl + 1 : nl + 1 + frame_bytes]
            if len(data) != frame_bytes:
                return None
            lumas.append(
                np.frombuffer(data[: w * h], dtype=np.uint8).reshape(h, w)
            )
            pos = nl + 1 + frame_bytes
        return w, h, lumas
    except Exception:  # noqa: BLE001
        return None


def extract_frame_features(assets: DataFrame, every_n: int = 1) -> DataFrame:
    """Real frame sampling over uncompressed Y4M payloads: one output row
    per sampled frame with its luma mean (the scene-cut / black-frame
    screen). Same Arrow-batched shape as the other modalities; ``every_n``
    is the sampling stride. Undecodable payloads yield a single
    decoded_ok=False row so per-asset accounting stays complete."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "decoded_ok", "n_frames",
                                   "width", "height", "frame_idx", "luma_mean")}

            def emit(aid, ok, nf, w, h, idx, lm):
                for k, v in zip(out, (aid, ok, nf, w, h, idx, lm)):
                    out[k].append(v)

            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                decoded = decode_y4m(bytes(payload)) if payload is not None else None
                if decoded is None:
                    emit(asset_id, False, None, None, None, None, None)
                    continue
                w, h, lumas = decoded
                for idx in range(0, len(lumas), every_n):
                    emit(asset_id, True, len(lumas), w, h, idx,
                         float(np.mean(lumas[idx])) / 255.0)
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, schema=FRAME_FEATURE_SCHEMA)
