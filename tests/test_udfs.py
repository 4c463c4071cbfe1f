"""UDF-surface tests (D1-D5) and multimodal plumbing tests (L5)."""

from __future__ import annotations

import pyspark.sql.functions as F

from datalakejson_spark.functions.multimodal import (
    ASSET_SCHEMA,
    extract_features,
    frame_sample_plan,
    read_binary_assets,
)
from datalakejson_spark.functions.udfs import (
    add_group_minmax_scaled,
    classify_priority_udf,
    discounted_charge,
    interquartile_range,
    tokenize_mapinpandas,
    zscore_clip,
)

SF = "/root/testdata/sf0.001"


def test_d1_row_udf(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = orders.select(classify_priority_udf()("o_orderpriority").alias("c"))
    vals = {r.c for r in out.distinct().collect()}
    assert vals <= {"rush", "standard"} and len(vals) == 2


def test_d2_scalar_pandas_udf_matches_builtin(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    both = li.select(
        discounted_charge("l_extendedprice", "l_discount", "l_tax").alias("udf_v"),
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("builtin_v"),
    )
    # same IEEE ops elementwise → bit-identical
    assert both.filter(F.col("udf_v") != F.col("builtin_v")).count() == 0


def test_d2_zscore_clip_bounds(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select("value")
    out = ev.select(zscore_clip("value").alias("z"))
    mx = out.agg(F.max(F.abs("z"))).first()[0]
    assert mx <= 3.0


def test_d3_grouped_agg_iqr(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    out = (
        li.groupBy("l_returnflag")
        .agg(interquartile_range("l_quantity").alias("iqr"))
        .collect()
    )
    assert all(0 < r.iqr < 50 for r in out)


def test_d4_apply_in_pandas_scaling(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = add_group_minmax_scaled(orders, "o_orderpriority", "o_totalprice")
    stats = out.groupBy("o_orderpriority").agg(
        F.min("scaled").alias("lo"), F.max("scaled").alias("hi")
    )
    for r in stats.collect():
        assert r.lo == 0.0 and r.hi == 1.0
    assert out.count() == orders.count()


def test_d5_map_in_pandas_tokenize(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = tokenize_mapinpandas(docs)
    n_tokens_udf = toks.count()
    n_tokens_builtin = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).first()[0]
    assert n_tokens_udf == n_tokens_builtin
    # positions are dense per doc
    first = toks.filter(F.col("position") == 0).count()
    assert first == docs.count()


def test_l5_binary_asset_pipeline(spark, tmp_path):
    # synthesize opaque "media" files
    for i in range(3):
        (tmp_path / f"img_{i}.png").write_bytes(bytes([i]) * (100 + i))
    assets = read_binary_assets(spark, str(tmp_path), glob="*.png")
    feats = extract_features(assets)
    rows = feats.collect()
    assert len(rows) == 3
    assert all(r.decoded_ok and r.n_bytes >= 100 and len(r.feat) == 8 for r in rows)
    # fake-PNG payloads with no codec present: every row must be LABELED as
    # stub-tier so a consumer can audit/drop the fake embeddings downstream
    assert all(r.decode_tier == "stub" for r in rows)
    # deterministic stub: same payload → same features
    again = {r.asset_id: r.feat for r in extract_features(assets).collect()}
    assert all(again[r.asset_id] == r.feat for r in rows)


def test_l5_decode_tier_attribution(spark, tmp_path):
    """Per-tier observability (VERDICT r5 #5): real numpy decodes, stub
    fakes, and null payloads each carry their tier label; malformed payloads
    keep the attempting tier's label with decoded_ok=False."""
    from datalakejson_spark.functions.multimodal import ASSET_SCHEMA

    import numpy as np

    from datalakejson_spark.functions.imagecodecs import (
        encode_gif,
        encode_jpeg,
        encode_png,
        encode_tiff,
    )

    px = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (10, 20, 30)]]
    arr = np.array(px, dtype=np.uint8)
    assets = spark.createDataFrame(
        [
            ("ppm_ok", "image", _ppm_bytes(px), None),
            ("bmp_ok", "image", _bmp_bytes(px), None),
            ("png_ok", "image", encode_png(arr), None),
            ("jpeg_ok", "image", encode_jpeg(arr.astype("float32"), quality=95), None),
            ("gif_ok", "image", encode_gif(arr), None),
            ("tiff_ok", "image", encode_tiff(arr), None),
            ("ppm_bad", "image", b"P6\n2 2\n255\nshort", None),
            ("jpeg_bad", "image", b"\xff\xd8\xff\xe0 fake jpeg", None),
            ("webp_nocodec", "image", b"RIFF\x00\x00\x00\x00WEBP fake", None),
            ("null_payload", "image", None, None),
        ],
        ASSET_SCHEMA,
    )
    rows = {r.asset_id: r for r in extract_features(assets).collect()}
    for ok_id in ("ppm_ok", "bmp_ok", "png_ok", "jpeg_ok", "gif_ok", "tiff_ok"):
        assert rows[ok_id].decode_tier == "numpy" and rows[ok_id].decoded_ok, ok_id
    # PNG and GIF are lossless: their stat embeddings match the PPM tier's
    assert rows["png_ok"].feat == rows["ppm_ok"].feat
    assert rows["gif_ok"].feat == rows["ppm_ok"].feat
    # compressed-but-malformed payloads keep the attempting real tier's label
    assert rows["ppm_bad"].decode_tier == "numpy" and not rows["ppm_bad"].decoded_ok
    assert rows["jpeg_bad"].decode_tier == "numpy" and not rows["jpeg_bad"].decoded_ok
    # formats with no real decoder (WebP) still fall to the labeled stub
    assert rows["webp_nocodec"].decode_tier == "stub" and rows["webp_nocodec"].decoded_ok
    assert rows["null_payload"].decode_tier == "none" and not rows["null_payload"].decoded_ok
    # the audit aggregation a consumer would run
    counts = {
        r.decode_tier: r.n
        for r in extract_features(assets).groupBy("decode_tier").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"numpy": 8, "stub": 1, "none": 1}


def test_l5_frame_sampling_plan(spark):
    assets = spark.createDataFrame(
        [("v1", "video", None, (None, None, 3500, "h264"))], ASSET_SCHEMA
    )
    frames = frame_sample_plan(assets, every_ms=1000)
    assert [r.frame_ts_ms for r in frames.collect()] == [0, 1000, 2000, 3000]


def test_l5_codec_gate_both_branches():
    """ADVICE r03: decode_image picks Pillow when importable, the stub
    otherwise — both branches exercised here (stub for real since this
    container has no PIL; the PIL path via a minimal fake module)."""
    import sys
    import types

    import numpy as np

    from datalakejson_spark.functions.multimodal import _has_pil, decode_image

    # this container has no Pillow: auto mode must take the stub branch
    assert not _has_pil()
    payload = b"\x01" * 120
    stub = decode_image(payload)
    assert stub == decode_image(payload, use_pil=False)
    assert len(stub) == 8 and all(0.0 <= v <= 1.0 for v in stub)
    assert decode_image(None) is None

    # fake PIL: 4x2 all-gray RGB image regardless of payload
    class _FakeImg:
        size = (4, 2)

        def convert(self, mode):
            assert mode == "RGB"
            return np.full((2, 4, 3), 128, dtype="uint8")

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake_pil = types.ModuleType("PIL")
    fake_image_mod = types.ModuleType("PIL.Image")
    fake_image_mod.open = lambda fp: _FakeImg()
    fake_pil.Image = fake_image_mod
    sys.modules["PIL"] = fake_pil
    sys.modules["PIL.Image"] = fake_image_mod
    try:
        assert _has_pil()  # the gate flips with importability
        feat = decode_image(payload)  # auto mode now takes the PIL branch
        assert len(feat) == 8
        means, stds = feat[:3], feat[3:6]
        assert all(abs(m - 128 / 255) < 1e-6 for m in means)
        assert all(abs(s) < 1e-6 for s in stds)
        assert abs(feat[6] - np.log1p(8.0)) < 1e-6  # log-area of 4x2
        assert abs(feat[7] - 2.0) < 1e-6  # aspect 4/2
        # undecodable bytes → None, not an exception
        fake_image_mod.open = lambda fp: (_ for _ in ()).throw(OSError("bad"))
        assert decode_image(payload) is None
    finally:
        del sys.modules["PIL"]
        del sys.modules["PIL.Image"]


def _ppm_bytes(pixels):
    """pixels: list of rows of (r, g, b) tuples → binary P6 payload."""
    h, w = len(pixels), len(pixels[0])
    body = bytes(c for row in pixels for px in row for c in px)
    return f"P6\n{w} {h}\n255\n".encode() + body


def _bmp_bytes(pixels):
    """pixels: rows of (r, g, b), top-down → 24-bit bottom-up padded BMP."""
    import struct

    h, w = len(pixels), len(pixels[0])
    stride = (w * 3 + 3) & ~3
    rows = b""
    for row in reversed(pixels):  # bottom-up storage
        r = b"".join(bytes((b_, g, r_)) for (r_, g, b_) in row)  # BGR
        rows += r + b"\x00" * (stride - len(r))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    return header + rows


def test_l5_numpy_tier_decodes_real_pixels():
    """The r5 middle codec tier: REAL decode of uncompressed formats with
    numpy only — exact per-channel means for a known image, identical
    embedding from the PPM and BMP encodings of the same pixels."""
    from datalakejson_spark.functions.multimodal import decode_image

    px = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    feat_ppm = decode_image(_ppm_bytes(px), use_pil=False)
    feat_bmp = decode_image(_bmp_bytes(px), use_pil=False)
    assert feat_ppm is not None and feat_bmp is not None
    # channel means over the 4 pixels: each channel = (255+255)/4/255 = 0.5
    assert all(abs(m - 0.5) < 1e-6 for m in feat_ppm[:3])
    assert feat_ppm == feat_bmp  # same pixels ⇒ same embedding, any format
    assert feat_ppm[7] == 1.0  # aspect ratio w/h = 2/2

    # Malformed payloads that CLAIM a decodable format → None (not a fake);
    # since r6 PNG/JPEG are real-decode formats, so their malformed payloads
    # also land here rather than in the stub.
    assert decode_image(b"P6\n2 2\n255\nshort", use_pil=False) is None
    assert decode_image(b"\x89PNG...", use_pil=False) is None
    # Format with no real decoder (WebP) → the labeled deterministic stub.
    assert decode_image(b"RIFF\x00\x00\x00\x00WEBP...", use_pil=False) is not None


def test_l5_feature_extraction_mixed_formats(spark, tmp_path):
    """mapInPandas end-to-end over a mixed-format asset directory: the
    decodable formats get real pixel features, the corrupt one is flagged."""
    from datalakejson_spark.functions.multimodal import (
        extract_features,
        read_binary_assets,
    )

    d = tmp_path / "assets"
    d.mkdir()
    px = [[(10, 20, 30)]]
    (d / "a.ppm").write_bytes(_ppm_bytes(px))
    (d / "b.bmp").write_bytes(_bmp_bytes(px))
    (d / "c.ppm").write_bytes(b"P6\n9 9\n255\ntruncated")
    feats = {
        r.asset_id.rsplit("/", 1)[-1]: r
        for r in extract_features(read_binary_assets(spark, str(d))).collect()
    }
    assert feats["a.ppm"].decoded_ok and feats["b.bmp"].decoded_ok
    assert not feats["c.ppm"].decoded_ok and feats["c.ppm"].feat is None
    assert abs(feats["a.ppm"].feat[0] - 10 / 255) < 1e-6
    assert feats["a.ppm"].feat == feats["b.bmp"].feat


def test_l5_wav_audio_features(spark, tmp_path):
    """Real PCM WAV decode in the audio path: a synthesized 440 Hz sine's
    RMS and zero-crossing rate match theory; a truncated payload flags
    decoded_ok=False."""
    import math
    import struct

    import numpy as np

    from datalakejson_spark.functions.multimodal import (
        extract_audio_features,
        read_binary_assets,
    )

    rate, freq, dur_s = 8000, 440, 1
    n = rate * dur_s
    samples = np.round(
        32767 * 0.5 * np.sin(2 * np.pi * freq * np.arange(n) / rate)
    ).astype("<i2")
    data = samples.tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    d = tmp_path / "audio"
    d.mkdir()
    (d / "tone.wav").write_bytes(wav)
    (d / "bad.wav").write_bytes(wav[:20])

    feats = {
        r.asset_id.rsplit("/", 1)[-1]: r
        for r in extract_audio_features(
            read_binary_assets(spark, str(d))
        ).collect()
    }
    tone = feats["tone.wav"]
    assert tone.decoded_ok and tone.sample_rate == 8000
    assert tone.duration_ms == 1000 and tone.n_samples == 8000
    # sine RMS = amplitude/sqrt(2) = 0.5/1.414 ≈ 0.3536
    assert abs(tone.rms - 0.5 / math.sqrt(2)) < 0.01
    # 440 Hz crosses zero 880 times/s → rate ≈ 880/8000 = 0.11
    assert abs(tone.zero_cross_rate - 2 * freq / rate) < 0.005
    assert not feats["bad.wav"].decoded_ok


def test_l5_y4m_video_frame_features(spark, tmp_path):
    """Real uncompressed-video decode: a 3-frame synthetic Y4M with known
    luma ramps yields one row per sampled frame with exact means; a
    compressed (non-Y4M) payload degrades to a flagged row."""
    import numpy as np

    from datalakejson_spark.functions.multimodal import (
        extract_frame_features,
        read_binary_assets,
    )

    w, h = 4, 2
    frames = [np.full((h, w), v, dtype=np.uint8) for v in (0, 128, 255)]
    chroma = bytes((w // 2) * (h // 2) * 2)
    body = b"".join(b"FRAME\n" + f.tobytes() + chroma for f in frames)
    d = tmp_path / "video"
    d.mkdir()
    (d / "ramp.y4m").write_bytes(f"YUV4MPEG2 W{w} H{h} F25:1 C420\n".encode() + body)
    (d / "clip.mp4").write_bytes(b"\x00\x00\x00\x18ftypmp42 compressed")

    rows = extract_frame_features(read_binary_assets(spark, str(d))).collect()
    ramp = sorted(
        (r for r in rows if r.asset_id.endswith("ramp.y4m")),
        key=lambda r: r.frame_idx,
    )
    assert [r.decoded_ok for r in ramp] == [True] * 3
    assert ramp[0].n_frames == 3 and ramp[0].width == 4 and ramp[0].height == 2
    assert [round(r.luma_mean, 3) for r in ramp] == [0.0, round(128 / 255, 3), 1.0]
    (bad,) = [r for r in rows if r.asset_id.endswith("clip.mp4")]
    assert not bad.decoded_ok and bad.frame_idx is None
