"""Property-based codec roundtrips (hypothesis): lossless codecs must be
EXACT for arbitrary content, not just the hand-picked fixtures — random
shapes catch stride/padding arithmetic, random values catch filter and
prediction edge cases (full-scale deltas, sign boundaries).

No SparkSession needed — worker-side functions only.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    nch=st.sampled_from([1, 3, 4]),
    filters=st.sampled_from([0, 1, 2, 3, 4, [0, 1, 2, 3, 4]]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_shape(h, w, nch, filters, seed):
    from datalakejson_spark.functions.imagecodecs import decode_png, encode_png

    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, nch), dtype=np.uint8)
    dec = decode_png(encode_png(img, filters=filters))
    assert dec is not None and dec.shape == (h, w, 3)
    if nch == 1:
        exp = np.repeat(img, 3, axis=2).astype(np.float32) / 255.0
    elif nch == 3:
        exp = img.astype(np.float32) / 255.0
    else:
        rgb = img[:, :, :3].astype(np.float32) / 255.0
        a = img[:, :, 3:].astype(np.float32) / 255.0
        exp = rgb * a + (1 - a)
    assert np.abs(dec - exp).max() < 1e-6


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 2500),
    order=st.integers(0, 4),
    blocksize=st.sampled_from([192, 576, 1024]),
    stereo=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_roundtrip_any_signal(n, order, blocksize, stereo, seed):
    """FLAC is lossless: any signal, any fixed-predictor order, any
    blocksize (including final short blocks) must roundtrip bit-exactly."""
    from datalakejson_spark.functions.audiocodecs import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    sig = rng.uniform(-1.0, 1.0, size=(n, 2) if stereo else n)
    payload = encode_flac(sig, 8000, blocksize=blocksize, order=order)
    decoded = decode_flac(payload)
    assert decoded is not None
    rate, out = decoded
    pcm = np.clip(np.asarray(sig) * 32768.0, -32768, 32767).astype(np.int64)
    exp = pcm.mean(axis=1) / 32768.0 if stereo else pcm / 32768.0
    assert rate == 8000 and len(out) == n
    assert np.abs(out - exp).max() == 0.0


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    ncolors=st.integers(2, 64),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_any_palette(h, w, ncolors, interlace, seed):
    from datalakejson_spark.functions.imagecodecs import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncolors, size=(h, w))]
    dec = decode_gif(encode_gif(img, interlace=interlace))
    assert dec is not None and dec.shape == (h, w, 3)
    assert np.abs(dec - img.astype(np.float32) / 255.0).max() < 1e-6


@settings(max_examples=10, deadline=None)
@given(
    h=st.integers(8, 32),
    w=st.integers(8, 32),
    quality=st.integers(70, 95),
    seed=st.integers(0, 2**31 - 1),
)
def test_progressive_equals_baseline_any_image(h, w, quality, seed):
    """The progressive scan ladder must reconstruct the SAME quantized
    coefficients as the baseline encoding for arbitrary content — the
    strongest cheap invariant over the whole Annex G implementation."""
    from datalakejson_spark.functions.imagecodecs import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    img = np.random.default_rng(seed).uniform(0, 255, size=(h, w, 3)).astype(np.float32)
    base = decode_jpeg(encode_jpeg(img, quality=quality))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality))
    assert prog is not None
    assert np.abs(prog - base).max() == 0.0


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    nch=st.sampled_from([3, 4]),
    cache_bits=st.sampled_from([0, 2, 5]),
    subtract_green=st.booleans(),
    low_entropy=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_webp_vp8l_roundtrip_any_shape(
    h, w, nch, cache_bits, subtract_green, low_entropy, seed
):
    """VP8L is lossless: any shape × cache × subtract-green combination must
    round-trip EXACTLY. ``low_entropy`` biases toward repeated pixels so the
    run/backref token paths get real coverage, not just literals."""
    from datalakejson_spark.functions.webpcodec import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(seed)
    hi = 4 if low_entropy else 256
    img = (rng.integers(0, hi, size=(h, w, nch)) * (64 if low_entropy else 1)).astype(
        np.uint8
    )
    dec = decode_webp(
        encode_webp_lossless(img, cache_bits=cache_bits, subtract_green=subtract_green)
    )
    assert dec is not None and dec.shape == (h, w, 3)
    if nch == 3:
        exp = img.astype(np.float32) / 255.0
    else:
        rgb = img[:, :, :3].astype(np.float32) / 255.0
        a = img[:, :, 3:].astype(np.float32) / 255.0
        exp = rgb * a + (1 - a)
    assert np.abs(dec - exp).max() == 0.0


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    ncolors=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_webp_vp8l_palette_roundtrip(h, w, ncolors, seed):
    """COLOR_INDEXING at arbitrary palette sizes (crosses every pixel-
    bundling width as ncolors passes 2/4/16) must stay exact."""
    from datalakejson_spark.functions.webpcodec import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(seed)
    lut = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    img = lut[rng.integers(0, ncolors, size=(h, w))]
    dec = decode_webp(encode_webp_lossless(img, use_palette=True))
    assert dec is not None
    assert np.abs(dec - img.astype(np.float32) / 255.0).max() == 0.0


@given(
    h=st.integers(1, 23),
    w=st.integers(1, 23),
    th=st.integers(1, 17),
    tw=st.integers(1, 17),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_area_resize_preserves_global_mean(h, w, th, tw, seed):
    """Exact invariant of area (box-filter) resampling: every output bin
    covers an equal-width slice of the input, so the GLOBAL mean survives
    any target size bit-nearly-exactly — for any shape pair, up or down."""
    import numpy as np

    from datalakejson_spark.functions.multimodal import resize_pixels

    rng = np.random.default_rng(seed)
    arr = rng.random((h, w, 3)).astype("float32")
    out = resize_pixels(arr, tw, th)
    assert out.shape == (th, tw, 3)
    np.testing.assert_allclose(
        out.mean(axis=(0, 1)), arr.astype("float64").mean(axis=(0, 1)), atol=1e-5
    )


@given(
    h=st.integers(1, 23),
    w=st.integers(1, 23),
    th=st.integers(1, 17),
    tw=st.integers(1, 17),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_nearest_resize_only_emits_input_values(h, w, th, tw, seed):
    """Nearest-neighbor is pure sampling: every output pixel is some input
    pixel, bit-identical — no interpolation artifacts ever."""
    import numpy as np

    from datalakejson_spark.functions.multimodal import resize_pixels

    rng = np.random.default_rng(seed)
    arr = rng.random((h, w, 3)).astype("float32")
    out = resize_pixels(arr, tw, th, method="nearest")
    in_px = {tuple(p) for p in arr.reshape(-1, 3).tolist()}
    assert all(tuple(p) in in_px for p in out.reshape(-1, 3).tolist())
