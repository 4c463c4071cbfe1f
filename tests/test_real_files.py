"""Real third-party media decode (round 7): the pure-spec codecs against
files encoded by REAL external encoders (libjpeg camera photos from the
Rust docs, CPython test-suite GIF/JPEG/WAV/AIFF/AU, IDLE's PNG icons) —
the cross-implementation check a fixture-encoder round-trip cannot
provide. The audio fixtures are one waveform across three containers,
four PCM depths, and two G.711 companding laws: 15+ real files that must
all decode to the same signal.

Dims are verified against CLEAN-ROOM header parses local to this file
(struct reads straight off the container layout), so a decoder that
mis-walks the format cannot self-validate. Skips gracefully when a file
isn't present in the environment.
"""

from __future__ import annotations

import glob
import struct

import numpy as np
import pytest

from datalakejson_spark.functions.imagecodecs import (
    decode_gif,
    decode_jpeg,
    decode_png,
)


def _first(*patterns: str) -> str | None:
    for pat in patterns:
        hits = sorted(glob.glob(pat))
        if hits:
            return hits[0]
    return None


def _png_header_dims(payload: bytes) -> tuple[int, int]:
    # IHDR is always the first chunk: width/height at fixed offsets 16/20
    assert payload[12:16] == b"IHDR"
    w, h = struct.unpack_from(">II", payload, 16)
    return w, h


def _jpeg_header_dims(payload: bytes) -> tuple[int, int]:
    # marker walk to the first SOFn (0xC0-0xCF except DHT/DAC/RST)
    pos = 2
    while pos + 4 <= len(payload):
        assert payload[pos] == 0xFF
        marker = payload[pos + 1]
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack_from(">HH", payload, pos + 5)
            return w, h
        pos += 2 + seglen
    raise AssertionError("no SOF marker")


@pytest.mark.parametrize(
    "patterns",
    [
        # real camera JPEG (Rust embedded-book asset, libjpeg-encoded)
        ("/root/.rustup/toolchains/*/share/doc/rust/html/embedded-book/assets/f3.jpg",),
        ("/root/.rustup/toolchains/*/share/doc/rust/html/embedded-book/assets/verify.jpeg",),
        # CPython test-suite JPEG
        ("/root/.pyenv/versions/*/lib/python*/test/test_email/data/python.jpg",),
    ],
)
def test_real_jpeg_decodes_with_header_dims(patterns):
    path = _first(*patterns)
    if path is None:
        pytest.skip("file not present in this environment")
    payload = open(path, "rb").read()
    w, h = _jpeg_header_dims(payload)
    out = decode_jpeg(payload)
    assert out is not None, path
    assert out.shape == (h, w, 3)
    assert np.isfinite(out).all() and 0.0 <= out.min() and out.max() <= 1.0
    assert out.std() > 0.01  # real photographic content, not a zero plane


def test_real_png_icons_decode_with_header_dims():
    paths = sorted(
        glob.glob("/root/.pyenv/versions/3.11*/lib/python*/idlelib/Icons/idle_*.png")
    )
    if not paths:
        pytest.skip("no IDLE icons in this environment")
    for path in paths:
        payload = open(path, "rb").read()
        w, h = _png_header_dims(payload)
        out = decode_png(payload)
        assert out is not None, path
        assert out.shape == (h, w, 3), path
        assert np.isfinite(out).all(), path


def test_real_gif_decodes():
    path = _first(
        "/root/.pyenv/versions/*/lib/python*/test/test_email/data/python.gif",
        "/root/.pyenv/install_local_python.gif",
    )
    if path is None:
        pytest.skip("no GIF in this environment")
    payload = open(path, "rb").read()
    out = decode_gif(payload)
    assert out is not None
    assert out.ndim == 3 and out.shape[2] == 3
    assert np.isfinite(out).all()


def test_real_wavs_cross_depth_agreement():
    """CPython's audiodata fixtures are ONE recorded pluck encoded at
    8/16/24/32-bit PCM plus WAVE_FORMAT_EXTENSIBLE — five REAL external
    encodings of the same waveform. Decoding all of them and comparing
    waveforms is an independent cross-check no fixture round-trip gives:
    24/32-bit and EXTENSIBLE must agree with 16-bit within 16-bit
    quantization (2^-15), 8-bit within its own step (2^-7)."""
    from datalakejson_spark.functions.multimodal import decode_wav

    decoded = {}
    for name in ("pluck-pcm8.wav", "pluck-pcm16.wav", "pluck-pcm24.wav",
                 "pluck-pcm24-ext.wav", "pluck-pcm32.wav"):
        # not every pyenv version ships every depth — take any that has it
        path = _first(
            f"/root/.pyenv/versions/*/lib/python*/test/audiodata/{name}"
        )
        if path is None:
            continue
        out = decode_wav(open(path, "rb").read())
        assert out is not None, name
        rate, arr = out
        assert rate == 11025 and len(arr) == 3307, name
        decoded[name] = arr
    if {"pluck-pcm16.wav", "pluck-pcm24.wav"} - set(decoded):
        pytest.skip("no CPython audiodata in this environment")
    ref = decoded["pluck-pcm16.wav"]
    for name, arr in decoded.items():
        # the 16-bit file is its own quantization (possibly dithered) of
        # the same master: deep formats land within ~3 LSBs of 16-bit
        # (measured 7.07e-5), 8-bit within its own step
        tol = 2 ** -7 if "pcm8" in name else 1e-4
        assert np.abs(arr - ref).max() <= tol, name


def test_real_audio_cross_container_agreement():
    """CPython 3.10's audiodata is the SAME pluck in three containers
    (WAV, AIFF, AU) at four PCM depths plus G.711 mu-law and A-law AIFC/AU
    — 15 real externally-encoded files. Every decode must agree with the
    16-bit WAV waveform within its encoding's quantization: PCM within
    ~3 LSBs of 16-bit, 8-bit within 2^-7, G.711 companding within ~0.012
    (8-bit log quantization of a 0.12-RMS signal). One decoder family
    agreeing with itself across three independent container formats and
    two companding laws cannot be a mirror bug."""
    import os

    from datalakejson_spark.functions.multimodal import decode_audio

    base = _first("/root/.pyenv/versions/3.10*/lib/python*/test/audiodata")
    if base is None or not os.path.isdir(base):
        pytest.skip("no python3.10 audiodata in this environment")
    names = sorted(os.listdir(base))
    if "pluck-pcm16.wav" not in names or len(names) < 10:
        pytest.skip("audiodata incomplete")
    ref = decode_audio(open(f"{base}/pluck-pcm16.wav", "rb").read())[1]
    for name in names:
        out = decode_audio(open(f"{base}/{name}", "rb").read())
        assert out is not None, name
        rate, arr = out
        assert rate == 11025 and len(arr) == 3307, name
        if "ulaw" in name or "alaw" in name:
            tol = 0.013
        elif "pcm8" in name:
            tol = 2 ** -7
        else:
            tol = 1e-4
        assert float(np.abs(arr - ref).max()) <= tol, name


def test_real_sun_ulaw_phone_audio():
    """The CPython email-test .au file is a REAL Sun mu-law recording at
    the classic 8012 Hz phone rate — decode it end-to-end."""
    from datalakejson_spark.functions.multimodal import decode_audio

    path = _first(
        "/root/.pyenv/versions/*/lib/python*/test/test_email/data/sndhdr.au"
    )
    if path is None:
        pytest.skip("no sndhdr.au in this environment")
    out = decode_audio(open(path, "rb").read())
    assert out is not None
    rate, arr = out
    assert rate == 8012 and len(arr) == 28110
    assert np.isfinite(arr).all() and float(np.abs(arr).max()) <= 1.0
    assert float(np.sqrt((arr ** 2).mean())) > 0.001  # real signal, not DC


def test_real_au_aiff_flow_through_spark_path(spark):
    """End-to-end Spark path: REAL AU (Sun mu-law) and AIFF (BE PCM)
    payloads flow through extract_audio_features with correct codec
    attribution and real sample-level features."""
    from datalakejson_spark.functions.multimodal import (
        ASSET_SCHEMA,
        extract_audio_features,
    )

    au = _first("/root/.pyenv/versions/3.10*/lib/python*/test/audiodata/pluck-ulaw.au")
    aiff = _first(
        "/root/.pyenv/versions/3.10*/lib/python*/test/audiodata/pluck-pcm16.aiff"
    )
    if au is None or aiff is None:
        pytest.skip("no python3.10 audiodata in this environment")
    assets = spark.createDataFrame(
        [
            ("au1", "audio", open(au, "rb").read(), None),
            ("af1", "audio", open(aiff, "rb").read(), None),
        ],
        ASSET_SCHEMA,
    )
    rows = {r.asset_id: r for r in extract_audio_features(assets).collect()}
    assert rows["au1"].decoded_ok and rows["au1"].codec == "au"
    assert rows["af1"].decoded_ok and rows["af1"].codec == "aiff"
    for r in rows.values():
        assert r.sample_rate == 11025
        assert abs(r.duration_ms - 300) < 5  # 3307 / 11025 ≈ 300 ms
        assert 0.10 < r.rms < 0.15  # the pluck's measured RMS ≈ 0.123
