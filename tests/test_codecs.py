"""Compressed-format codec tests (L5, round-6: verdict "missing #1").

PNG, baseline JPEG, and IMA ADPCM are implemented from their public specs
with stdlib + numpy only (imagecodecs.py / audiocodecs.py). The encoders
exist solely to make fixtures; to keep encoder/decoder mirror-bugs from
self-validating, the primitives are pinned here against INDEPENDENT ground
truth: the DCT basis against the direct DCT-II double-sum definition, the
zigzag table against its defining diagonal walk, Huffman code assignment
against canonical-prefix properties, PNG filters against hand-computed
bytes, and ADPCM against the spec's step/index tables' published endpoints.

No SparkSession needed — these are plain-Python worker-side functions; the
Spark-plumbing integration (tier labels, mapInPandas batching) is covered
in tests/test_udfs.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from datalakejson_spark.functions.audiocodecs import (
    INDEX_TABLE,
    STEP_TABLE,
    encode_ima_adpcm_wav,
)
from datalakejson_spark.functions.imagecodecs import (
    ZIGZAG,
    _DCT_A,
    build_huffman_codes,
    _STD_AC_LUMA,
    _STD_DC_LUMA,
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_png,
)
from datalakejson_spark.functions.multimodal import decode_wav


# ---------------------------------------------------------------- primitives


def test_dct_basis_matches_direct_dct2_definition():
    """The basis-matrix IDCT/FDCT must agree with the textbook DCT-II
    double-sum — computed here independently, term by term."""
    rng = np.random.default_rng(7)
    block = rng.uniform(-128, 127, size=(8, 8))
    via_basis = _DCT_A @ block @ _DCT_A.T
    direct = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(0.125) if u == 0 else 0.5
            cv = np.sqrt(0.125) if v == 0 else 0.5
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            direct[u, v] = cu * cv * s
    assert np.abs(via_basis - direct).max() < 1e-9
    # and the inverse inverts
    assert np.abs(_DCT_A.T @ via_basis @ _DCT_A - block).max() < 1e-9


def test_zigzag_order_matches_diagonal_walk():
    """Re-derive the zigzag order from its definition (anti-diagonals,
    alternating direction) and compare to the hardcoded table."""
    order = []
    for d in range(15):
        cells = [(i, d - i) for i in range(8) if 0 <= d - i < 8]
        if d % 2 == 0:
            cells.reverse()  # even diagonals walk up-right
        order.extend(r * 8 + c for r, c in cells)
    assert order == list(ZIGZAG)
    # involution sanity: it is a permutation of 0..63
    assert sorted(ZIGZAG) == list(range(64))


def test_huffman_codes_are_canonical_and_prefix_free():
    for bits, vals in (_STD_DC_LUMA, _STD_AC_LUMA):
        codes = build_huffman_codes(bits, vals)
        assert len(codes) == sum(bits)
        seen = []
        for sym, (code, length) in codes.items():
            assert code < (1 << length)
            seen.append((length, code))
        # prefix-free: no code is a prefix of a longer one
        for l1, c1 in seen:
            for l2, c2 in seen:
                if l1 < l2:
                    assert (c2 >> (l2 - l1)) != c1, "prefix violation"
    # Annex C canonical property on a known table: T.81's DC luminance codes
    dc = build_huffman_codes(*_STD_DC_LUMA)
    assert dc[0] == (0b00, 2) and dc[1] == (0b010, 3) and dc[11] == (0b111111110, 9)


def test_png_sub_filter_bytes_hand_computed():
    """One row, Sub filter: encoded bytes must equal the hand-derived
    deltas — independent of the decoder."""
    img = np.array([[10, 20, 15, 250, 5, 7]], dtype=np.uint8)  # 2 RGB pixels
    payload = encode_png(img.reshape(1, 2, 3), filters=1)
    # IDAT is the third chunk (IHDR, IDAT, IEND); scanline = filter byte + data
    off = 8 + 8 + 13 + 4  # sig + IHDR hdr + IHDR data + crc
    (ln,) = struct.unpack_from(">I", payload, off)
    raw = zlib.decompress(payload[off + 8 : off + 8 + ln])
    # Sub: first pixel unchanged, second stores (cur - prev_pixel_byte) & 255
    assert raw == bytes([1, 10, 20, 15, (250 - 10) % 256, (5 - 20) % 256, (7 - 15) % 256])


# ---------------------------------------------------------------- PNG


@pytest.mark.parametrize("filters", [0, 1, 2, 3, 4, [0, 1, 2, 3, 4]])
@pytest.mark.parametrize("nch", [1, 3, 4])
def test_png_roundtrip_all_filters(filters, nch):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(13, 17, nch), dtype=np.uint8)
    dec = decode_png(encode_png(img, filters=filters))
    assert dec is not None and dec.shape == (13, 17, 3)
    if nch == 1:
        exp = np.repeat(img, 3, axis=2).astype(np.float32) / 255.0
    elif nch == 3:
        exp = img.astype(np.float32) / 255.0
    else:  # RGBA composited over white
        rgb = img[:, :, :3].astype(np.float32) / 255.0
        a = img[:, :, 3:].astype(np.float32) / 255.0
        exp = rgb * a + (1 - a)
    assert np.abs(dec - exp).max() < 1e-6


def test_png_rejects_malformed_and_unsupported():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    assert decode_png(b"\x89PNG\r\n\x1a\njunk") is None
    assert decode_png(good[:30]) is None  # truncated
    # flip the interlace byte inside IHDR: the stream now claims Adam7 but
    # carries a non-interlaced (shorter) pixel stream → truncation, not a crash
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1  # IHDR data byte 12 = interlace
    assert decode_png(bytes(bad)) is None
    # corrupt the DEFLATE stream → None, not an exception
    bad = bytearray(good)
    bad[8 + 8 + 13 + 4 + 8 + 2] ^= 0xFF
    assert decode_png(bytes(bad)) is None


# ---------------------------------------------------------------- JPEG


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255.0 / w, yy * 255.0 / h, (xx + yy) * 255.0 / (w + h)], axis=2
    ).astype(np.float32)


@pytest.mark.parametrize("subsample", ["444", "420"])
def test_jpeg_roundtrip_psnr(subsample):
    img = _gradient(24, 40)
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample))
    assert dec is not None and dec.shape == (24, 40, 3)
    mse = float(np.mean((dec * 255 - img) ** 2))
    psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
    assert psnr > (45 if subsample == "444" else 35), psnr


def test_jpeg_odd_dimensions_and_grayscale():
    img = _gradient(17, 19)
    for sub in ("444", "420"):
        dec = decode_jpeg(encode_jpeg(img, quality=85, subsample=sub))
        assert dec is not None and dec.shape == (17, 19, 3)
    g = img[:, :, 0]
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec is not None and dec.shape == (17, 19, 3)
    # grayscale replicates channels
    assert np.abs(dec[:, :, 0] - dec[:, :, 1]).max() < 1e-6


def test_jpeg_uniform_block_exact():
    """A flat image is DC-only: the decoded value is hand-computable —
    DC = 8·(v−128), quantized by Q[0,0], dequantized, +128. Pins the whole
    DC path (FDCT scale, quant, Huffman, IDCT) to arithmetic ground truth."""
    v = 130.0
    dec = decode_jpeg(encode_jpeg(np.full((16, 16, 3), v, np.float32), quality=95))
    assert dec is not None
    # quality 95 scales Annex-K luma Q[0,0]=16 by (200-2*95)/100 → 2 (min 1)
    q00 = max((16 * (200 - 2 * 95) + 50) // 100, 1)
    expected = (round(8 * (v - 128.0) / q00) * q00) / 8.0 + 128.0
    assert np.abs(dec * 255.0 - expected).max() < 0.75  # chroma rounding slack


def test_jpeg_rejects_malformed_and_mislabeled():
    assert decode_jpeg(b"\xff\xd8\xff\xe0 fake") is None
    good = bytearray(encode_jpeg(_gradient(8, 8), quality=80))
    # rewrite SOF0 to SOF2: the stream now CLAIMS progressive but carries a
    # baseline combined scan (Ss=0, Se=63), which Annex G forbids → None
    i = bytes(good).index(b"\xff\xc0")
    good[i + 1] = 0xC2
    assert decode_jpeg(bytes(good)) is None
    # arithmetic-coded SOF (0xC9) stays unsupported
    good = bytearray(encode_jpeg(_gradient(8, 8), quality=80))
    i = bytes(good).index(b"\xff\xc0")
    good[i + 1] = 0xC9
    assert decode_jpeg(bytes(good)) is None


def test_jpeg_multiscan_baseline_refused_not_silently_wrong():
    """A baseline SOS covering fewer components than the frame (spec-legal
    non-interleaved multi-scan, T.81 B.2.3) is unimplemented: decoding only
    the first scan would yield zero planes for the rest with decoded_ok
    true. The guard must return None (failed-decode contract) instead."""
    data = bytearray(encode_jpeg(_gradient(8, 8), quality=80))
    i = bytes(data).index(b"\xff\xda")
    seg = bytes(data[i + 2 : i + 14])  # len(2) ns(1) 3×(cs,td/ta) ss se ah/al
    assert seg[2] == 3
    single = bytes([0, 8, 1, seg[3], seg[4], seg[9], seg[10], seg[11]])
    data[i + 2 : i + 14] = single
    assert decode_jpeg(bytes(data)) is None


# ---------------------------------------------------------------- IMA ADPCM


def test_adpcm_tables_match_spec_endpoints():
    assert len(STEP_TABLE) == 89 and STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    assert list(INDEX_TABLE[:8]) == [-1, -1, -1, -1, 2, 4, 6, 8]
    assert list(INDEX_TABLE[8:]) == list(INDEX_TABLE[:8])  # sign bit mirrors


def test_adpcm_wav_roundtrip_snr():
    rate = 8000
    t = np.arange(rate) / rate
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1234 * t)
    decoded = decode_wav(encode_ima_adpcm_wav(sig, rate))
    assert decoded is not None
    r, out = decoded
    assert r == rate
    n = min(len(out), len(sig))
    err = out[:n] - sig[:n]
    snr = 10 * np.log10(np.mean(sig[:n] ** 2) / np.mean(err**2))
    assert snr > 20, snr  # 4-bit ADPCM lands ~20-30 dB on tonal content


def test_adpcm_malformed_rejected():
    rate = 8000
    wav = bytearray(encode_ima_adpcm_wav(np.zeros(1000), rate))
    # corrupt the first block's step index beyond 88
    data_off = bytes(wav).index(b"data") + 8
    wav[data_off + 2] = 99
    assert decode_wav(bytes(wav)) is None


def test_adpcm_stereo_nonintegral_group_returns_none():
    """A stereo block whose data area isn't whole 4-byte-per-channel
    interleave groups must return None per the docstring contract — not
    raise ValueError from the nibble reshape (direct-call probe; only
    decode_wav's broad except used to mask this)."""
    from datalakejson_spark.functions.audiocodecs import decode_ima_adpcm

    # block_align 14 → data area 6 bytes, not a multiple of 4*2
    assert decode_ima_adpcm(bytes(28), n_channels=2, block_align=14) is None
    # well-formed stereo block (data area exactly one group per channel)
    out = decode_ima_adpcm(bytes(16), n_channels=2, block_align=16)
    # downmixed mono: 1 header + 8 coded samples per channel
    assert out is not None and len(out) == 9


def test_adpcm_features_flow_through_spark_path(spark):
    """End-to-end: an ADPCM payload flows through extract_audio_features
    with real sample-level features (decoded_ok=True, sane duration/RMS)."""
    from datalakejson_spark.functions.multimodal import (
        ASSET_SCHEMA,
        extract_audio_features,
    )

    rate = 4000
    t = np.arange(rate // 2) / rate  # 500 ms
    wav = encode_ima_adpcm_wav(0.4 * np.sin(2 * np.pi * 440 * t), rate)
    assets = spark.createDataFrame(
        [("a1", "audio", wav, None), ("a2", "audio", b"RIFFjunk", None)], ASSET_SCHEMA
    )
    rows = {r.asset_id: r for r in extract_audio_features(assets).collect()}
    assert rows["a1"].decoded_ok and rows["a1"].sample_rate == rate
    assert rows["a1"].codec == "adpcm"  # attempted-decoder attribution
    assert abs(rows["a1"].duration_ms - 500) < 120  # final-block padding slack
    assert 0.2 < rows["a1"].rms < 0.4  # sine RMS ≈ 0.4/√2 ≈ 0.283
    assert not rows["a2"].decoded_ok
    assert rows["a2"].codec == "unknown"  # RIFF but no parseable fmt chunk


# ---------------------------------------------------------------- GIF


def test_gif_roundtrip_plain_and_interlaced():
    from datalakejson_spark.functions.imagecodecs import decode_gif, encode_gif

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 8, size=(21, 33))]
    for interlace in (False, True):
        dec = decode_gif(encode_gif(img, interlace=interlace))
        assert dec is not None and dec.shape == (21, 33, 3)
        assert np.abs(dec - img.astype(np.float32) / 255.0).max() < 1e-6
    # wide palette forces 8-bit LZW codes and CLEAR cadence
    pal = rng.integers(0, 256, size=(200, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 200, size=(15, 27))]
    dec = decode_gif(encode_gif(img))
    assert np.abs(dec - img.astype(np.float32) / 255.0).max() < 1e-6


def test_gif_lzw_actually_compresses_repeats():
    """The DECODER must handle real dictionary codes, not just literals —
    feed it a stream that a compressing encoder would produce by building
    one manually: literal, then code-reuse via the (prev+first) rule."""
    from datalakejson_spark.functions.imagecodecs import _gif_lzw_decode

    # min_code_size=2: clear=4, eoi=5, first dict code=6, width starts at 3
    # stream: CLEAR, 1, 1 -> out [1, 1], dict gains 6=(1,1)
    # then code 6 -> out += (1,1); total [1,1,1,1]
    def pack(codes, width):
        acc = nbits = 0
        out = bytearray()
        for c in codes:
            acc |= c << nbits
            nbits += width
            while nbits >= 8:
                out.append(acc & 255)
                acc >>= 8
                nbits -= 8
        if nbits:
            out.append(acc & 255)
        return bytes(out)

    data = pack([4, 1, 1, 6, 5], 3)
    assert _gif_lzw_decode(data, 2, 4) == [1, 1, 1, 1]


def test_gif_rejects_malformed():
    from datalakejson_spark.functions.imagecodecs import decode_gif, encode_gif

    assert decode_gif(b"GIF89a junk") is None
    assert decode_gif(b"notagif") is None
    good = encode_gif(np.zeros((4, 4, 3), dtype=np.uint8))
    assert decode_gif(good[:20]) is None  # truncated mid-structure


# ---------------------------------------------------------------- TIFF


def test_tiff_roundtrip_rgb_and_gray():
    from datalakejson_spark.functions.imagecodecs import decode_tiff, encode_tiff

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(14, 23, 3), dtype=np.uint8)
    dec = decode_tiff(encode_tiff(img))
    assert dec is not None and dec.shape == (14, 23, 3)
    assert np.abs(dec - img.astype(np.float32) / 255.0).max() < 1e-6
    g = rng.integers(0, 256, size=(9, 11), dtype=np.uint8)
    dec = decode_tiff(encode_tiff(g))
    assert dec.shape == (9, 11, 3)
    assert np.abs(dec[:, :, 0] - g.astype(np.float32) / 255.0).max() < 1e-6


def test_tiff_rejects_compressed_and_malformed():
    from datalakejson_spark.functions.imagecodecs import decode_tiff, encode_tiff

    assert decode_tiff(b"II*\x00junk") is None
    assert decode_tiff(b"nottiff") is None
    good = bytearray(encode_tiff(np.zeros((4, 4, 3), dtype=np.uint8)))
    # claim LZW (5) over an uncompressed strip: the strip is then parsed as
    # LZW and fails (no EOI) — never silently treated as uncompressed
    raw = bytes(good)
    i = raw.index(struct.pack("<HH", 259, 3))
    lzw = bytearray(raw)
    lzw[i + 8] = 5
    assert decode_tiff(bytes(lzw)) is None
    # JPEG-in-TIFF (7) stays rejected outright
    lzw[i + 8] = 7
    assert decode_tiff(bytes(lzw)) is None


# ---------------------------------------------------------------- FLAC


def _flac_stream(frame_payloads: list[bytes], n_ch: int, total: int,
                 rate: int = 8000, bps: int = 16) -> bytes:
    """Assemble a FLAC stream from hand-built frame payloads: real
    STREAMINFO, zeroed MD5, each frame gets its CRC-16 trailer appended
    (the decoder skips CRCs; they're present for layout fidelity)."""
    from datalakejson_spark.functions.audiocodecs import _crc16, _FlacBitWriter

    w = _FlacBitWriter()
    w.write(16, 16), w.write(65535, 16), w.write(0, 24), w.write(0, 24)
    w.write(rate, 20), w.write(n_ch - 1, 3), w.write(bps - 1, 5), w.write(total, 36)
    w.align()
    body = bytes(w.out) + b"\x00" * 16
    out = b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body
    for p in frame_payloads:
        out += p + _crc16(p).to_bytes(2, "big")
    return out


def _flac_frame_header(w, blocksize: int, chan_code: int) -> None:
    """Common hand-built frame header: 8-bit blocksize field, STREAMINFO
    sample rate, 16-bit bps, frame number 0. CRC-8 written by caller."""
    w.write(0x3FFE, 14), w.write(0, 1), w.write(0, 1)
    w.write(6, 4)        # blocksize: 8-bit field follows header
    w.write(0, 4)        # sample rate from STREAMINFO
    w.write(chan_code, 4)
    w.write(4, 3)        # bps = 16
    w.write(0, 1)
    w.write(0, 8)        # UTF-8 frame number 0
    w.write(blocksize - 1, 8)


def test_flac_roundtrip_lossless_all_fixed_orders():
    """The fixture encoder (fixed predictors, Rice) must roundtrip
    BIT-EXACTLY — FLAC is lossless, so any nonzero error is a codec bug."""
    from datalakejson_spark.functions.audiocodecs import decode_flac, encode_flac

    rate = 8000
    t = np.arange(rate // 2) / rate
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1234 * t)
    pcm = np.clip(sig * 32768.0, -32768, 32767).astype(np.int64) / 32768.0
    sizes = {}
    for order in (0, 1, 2, 3, 4):
        payload = encode_flac(sig, rate, blocksize=1024, order=order)
        r, out = decode_flac(payload)
        assert r == rate and len(out) == len(pcm)
        assert np.abs(out - pcm).max() == 0.0, f"order {order} not lossless"
        sizes[order] = len(payload)
    # higher-order prediction must actually compress tonal content below
    # raw 16-bit PCM (order 0 is just Rice over raw samples — no prediction,
    # so it can't beat raw on full-scale content)
    assert sizes[4] < sizes[2] < sizes[0]
    assert sizes[4] < 2 * len(pcm)


def test_flac_stereo_independent_roundtrip():
    from datalakejson_spark.functions.audiocodecs import decode_flac, encode_flac

    rate = 8000
    t = np.arange(1000) / rate
    left = 0.4 * np.sin(2 * np.pi * 300 * t)
    right = -0.2 * np.sin(2 * np.pi * 700 * t)
    r, out = decode_flac(encode_flac(np.stack([left, right], axis=1), rate))
    exp = (
        np.clip(left * 32768, -32768, 32767).astype(np.int64)
        + np.clip(right * 32768, -32768, 32767).astype(np.int64)
    ) / 2.0 / 32768.0
    assert r == rate and np.abs(out - exp).max() == 0.0


def test_flac_lpc_subframe_hand_built():
    """LPC path pinned against the spec recurrence s[i] = res[i] +
    (sum c_j * s[i-1-j]) >> shift — stream built bit-by-bit by hand,
    expectation computed independently here."""
    from datalakejson_spark.functions.audiocodecs import (
        _crc8,
        _FlacBitWriter,
        decode_flac,
    )

    bs, order, shift, coefs = 8, 2, 1, [3, -1]
    warm = [100, 110]
    residuals = [5, -3, 0, 7, -2, 4]
    w = _FlacBitWriter()
    _flac_frame_header(w, bs, chan_code=0)
    w.align()
    hdr = bytes(w.out)
    f = _FlacBitWriter()
    f.write(0, 1), f.write(32 + order - 1, 6), f.write(0, 1)  # LPC order 2
    for s in warm:
        f.write(s, 16)
    f.write(4 - 1, 4)      # qlp precision 4
    f.write(shift, 5)
    for c in coefs:
        f.write(c, 4)
    f.write(0, 2), f.write(0, 4)   # Rice method 0, partition order 0
    f.write(3, 4)                  # rice param
    for r in residuals:
        f.write_rice(r, 3)
    f.align()
    payload = hdr + bytes([_crc8(hdr)]) + bytes(f.out)
    rate, out = decode_flac(_flac_stream([payload], n_ch=1, total=bs))
    expected = list(warm)
    for r in residuals:
        expected.append(r + ((3 * expected[-1] - 1 * expected[-2]) >> shift))
    assert np.abs(out * 32768.0 - np.array(expected)).max() < 1e-9


def test_flac_mid_side_hand_built():
    """Mid/side decorrelation: left = ((mid<<1 | side&1) + side) >> 1,
    right = left - side (libFLAC reconstruction), pinned with constant
    subframes for odd left+right (the dropped-LSB case)."""
    from datalakejson_spark.functions.audiocodecs import (
        _crc8,
        _FlacBitWriter,
        decode_flac,
    )

    left_v, right_v = 1001, 250  # sum odd → side LSB carries the lost bit
    mid, side = (left_v + right_v) >> 1, left_v - right_v
    bs = 4
    w = _FlacBitWriter()
    _flac_frame_header(w, bs, chan_code=10)  # mid/side
    w.align()
    hdr = bytes(w.out)
    f = _FlacBitWriter()
    f.write(0, 1), f.write(0, 6), f.write(0, 1)   # CONSTANT mid (16 bits)
    f.write(mid, 16)
    f.write(0, 1), f.write(0, 6), f.write(0, 1)   # CONSTANT side (17 bits!)
    f.write(side, 17)
    f.align()
    payload = hdr + bytes([_crc8(hdr)]) + bytes(f.out)
    rate, out = decode_flac(_flac_stream([payload], n_ch=2, total=bs))
    assert np.allclose(out * 32768.0, (left_v + right_v) / 2.0)


def test_flac_escaped_partition_and_wasted_bits():
    """Escaped Rice partitions store raw n-bit residuals; wasted-bits
    subframes shift every decoded sample left. Both hand-built."""
    from datalakejson_spark.functions.audiocodecs import (
        _crc8,
        _FlacBitWriter,
        decode_flac,
    )

    bs = 4
    # fixed order 0, escaped partition with 6-bit raw residuals
    w = _FlacBitWriter()
    _flac_frame_header(w, bs, chan_code=0)
    w.align()
    hdr = bytes(w.out)
    f = _FlacBitWriter()
    f.write(0, 1), f.write(8, 6), f.write(0, 1)   # FIXED order 0
    f.write(0, 2), f.write(0, 4)                  # method 0, porder 0
    f.write(0xF, 4)                               # ESCAPE
    f.write(6, 5)                                 # 6 raw bits per residual
    for v in (31, -32, 7, -1):
        f.write(v, 6)
    f.align()
    payload = hdr + bytes([_crc8(hdr)]) + bytes(f.out)
    _, out = decode_flac(_flac_stream([payload], n_ch=1, total=bs))
    assert np.abs(out * 32768.0 - np.array([31, -32, 7, -1])).max() < 1e-9

    # constant subframe with 3 wasted bits: stored value decodes shifted
    w = _FlacBitWriter()
    _flac_frame_header(w, bs, chan_code=0)
    w.align()
    hdr = bytes(w.out)
    f = _FlacBitWriter()
    f.write(0, 1), f.write(0, 6)
    f.write(1, 1)            # wasted flag
    f.write(1, 3)            # unary 2 → wasted = 3
    f.write(41, 13)          # bps 16 - 3 wasted
    f.align()
    payload = hdr + bytes([_crc8(hdr)]) + bytes(f.out)
    _, out = decode_flac(_flac_stream([payload], n_ch=1, total=bs))
    assert np.allclose(out * 32768.0, 41 << 3)


def test_flac_rejects_malformed():
    from datalakejson_spark.functions.audiocodecs import decode_flac, encode_flac

    assert decode_flac(b"fLaCjunk") is None
    assert decode_flac(b"not flac at all") is None
    good = bytearray(encode_flac(np.zeros(100), 8000))
    assert decode_flac(bytes(good[:40])) is None      # truncated metadata
    good[50] ^= 0xFF                                  # break the frame sync
    assert decode_flac(bytes(good)) is None


def test_flac_features_flow_through_spark_path(spark):
    """End-to-end: FLAC payloads through extract_audio_features — real
    compressed-audio decode feeding the standard audio-quality features."""
    from datalakejson_spark.functions.audiocodecs import encode_flac
    from datalakejson_spark.functions.multimodal import (
        ASSET_SCHEMA,
        extract_audio_features,
    )

    rate = 4000
    t = np.arange(rate) / rate  # 1 s
    flac = encode_flac(0.4 * np.sin(2 * np.pi * 440 * t), rate)
    assets = spark.createDataFrame(
        [("f1", "audio", flac, None), ("f2", "audio", b"fLaCbroken", None)],
        ASSET_SCHEMA,
    )
    rows = {r.asset_id: r for r in extract_audio_features(assets).collect()}
    assert rows["f1"].decoded_ok and rows["f1"].sample_rate == rate
    assert rows["f1"].codec == "flac"
    assert rows["f1"].duration_ms == 1000 and rows["f1"].n_samples == rate
    assert abs(rows["f1"].rms - 0.4 / np.sqrt(2)) < 1e-3  # sine RMS exact-ish
    assert not rows["f2"].decoded_ok
    assert rows["f2"].codec == "flac"  # failed attempt keeps its attribution


def test_png_adam7_interlace_hand_built():
    """A 4×4 grayscale Adam7 stream laid out BY HAND from the spec's pass
    geometry — pass k owns pixels (x0+i·dx, y0+j·dy). Values chosen so
    every pass is distinguishable; the decoder must scatter each pass back
    to its true coordinates."""
    # target image: pixel value = 16*y + x (rows y=0..3)
    target = np.array([[16 * y + x for x in range(4)] for y in range(4)])
    # Adam7 on 4×4: pass1 (0,0); pass4 (2,0); pass5 (0,2),(2,2);
    # pass6 (1,0),(3,0),(1,2),(3,2); pass7 rows 1 and 3 complete
    def rows(*scanlines):
        return b"".join(b"\x00" + bytes(s) for s in scanlines)

    raw = (
        rows([target[0, 0]])                      # pass 1: 1×1
        + rows([target[0, 2]])                    # pass 4: 1×1
        + rows([target[2, 0], target[2, 2]])      # pass 5: 1 row × 2
        + rows([target[0, 1], target[0, 3]],      # pass 6: 2 rows × 2
               [target[2, 1], target[2, 3]])
        + rows(list(target[1]), list(target[3]))  # pass 7: rows 1, 3 full
    )
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)  # gray, interlaced
    from datalakejson_spark.functions.imagecodecs import _png_chunk

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    dec = decode_png(payload)
    assert dec is not None and dec.shape == (4, 4, 3)
    assert np.abs(dec[:, :, 0] * 255.0 - target).max() < 1e-5


def test_png_sub_byte_depths_hand_built():
    """1-bit gray and 4-bit palette streams, bytes laid out by hand
    (MSB-first bitfields per the spec)."""
    from datalakejson_spark.functions.imagecodecs import _png_chunk

    def png(ihdr_fields, chunks, raw):
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
            + chunks
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    # 8×2 1-bit gray: row0 = 0b10110001, row1 = 0b01001110
    raw = b"\x00\xb1" + b"\x00\x4e"
    dec = decode_png(png((8, 2, 1, 0, 0, 0, 0), b"", raw))
    assert dec is not None and dec.shape == (2, 8, 3)
    exp = np.array([[1, 0, 1, 1, 0, 0, 0, 1], [0, 1, 0, 0, 1, 1, 1, 0]])
    assert np.array_equal(dec[:, :, 0], exp.astype(np.float32))

    # 3×1 4-bit palette: indices 2, 0, 1 → bytes 0x20, 0x10 (pad nibble)
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    raw = b"\x00\x20\x10"
    dec = decode_png(png((3, 1, 4, 3, 0, 0, 0), _png_chunk(b"PLTE", pal), raw))
    assert dec is not None and dec.shape == (1, 3, 3)
    assert np.array_equal(
        dec[0], np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], dtype=np.float32)
    )


# ----------------------------------------------------- progressive JPEG


def test_progressive_jpeg_bit_exact_vs_baseline():
    """The progressive scan ladder (DC first at Al=1 → DC refine → AC
    spectral bands at Al=1 → AC refine) delivers every bit of every
    quantized coefficient, so the decoded image must be IDENTICAL to the
    baseline encoding at the same quality — any nonzero diff means a scan
    decoder bug. Covers color/gray, 4:2:0, odd dims, noise (refine-heavy),
    and flat content (maximal EOB runs)."""
    from datalakejson_spark.functions.imagecodecs import encode_jpeg_progressive

    rng = np.random.default_rng(9)
    cases = [
        (_gradient(24, 40), 75, "444"),
        (_gradient(24, 40), 90, "420"),
        (_gradient(17, 19), 85, "420"),  # odd dims + subsampling
        (rng.uniform(0, 255, size=(33, 29)).astype(np.float32), 88, "444"),
        (np.full((64, 64, 3), 130.0, np.float32), 95, "444"),  # giant EOB runs
    ]
    for img, q, sub in cases:
        base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q, subsample=sub))
        assert prog is not None
        assert np.abs(prog - base).max() == 0.0, (q, sub)


def test_progressive_jpeg_scan_layers_decode_independently():
    """Each successive-approximation layer must be decodable on its own:
    dc_al/ac_al=0 skips the refinement scans entirely (pure spectral
    selection) and still reconstructs exactly."""
    from datalakejson_spark.functions.imagecodecs import encode_jpeg_progressive

    img = _gradient(16, 24)
    base = decode_jpeg(encode_jpeg(img, quality=80))
    for dc_al, ac_al in ((0, 0), (1, 0), (0, 1)):
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=80, dc_al=dc_al, ac_al=ac_al)
        )
        assert np.abs(prog - base).max() == 0.0, (dc_al, ac_al)


def test_progressive_jpeg_rejects_malformed():
    from datalakejson_spark.functions.imagecodecs import encode_jpeg_progressive

    good = bytearray(encode_jpeg_progressive(_gradient(8, 8), quality=80))
    # truncate mid-scan → None, not an exception
    assert decode_jpeg(bytes(good[: len(good) // 2])) is None
    # a baseline-style combined scan (Ss=0, Se=63) is illegal in progressive
    i = bytes(good).index(b"\xff\xda")
    ns = good[i + 4]
    good[i + 5 + 2 * ns + 1] = 63  # Se byte of the DC scan
    assert decode_jpeg(bytes(good)) is None


def test_progressive_jpeg_noninterleaved_dc_scans():
    """T.81 A.2.2: a single-component (Ns=1) DC scan walks the component's
    TRUE block raster, not the padded MCU grid — spec-valid per-component
    DC scan scripts (mozjpeg/jpegtran custom scans) must decode bit-exact.
    The 24x8 4:2:0 case has true luma grid 3x1 vs padded 4x2, the shape
    that desynced the pre-fix decoder (review finding, reproduced)."""
    from datalakejson_spark.functions.imagecodecs import encode_jpeg_progressive

    for h, w, sub in ((24, 8, "420"), (24, 40, "420"), (17, 19, "444")):
        img = _gradient(h, w)
        base = decode_jpeg(encode_jpeg(img, quality=80, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(
                img, quality=80, subsample=sub, dc_interleaved=False
            )
        )
        assert prog is not None, (h, w, sub)
        assert np.abs(prog - base).max() == 0.0, (h, w, sub)


def test_flac_reserved_channel_code_rejected():
    """Channel-assignment codes 11-15 are reserved (RFC 9639): a frame
    carrying one must decode to None, not garbage right/side stereo
    (review finding, reproduced)."""
    from datalakejson_spark.functions.audiocodecs import decode_flac, encode_flac

    good = bytearray(encode_flac(np.zeros(192), 8000, blocksize=192))
    idx = bytes(good).index(b"\xff\xf8")  # frame sync
    good[idx + 3] = (11 << 4) | (good[idx + 3] & 0x0F)  # chan code → reserved 11
    assert decode_flac(bytes(good)) is None


# ---------------------------------------------------------------- Y4M


def test_y4m_chroma_modes():
    """C420 / C422 / C444 / Cmono planar layouts all parse; luma is
    byte-identical across modes (only the chroma plane sizes differ)."""
    from datalakejson_spark.functions.multimodal import decode_y4m

    w, h = 6, 4
    luma = bytes(range(w * h))
    for mode, chroma_bytes in (
        ("C420", 2 * (3 * 2)), ("C422", 2 * (3 * 4)),
        ("C444", 2 * (6 * 4)), ("Cmono", 0),
    ):
        payload = (
            f"YUV4MPEG2 W{w} H{h} F25:1 {mode}\n".encode()
            + b"FRAME\n" + luma + b"\x55" * chroma_bytes
        )
        decoded = decode_y4m(payload)
        assert decoded is not None, mode
        dw, dh, lumas = decoded
        assert (dw, dh, len(lumas)) == (w, h, 1)
        assert lumas[0].tobytes() == luma
    # unknown chroma mode still rejected
    assert decode_y4m(b"YUV4MPEG2 W2 H2 C411\nFRAME\n" + b"\x00" * 6) is None


def test_tiff_lzw_roundtrip_and_predictor():
    """TIFF 6.0 LZW (MSB-first, early change) + horizontal-differencing
    predictor: every compression/predictor combination roundtrips exactly,
    including payloads large enough to cross the width bumps (511/1023/
    2047) and the 4094-entry dictionary reset."""
    from datalakejson_spark.functions.imagecodecs import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(7)
    for data in (
        b"",
        b"A",
        b"TOBEORNOTTOBEORTOBEORNOT" * 50,
        bytes(rng.integers(0, 256, 60000, dtype=np.uint8)),  # crosses reset
        b"\x00" * 30000,
    ):
        assert _tiff_lzw_decode(_tiff_lzw_encode(data)) == data, len(data)
    img = rng.integers(0, 256, size=(14, 23, 3), dtype=np.uint8)
    for comp in (1, 5):
        for pred in (1, 2):
            dec = decode_tiff(encode_tiff(img, compression=comp, predictor=pred))
            assert dec is not None, (comp, pred)
            assert np.abs(dec - img.astype(np.float32) / 255.0).max() < 1e-6
    # LZW must actually compress repetitive content
    big = np.tile(img[:1], (40, 1, 1))
    assert len(encode_tiff(big, compression=5)) < len(encode_tiff(big)) / 2


def test_tiff_lzw_early_change_hand_pinned():
    """The early-change boundary, pinned independently of the encoder: a
    stream whose dictionary reaches exactly 510 entries must read its NEXT
    code at 10 bits — the decoder's one-entry lag behind the encoder is
    the famous TIFF-LZW off-by-one."""
    from datalakejson_spark.functions.imagecodecs import _tiff_lzw_decode

    # build codes by hand: CLEAR, then 253 literals (dict grows to 510
    # after the 253rd — entries appended from the 2nd literal on), then one
    # 10-bit literal, then EOI at 10 bits.
    def pack(codes_widths):
        acc = nbits = 0
        out = bytearray()
        for code, width in codes_widths:
            acc = (acc << width) | code
            nbits += width
            while nbits >= 8:
                nbits -= 8
                out.append((acc >> nbits) & 0xFF)
            acc &= (1 << nbits) - 1
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)

    lits = [i % 251 for i in range(253)]
    codes = [(256, 9)] + [(v, 9) for v in lits]
    # after 253 literals the decoder's table holds 258+252=510 entries →
    # width is now 10 for everything that follows
    codes += [(77, 10), (257, 10)]
    out = _tiff_lzw_decode(pack(codes))
    assert out == bytes(lits) + bytes([77])


def test_wav_float_clamped_and_nan_scrubbed():
    """IEEE-float WAVs from real DAWs exceed full scale and can carry NaN;
    decode must stay in [-1, 1] with NaN scrubbed or downstream RMS/ZCR
    features are silently poisoned while decoded_ok=True (r7 review)."""
    import struct as S

    from datalakejson_spark.functions.multimodal import decode_wav

    bad = np.array([0.5, 1.5, -2.0, np.nan], dtype="<f4").tobytes()
    fmt = S.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (b"WAVE" + b"fmt " + S.pack("<I", len(fmt)) + fmt
            + b"data" + S.pack("<I", len(bad)) + bad)
    out = decode_wav(b"RIFF" + S.pack("<I", len(body)) + body)
    assert out is not None
    arr = out[1]
    assert np.isfinite(arr).all() and float(np.abs(arr).max()) <= 1.0
    assert list(arr) == [0.5, 1.0, -1.0, 0.0]


def test_wav_odd_length_data_truncates_consistently():
    """A data chunk one byte short of whole samples (buggy writers counting
    the pad byte) must truncate at EVERY width, not None out at 16/32-bit
    while 24-bit truncates (r7 review)."""
    import struct as S

    from datalakejson_spark.functions.multimodal import decode_wav

    for bits, sample in ((16, b"\x00\x10"), (24, b"\x00\x00\x10"),
                         (32, b"\x00\x00\x00\x10")):
        data = sample * 3 + b"\x00"  # 3 whole samples + 1 stray byte
        fmt = S.pack("<HHIIHH", 1, 1, 8000, 8000 * bits // 8, bits // 8, bits)
        body = (b"WAVE" + b"fmt " + S.pack("<I", len(fmt)) + fmt
                + b"data" + S.pack("<I", len(data)) + data)
        out = decode_wav(b"RIFF" + S.pack("<I", len(body)) + body)
        assert out is not None and len(out[1]) == 3, bits


def test_aiff_ssnd_padding_not_decoded_as_samples():
    """COMM's frame count bounds the samples: SSND block-alignment padding
    or trailing bytes must not skew n_samples/duration/rms (r7 review)."""
    import struct as S

    from datalakejson_spark.functions.audiocodecs import decode_aiff

    pcm = np.array([1000, -1000, 2000, -2000], dtype=">i2").tobytes()
    ext = S.pack(">HQ", 16383 + 13 - 1, 8000 << (64 - 13))  # rate 8000
    comm = S.pack(">HIH", 1, 4, 16) + ext
    ssnd = S.pack(">II", 0, 0) + pcm + b"\x00" * 6  # 3 bogus trailing samples
    body = (b"AIFF" + b"COMM" + S.pack(">I", len(comm)) + comm
            + b"SSND" + S.pack(">I", len(ssnd)) + ssnd)
    out = decode_aiff(b"FORM" + S.pack(">I", len(body)) + body)
    assert out is not None
    rate, arr = out
    assert rate == 8000 and len(arr) == 4  # not 7


# ---------------------------------------------------------------------------
# Image resize (round 9): exact area resampling + nearest, PPM interchange
# ---------------------------------------------------------------------------
def test_resample_weights_partition_of_unity():
    """Every output bin's weights over input pixels sum to exactly 1 (the
    box filter is a partition of unity), for down/up/identity scales; the
    identity scale yields the identity matrix."""
    import numpy as np

    from datalakejson_spark.functions.multimodal import _resample_weights

    for n_in, n_out in [(7, 3), (3, 7), (4, 4), (1024, 17), (5, 1), (1, 5)]:
        w = _resample_weights(n_in, n_out)
        assert w.shape == (n_out, n_in)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)
        assert (w >= 0).all()
    np.testing.assert_array_equal(_resample_weights(4, 4), np.eye(4))


def test_resize_area_exact_means():
    """Area resampling computes exact box means: checkerboard 2x2 -> 1x1 is
    the global mean; 4x2 -> 2x1 gives per-half means; constants stay
    constant at any target size."""
    import numpy as np

    from datalakejson_spark.functions.multimodal import resize_pixels

    checker = np.zeros((2, 2, 3), dtype="float32")
    checker[0, 0] = checker[1, 1] = 1.0
    out = resize_pixels(checker, 1, 1)
    np.testing.assert_allclose(out, 0.5, atol=1e-7)

    grad = np.zeros((2, 4, 3), dtype="float32")
    grad[:, :2] = 0.25
    grad[:, 2:] = 0.75
    out = resize_pixels(grad, 2, 1)  # width 2, height 1
    np.testing.assert_allclose(out[0, 0], 0.25, atol=1e-7)
    np.testing.assert_allclose(out[0, 1], 0.75, atol=1e-7)

    const = np.full((5, 3, 3), 0.3, dtype="float32")
    for w, h in [(7, 2), (1, 1), (3, 5)]:
        np.testing.assert_allclose(resize_pixels(const, w, h), 0.3, atol=1e-6)


def test_resize_nearest_center_rule():
    """Nearest-neighbor upscale replicates each source pixel into its
    block (center-rule index mapping), preserving exact values."""
    import numpy as np

    from datalakejson_spark.functions.multimodal import resize_pixels

    quad = np.zeros((2, 2, 3), dtype="float32")
    quad[0, 0, 0] = 1.0  # red TL
    quad[1, 1, 2] = 1.0  # blue BR
    out = resize_pixels(quad, 4, 4, method="nearest")
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(out[:2, :2], np.broadcast_to(quad[0, 0], (2, 2, 3)))
    np.testing.assert_array_equal(out[2:, 2:], np.broadcast_to(quad[1, 1], (2, 2, 3)))


def test_encode_ppm_roundtrips_through_numpy_decoder():
    """encode_ppm output decodes back bit-exactly through the same numpy
    tier (values on the 1/255 grid survive the float round-trip)."""
    import numpy as np

    from datalakejson_spark.functions.multimodal import (
        _decode_ppm_numpy,
        encode_ppm,
    )

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(9, 5, 3)).astype("float32") / 255.0
    back = _decode_ppm_numpy(encode_ppm(arr))
    np.testing.assert_allclose(back, arr, atol=1e-7)


def test_resize_images_spark_path(spark):
    """The mapInPandas operator end-to-end: decodable payloads (PPM + PNG)
    resize to the target dims and re-encode as valid PPM; malformed and
    NULL payloads row through with resized_ok=false and tier attribution."""
    import numpy as np

    from datalakejson_spark.functions.imagecodecs import encode_png
    from datalakejson_spark.functions.multimodal import (
        _decode_ppm_numpy,
        encode_ppm,
        resize_images,
    )

    rng = np.random.default_rng(11)
    ppm_arr = rng.integers(0, 256, size=(8, 6, 3)).astype("float32") / 255.0
    png_arr = (rng.integers(0, 256, size=(5, 7, 3))).astype("uint8")
    rows = [
        ("ppm", bytearray(encode_ppm(ppm_arr))),
        ("png", bytearray(encode_png(png_arr))),
        ("bad", bytearray(b"P6\n9 9\n255\nshort")),  # malformed PPM
        ("null", None),
    ]
    assets = spark.createDataFrame(rows, "asset_id string, payload binary")
    out = {r.asset_id: r for r in resize_images(assets, 4, 3).collect()}

    for aid in ("ppm", "png"):
        r = out[aid]
        assert r.resized_ok and r.width == 4 and r.height == 3
        arr = _decode_ppm_numpy(bytes(r.payload))
        assert arr is not None and arr.shape == (3, 4, 3)
    # area mean of the whole image survives the resize within PPM rounding
    assert abs(
        float(_decode_ppm_numpy(bytes(out["ppm"].payload)).mean())
        - float(ppm_arr.mean())
    ) < 2 / 255
    # malformed-known-format keeps the attempting tier's label (the
    # decode_image_tiered convention), never an environment-dependent one
    assert not out["bad"].resized_ok and out["bad"].payload is None
    assert out["bad"].decode_tier in ("numpy", "pil")
    assert not out["null"].resized_ok and out["null"].decode_tier == "none"


# ---------------------------------------------------------------------------
# Audio resample (round 9): deterministic rate conversion + WAV interchange
# ---------------------------------------------------------------------------
def test_resample_signal_integer_decimation_exact():
    """Integer-factor downsampling is the exact box average; DC level and
    length bookkeeping are preserved."""
    import numpy as np

    from datalakejson_spark.functions.multimodal import resample_signal

    x = np.arange(12, dtype="float32")
    out = resample_signal(x, 8000, 4000)  # factor 2
    np.testing.assert_allclose(out, [0.5, 2.5, 4.5, 6.5, 8.5, 10.5])

    const = np.full(1000, 0.25, dtype="float32")
    for target in (16_000, 11_025, 48_000):
        res = resample_signal(const, 44_100, target)
        np.testing.assert_allclose(res, 0.25, atol=1e-6)
        assert len(res) == round(1000 * target / 44_100)

    # tail remainder: length follows round(n*out/in), never floor-truncation
    assert len(resample_signal(np.ones(1001, "float32"), 48_000, 16_000)) == 334
    assert len(resample_signal(np.ones(1003, "float32"), 48_000, 16_000)) == 334
    tail = resample_signal(np.arange(5, dtype="float32"), 48_000, 16_000)
    assert len(tail) == 2  # round(5/3): 1 full window + the 2-sample tail
    np.testing.assert_allclose(tail, [1.0, 3.5])


def test_resample_signal_preserves_tone():
    """A mid-band sine survives 48k -> 16k with its RMS nearly intact (the
    box prefilter only attenuates near the new Nyquist)."""
    import numpy as np

    from datalakejson_spark.functions.multimodal import resample_signal

    t = np.arange(48_000) / 48_000.0
    sine = np.sin(2 * np.pi * 440.0 * t).astype("float32")
    res = resample_signal(sine, 48_000, 16_000)
    assert len(res) == 16_000
    rms_in = float(np.sqrt(np.mean(sine.astype("float64") ** 2)))
    rms_out = float(np.sqrt(np.mean(res.astype("float64") ** 2)))
    assert abs(rms_out - rms_in) / rms_in < 0.02


def test_encode_wav_pcm16_roundtrip():
    """The canonical WAV payload decodes back through decode_audio's real
    tier with the stated rate and 16-bit-quantized samples."""
    import numpy as np

    from datalakejson_spark.functions.multimodal import (
        decode_audio,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(3)
    sig = (rng.uniform(-1, 1, 500)).astype("float32")
    rate, back = decode_audio(encode_wav_pcm16(16_000, sig))
    assert rate == 16_000 and len(back) == 500
    np.testing.assert_allclose(back, sig, atol=1.5 / 32767)


def test_resample_audio_spark_path(spark):
    """The mapInPandas operator end-to-end: a 8k WAV upsamples to 16k and
    re-decodes at the target rate; junk payloads row through flagged."""
    import numpy as np

    from datalakejson_spark.functions.multimodal import (
        decode_audio,
        encode_wav_pcm16,
        resample_audio,
    )

    t = np.arange(800) / 8000.0
    sine = np.sin(2 * np.pi * 200.0 * t).astype("float32")
    rows = [
        ("wav", bytearray(encode_wav_pcm16(8000, sine))),
        ("junk", bytearray(b"not audio at all")),
        ("null", None),
    ]
    assets = spark.createDataFrame(rows, "asset_id string, payload binary")
    out = {r.asset_id: r for r in resample_audio(assets, 16_000).collect()}

    ok = out["wav"]
    assert ok.resampled_ok and ok.sample_rate == 16_000 and ok.n_samples == 1600
    rate, back = decode_audio(bytes(ok.payload))
    assert rate == 16_000 and len(back) == 1600
    # DC-free tone stays DC-free and keeps its energy through the chain
    assert abs(float(np.mean(back))) < 1e-3
    assert abs(float(np.sqrt(np.mean(back**2))) - 0.707) < 0.03
    assert not out["junk"].resampled_ok and out["junk"].payload is None
    assert not out["null"].resampled_ok
