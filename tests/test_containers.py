"""Compressed-container metadata tests (L5, round-6).

parse_mp4/parse_mp3 are implemented from the public ISO/IEC 14496-12 box
layout and the MPEG-1/2 audio frame-header layout. Fixture builders
(build_mp4/build_mp3) exist only to make payloads; to keep builder/parser
mirror bugs from self-validating, the parsers are also pinned here against
HAND-CONSTRUCTED byte sequences: a raw MPEG1-L3 header with its frame
length computed from the spec formula, a syncsafe ID3v2 size, a manually
laid-out moov/mvhd, and a 64-bit largesize box.
"""

from __future__ import annotations

import struct

import pytest

from datalakejson_spark.functions.containers import (
    build_mp3,
    build_mp4,
    extract_container_meta,
    frame_sample_plan_from_payloads,
    parse_mp3,
    parse_mp4,
)


# ------------------------------------------------------------- hand pins


def test_mp3_single_frame_hand_constructed():
    """0xFFFB9000 = sync, MPEG1, Layer III, 128 kbps (idx 9), 44100 Hz
    (idx 0), no padding. Spec frame length = 144*128000/44100 = 417."""
    frame = b"\xff\xfb\x90\x00" + b"\x00" * 413
    meta = parse_mp3(frame)
    assert meta == {
        "version": "1",
        "layer": 3,
        "sample_rate": 44100,
        "bitrate_kbps": 128,
        "n_frames": 1,
        "duration_ms": 1152 * 1000 // 44100,
        "vbr": False,
        "has_xing": False,
    }
    # truncated to less than one frame → the partial frame doesn't count
    assert parse_mp3(frame[:100]) is None


def test_mp3_id3v2_syncsafe_skip():
    """ID3v2 size bytes are 7-bit syncsafe: 0x01 0x7F → 255 body bytes."""
    frame = b"\xff\xfb\x90\x00" + b"\x00" * 413
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0x01, 0x7F]) + b"\x00" * 255
    assert parse_mp3(tag + frame)["n_frames"] == 1
    # a non-syncsafe size byte (high bit set) is not a valid ID3v2 tag —
    # the tag is treated as leading garbage and the resync scan still
    # recovers the frame behind it (the ffmpeg/mpg123 behavior)
    bad = b"ID3\x04\x00\x00" + bytes([0, 0, 0x81, 0x7F]) + b"\x00" * 255
    assert parse_mp3(bad + frame)["n_frames"] == 1


def test_mp4_mvhd_hand_layout():
    """Manually laid-out ftyp+moov(mvhd v0, timescale 600, duration 1200)
    → 2000 ms, no tracks."""

    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 600, 1200) + b"\x00" * 80,
    )
    payload = box(b"ftyp", b"isom\x00\x00\x02\x00") + box(b"moov", mvhd)
    meta = parse_mp4(payload)
    assert meta["duration_ms"] == 2000 and meta["tracks"] == []
    assert meta["brand"] == "isom"


def test_mp4_largesize_box():
    """A box with size==1 carries a 64-bit largesize after the type."""

    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 1000, 750) + b"\x00" * 80,
    )
    big_moov = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(mvhd)) + mvhd
    payload = box(b"ftyp", b"isom\x00\x00\x02\x00") + big_moov
    assert parse_mp4(payload)["duration_ms"] == 750


def test_mp4_version1_mvhd():
    """mvhd v1 uses 64-bit times: timescale at +16, duration (8 bytes)
    at +20 after the version word."""

    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    mvhd = box(
        b"mvhd",
        b"\x01\x00\x00\x00"
        + struct.pack(">QQIQ", 0, 0, 90000, 90000 * 3)
        + b"\x00" * 80,
    )
    payload = box(b"ftyp", b"isom\x00\x00\x02\x00") + box(b"moov", mvhd)
    assert parse_mp4(payload)["duration_ms"] == 3000


# ------------------------------------------------------------- roundtrip


def test_mp4_roundtrip_tracks():
    meta = parse_mp4(build_mp4(duration_ms=3000, width=1280, height=720,
                               fps=30, audio_rate=48000))
    assert meta["duration_ms"] == 3000
    kinds = {t["kind"]: t for t in meta["tracks"]}
    v, a = kinds["video"], kinds["audio"]
    assert (v["codec"], v["width"], v["height"], v["n_samples"]) == (
        "avc1", 1280, 720, 90)
    assert (a["codec"], a["sample_rate"], a["channels"]) == ("mp4a", 48000, 2)


def test_mp3_walk_counts_and_vbr():
    meta = parse_mp3(build_mp3(n_frames=38, bitrate_kbps=128))
    assert meta["n_frames"] == 38 and not meta["vbr"]
    assert meta["duration_ms"] == 38 * 1152 * 1000 // 44100
    meta = parse_mp3(build_mp3(n_frames=40, id3_bytes=333, vbr_second_rate=160))
    assert meta["n_frames"] == 40 and meta["vbr"]
    assert 128 < meta["bitrate_kbps"] < 160  # mean over the two halves


@pytest.mark.parametrize(
    "payload",
    [b"", b"nonsense", b"\xff\xe0 nope", b"ID3\x04\x00\x00\x00\x00\x00\x00"],
)
def test_containers_reject_malformed(payload):
    assert parse_mp4(payload) is None
    assert parse_mp3(payload) is None


def test_mp4_without_moov_rejected():
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom\x00\x00\x02\x00"
    assert parse_mp4(ftyp + struct.pack(">I", 8) + b"mdat") is None
    # malformed inner box size terminates the walk instead of raising
    assert parse_mp4(ftyp + struct.pack(">I", 3) + b"moov") is None


# ------------------------------------------------------------- Spark path


def test_container_meta_flows_through_spark(spark):
    from datalakejson_spark.functions.multimodal import ASSET_SCHEMA

    assets = spark.createDataFrame(
        [
            ("v1", "video", build_mp4(duration_ms=2500, width=640, height=360), None),
            ("a1", "audio", build_mp3(n_frames=77), None),
            ("x1", "video", b"not a container", None),
            ("x2", "video", None, None),
        ],
        ASSET_SCHEMA,
    )
    rows = {r.asset_id: r for r in extract_container_meta(assets).collect()}
    v1 = rows["v1"]
    assert v1.parsed_ok and v1.container == "mp4" and v1.duration_ms == 2500
    assert (v1.width, v1.height, v1.video_codec, v1.audio_codec) == (
        640, 360, "avc1", "mp4a")
    a1 = rows["a1"]
    assert a1.parsed_ok and a1.container == "mp3" and a1.n_frames == 77
    assert a1.sample_rate == 44100 and a1.bitrate_kbps == 128
    assert not rows["x1"].parsed_ok and not rows["x2"].parsed_ok


def test_frame_sample_plan_uses_real_container_duration(spark):
    from datalakejson_spark.functions.multimodal import ASSET_SCHEMA

    assets = spark.createDataFrame(
        [
            ("v1", "video", build_mp4(duration_ms=2000), None),
            ("bad", "video", b"garbage", None),
        ],
        ASSET_SCHEMA,
    )
    plan = frame_sample_plan_from_payloads(assets, every_ms=500)
    rows = plan.collect()
    # 0, 500, 1000, 1500, 2000 for the parsed asset; nothing for garbage
    assert sorted(r.frame_ts_ms for r in rows) == [0, 500, 1000, 1500, 2000]
    assert {r.asset_id for r in rows} == {"v1"}


# ------------------------------------------------------------- WebP


def _riff_webp(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = b"WEBP"
    for fourcc, data in chunks:
        body += fourcc + struct.pack("<I", len(data)) + data
        if len(data) % 2:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_webp_all_variants_hand_built():
    from datalakejson_spark.functions.containers import parse_webp

    # VP8L lossless: signature 0x2F, then 14-bit w-1 / h-1 packed LE
    bits = (33 - 1) | ((17 - 1) << 14)
    vp8l = _riff_webp([(b"VP8L", bytes([0x2F]) + struct.pack("<I", bits))])
    assert parse_webp(vp8l) == {"variant": "vp8l", "width": 33, "height": 17}

    # VP8 lossy keyframe: 3-byte frame tag (bit0 clear), 9D 01 2A, w, h
    vp8 = _riff_webp(
        [(b"VP8 ", b"\x00\x00\x00\x9d\x01\x2a" + struct.pack("<HH", 64, 48))]
    )
    assert parse_webp(vp8) == {"variant": "vp8", "width": 64, "height": 48}

    # VP8X extended: 4 flag bytes, 24-bit canvas w-1 / h-1
    vp8x = _riff_webp(
        [(b"VP8X", b"\x00\x00\x00\x00"
          + (639).to_bytes(3, "little") + (359).to_bytes(3, "little"))]
    )
    assert parse_webp(vp8x) == {"variant": "vp8x", "width": 640, "height": 360}


def test_webp_rejects_malformed():
    from datalakejson_spark.functions.containers import parse_webp

    assert parse_webp(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert parse_webp(b"RIFF\x04\x00\x00\x00WEBP") is None  # no known chunk
    # interframe (bit0 set) is not a standalone image
    bad = _riff_webp([(b"VP8 ", b"\x01\x00\x00\x9d\x01\x2a\x40\x00\x30\x00")])
    assert parse_webp(bad) is None
    # broken lossless signature byte
    bad = _riff_webp([(b"VP8L", b"\x2e\x00\x00\x00\x00")])
    assert parse_webp(bad) is None


def test_webp_flows_through_container_meta(spark):
    from datalakejson_spark.functions.multimodal import ASSET_SCHEMA
    from datalakejson_spark.functions.containers import (
        extract_container_meta,
        frame_sample_plan_from_payloads,
    )

    bits = (20 - 1) | ((10 - 1) << 14)
    webp = _riff_webp([(b"VP8L", bytes([0x2F]) + struct.pack("<I", bits))])
    assets = spark.createDataFrame([("w1", "image", webp, None)], ASSET_SCHEMA)
    row = extract_container_meta(assets).collect()[0]
    assert row.parsed_ok and row.container == "webp"
    assert (row.width, row.height, row.video_codec) == (20, 10, "vp8l")
    # a still image has no duration → never enters the frame-sampling plan
    assert frame_sample_plan_from_payloads(assets).count() == 0


def test_mp4_unknown_duration_sentinel_is_none():
    """mvhd/mdhd duration of all 1s means 'cannot be determined'
    (ISO 14496-12, fragmented/live captures) — must surface None, not a
    ~49-day value a sampling plan would explode into millions of rows."""

    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">IIII", 0, 0, 1000, 0xFFFFFFFF)
        + b"\x00" * 80,
    )
    payload = box(b"ftyp", b"isom\x00\x00\x02\x00") + box(b"moov", mvhd)
    assert parse_mp4(payload)["duration_ms"] is None


def test_mp4_leading_free_box_accepted():
    """ISO-BMFF permits boxes before ftyp (free/skip/wide from some
    muxers) — the parser must scan for ftyp, not require it first."""

    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 1000, 500) + b"\x00" * 80,
    )
    payload = (
        box(b"free", b"\x00" * 4)
        + box(b"ftyp", b"isom\x00\x00\x02\x00")
        + box(b"moov", mvhd)
    )
    assert parse_mp4(payload)["duration_ms"] == 500


def test_mp3_resyncs_past_leading_garbage():
    """Real-world MP3s carry padding/tag quirks before the first frame;
    parsers resync on the 0xFFE pattern (validated by a second frame)
    instead of giving up at byte 0."""
    stream = build_mp3(n_frames=5)
    assert parse_mp3(b"\x00" * 37 + stream)["n_frames"] == 5
    # a false sync inside garbage must not derail the walk: 0xFF 0xFB with
    # an invalid bitrate index (0xF) parses as no frame and scanning continues
    assert parse_mp3(b"\xff\xfb\xf0\x00" + b"\x00" * 10 + stream)["n_frames"] == 5
