"""Compressed-container METADATA parsing for the L5 multimodal tier.

The reference's ML consumption plane (`diagram3:135-143`) implies real
training media, which is overwhelmingly compressed containers (MP4, MP3).
Full bitstream decode of H.264/AAC/MP3 audio needs codec libraries this
container does not ship — that step stays behind the labeled gate. But the
CONTAINER layer is plain struct parsing from public specs (ISO/IEC 14496-12
box structure; the MPEG-1/2 audio frame-header layout), so duration, track
dimensions, codec fourcc, sample counts, and bitrate are all REAL here:

- ``parse_mp4``: walks the ISO-BMFF box tree (ftyp/moov/trak/mdia/stbl),
  reading mvhd (movie timescale + duration), tkhd (track dims), mdhd
  (media timescale + duration), hdlr (vide/soun), stsd (codec fourcc,
  audio sample-rate/channels), stts/stsz (sample counts).
- ``parse_mp3``: skips ID3v2, then walks MPEG audio frame headers
  (version/layer/bitrate/sample-rate tables) frame by frame — giving an
  exact frame count and sample-accurate duration without touching the
  Huffman-coded audio payload. Xing/Info VBR tags are detected.

With this, ``frame_sample_plan_from_payloads`` derives its sampling grid
from the payload's OWN duration instead of caller-supplied metadata: the
Python parse emits one small metadata row per asset (blobs never shuffle),
and the per-frame expansion stays JVM-side (``sequence`` + ``explode``).

Fixture builders (``build_mp4``, ``build_mp3``) exist solely so tests can
make minimal-but-spec-valid payloads; parsers are additionally pinned
against hand-computed offsets so builder/parser mirror bugs cannot
self-validate (tests/test_containers.py).

Scale notes: identical posture to the codec tiers — metadata extraction is
mapInPandas over the binary scan's partitions, output is a narrow table
keyed by asset_id, and every downstream join prunes the payload column.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# ISO-BMFF (MP4) box parsing — ISO/IEC 14496-12 structure, public spec
# ---------------------------------------------------------------------------

#: boxes whose payload is a sequence of child boxes
_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def _iter_boxes(data: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for each box in data[pos:end].
    Handles 32-bit sizes, 64-bit largesize (size==1), and size==0
    (box extends to end). Malformed sizes terminate the walk rather than
    raise — one bad box must not fail the batch."""
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def _find_box(data: bytes, pos: int, end: int, btype: bytes):
    for t, b, e in _iter_boxes(data, pos, end):
        if t == btype:
            return b, e
    return None


def _fullbox(data: bytes, pos: int) -> tuple[int, int]:
    """Returns (version, first byte after the version+flags word)."""
    return data[pos], pos + 4


def _parse_mvhd(data: bytes, b: int) -> tuple[int, int]:
    v, p = _fullbox(data, b)
    if v == 1:
        timescale = struct.unpack_from(">I", data, p + 16)[0]
        duration = struct.unpack_from(">Q", data, p + 20)[0]
    else:
        timescale, duration = struct.unpack_from(">II", data, p + 8)
    return timescale, duration


def _parse_tkhd(data: bytes, b: int) -> tuple[float, float]:
    v, p = _fullbox(data, b)
    # after ctime/mtime/track_id/reserved/duration: reserved(8) layer(2)
    # alt_group(2) volume(2) reserved(2) matrix(36) width(4) height(4)
    tail = p + (32 if v == 1 else 20) + 8 + 2 + 2 + 2 + 2 + 36
    w, h = struct.unpack_from(">II", data, tail)
    return w / 65536.0, h / 65536.0  # 16.16 fixed point


def _parse_mdhd(data: bytes, b: int) -> tuple[int, int]:
    v, p = _fullbox(data, b)
    if v == 1:
        timescale = struct.unpack_from(">I", data, p + 16)[0]
        duration = struct.unpack_from(">Q", data, p + 20)[0]
    else:
        timescale, duration = struct.unpack_from(">II", data, p + 8)
    return timescale, duration


def _parse_stsd_entry(data: bytes, b: int, e: int, kind: str) -> dict:
    """First sample entry of stsd: codec fourcc plus per-kind fields
    (video: coded dims; audio: channels + 16.16 sample rate)."""
    _, p = _fullbox(data, b)
    if struct.unpack_from(">I", data, p)[0] < 1 or p + 16 > e:
        return {}
    entry = p + 4
    codec = data[entry + 4 : entry + 8].decode("latin-1").strip()
    out = {"codec": codec}
    base = entry + 8 + 6 + 2  # header + reserved(6) + data_ref_index(2)
    try:
        if kind == "vide":
            w, h = struct.unpack_from(">HH", data, base + 16)
            out.update(width=w, height=h)
        elif kind == "soun":
            channels, _bits = struct.unpack_from(">HH", data, base + 8)
            rate = struct.unpack_from(">I", data, base + 16)[0] >> 16
            out.update(channels=channels, sample_rate=rate)
    except struct.error:
        pass
    return out


def _parse_stts(data: bytes, b: int, e: int) -> tuple[int, int]:
    """Total (sample_count, media-timescale duration) from the
    decoding-time-to-sample table."""
    _, p = _fullbox(data, b)
    n = struct.unpack_from(">I", data, p)[0]
    if p + 4 + 8 * n > e:
        return 0, 0
    total_samples = total_dur = 0
    for i in range(n):
        cnt, delta = struct.unpack_from(">II", data, p + 4 + 8 * i)
        total_samples += cnt
        total_dur += cnt * delta
    return total_samples, total_dur


def parse_mp4(payload: bytes) -> dict | None:
    """Parse ISO-BMFF container metadata. Returns
    ``{brand, duration_ms, tracks: [{kind, codec, duration_ms,
    n_samples, width, height, channels, sample_rate}]}`` or None for
    payloads that are not a well-formed MP4 (no ftyp/moov)."""
    try:
        if len(payload) < 16:
            return None
        end = len(payload)
        # ftyp need not be the FIRST box (free/skip/wide may precede it);
        # requiring ftyp + moov to parse as boxes is the format gate
        ftyp = _find_box(payload, 0, end, b"ftyp")
        if ftyp is None:
            return None
        brand = payload[ftyp[0] : ftyp[0] + 4].decode("latin-1").strip()
        moov = _find_box(payload, 0, end, b"moov")
        if moov is None:
            return None
        mvhd = _find_box(payload, *moov, b"mvhd")
        if mvhd is None:
            return None
        timescale, duration = _parse_mvhd(payload, mvhd[0])
        if timescale <= 0:
            return None
        out = {
            "brand": brand,
            # all-1s duration = "cannot be determined" (ISO 14496-12) —
            # surface None, not a bogus ~49-day value that a sampling plan
            # would explode into millions of frame rows
            "duration_ms": (
                None
                if duration in (0xFFFFFFFF, 0xFFFFFFFFFFFFFFFF)
                else duration * 1000 // timescale
            ),
            "tracks": [],
        }
        for t, b, e in _iter_boxes(payload, *moov):
            if t != b"trak":
                continue
            track: dict = {"kind": None, "codec": None, "duration_ms": None,
                           "n_samples": None, "width": None, "height": None,
                           "channels": None, "sample_rate": None}
            tkhd = _find_box(payload, b, e, b"tkhd")
            mdia = _find_box(payload, b, e, b"mdia")
            if mdia is None:
                continue
            hdlr = _find_box(payload, *mdia, b"hdlr")
            kind = (
                payload[hdlr[0] + 8 : hdlr[0] + 12].decode("latin-1")
                if hdlr
                else ""
            )
            track["kind"] = {"vide": "video", "soun": "audio"}.get(kind, kind)
            mdhd = _find_box(payload, *mdia, b"mdhd")
            mts = mdur = 0
            if mdhd:
                mts, mdur = _parse_mdhd(payload, mdhd[0])
                if mts > 0 and mdur not in (0xFFFFFFFF, 0xFFFFFFFFFFFFFFFF):
                    track["duration_ms"] = mdur * 1000 // mts
            minf = _find_box(payload, *mdia, b"minf")
            stbl = _find_box(payload, *minf, b"stbl") if minf else None
            if stbl:
                stsd = _find_box(payload, *stbl, b"stsd")
                if stsd:
                    track.update(_parse_stsd_entry(payload, *stsd, kind))
                stts = _find_box(payload, *stbl, b"stts")
                if stts:
                    n, _dur = _parse_stts(payload, *stts)
                    track["n_samples"] = n
            if tkhd and kind == "vide":
                w, h = _parse_tkhd(payload, tkhd[0])
                if w and h:  # tkhd display dims override stsd coded dims
                    track["width"], track["height"] = int(w), int(h)
            out["tracks"].append(track)
        return out
    except Exception:  # noqa: BLE001 — malformed container
        return None


# ---------------------------------------------------------------------------
# MPEG audio (MP3) frame-header walk — public MPEG-1/2 audio header layout
# ---------------------------------------------------------------------------

#: bitrate tables in kbps, index 0 = "free", index 15 = invalid
_BITRATES = {
    # (mpeg1?, layer) -> table
    (True, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (True, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (True, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (False, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (False, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (False, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_SAMPLE_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe size + 10-byte
    header + optional 10-byte footer), or 0 if none."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    flags = payload[5]
    size = 0
    for b in payload[6:10]:
        if b & 0x80:
            return 0  # syncsafe bytes must have the high bit clear
        size = (size << 7) | b
    return 10 + size + (10 if flags & 0x10 else 0)


def _mp3_frame(payload: bytes, pos: int):
    """Parse one frame header at pos. Returns (frame_len, version,
    layer, bitrate_kbps, sample_rate, samples_per_frame) or None."""
    if pos + 4 > len(payload):
        return None
    h = struct.unpack_from(">I", payload, pos)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = {0: "2.5", 2: "2", 3: "1"}.get((h >> 19) & 3)
    layer = {1: 3, 2: 2, 3: 1}.get((h >> 17) & 3)
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if version is None or layer is None or br_idx in (0, 15) or sr_idx == 3:
        return None
    mpeg1 = version == "1"
    bitrate = _BITRATES[(mpeg1, layer)][br_idx]
    rate = _SAMPLE_RATES[version][sr_idx]
    padding = (h >> 9) & 1
    if layer == 1:
        frame_len = (12 * bitrate * 1000 // rate + padding) * 4
        spf = 384
    else:
        spf = 1152 if (layer == 2 or mpeg1) else 576
        frame_len = spf // 8 * bitrate * 1000 // rate + padding
    return frame_len, version, layer, bitrate, rate, spf


def parse_mp3(payload: bytes) -> dict | None:
    """Walk MPEG audio frames: exact frame count and sample-accurate
    duration from headers alone (the Huffman-coded granules are never
    touched). Returns ``{version, layer, sample_rate, bitrate_kbps,
    n_frames, duration_ms, vbr, has_xing}`` or None if no valid frame
    sequence is found. bitrate_kbps is the mean over frames (== the
    constant rate for CBR streams); ``vbr`` flags rate changes."""
    try:
        pos = _id3v2_size(payload)
        # resync: real-world MP3s often carry padding / tag quirks before
        # the first frame — scan (bounded) for a sync position where a
        # frame parses AND is followed by another valid frame or stream end
        first = None
        for cand in range(pos, min(len(payload) - 3, pos + 65536)):
            if payload[cand] != 0xFF or (payload[cand + 1] & 0xE0) != 0xE0:
                continue
            frame = _mp3_frame(payload, cand)
            if frame is None:
                continue
            nxt = cand + frame[0]
            if nxt == len(payload) or (
                nxt + 4 <= len(payload)
                and (n2 := _mp3_frame(payload, nxt)) is not None
                and n2[1] == frame[1]
                and n2[2] == frame[2]
            ):
                first, pos = frame, cand
                break
        if first is None:
            return None
        _, version, layer, _, rate, spf = first
        n_frames = total_samples = 0
        bitrates = set()
        bitrate_sum = 0
        has_xing = False
        while True:
            frame = _mp3_frame(payload, pos)
            if frame is None or frame[1] != version or frame[2] != layer:
                break
            frame_len = frame[0]
            if frame_len <= 4 or pos + frame_len > len(payload):
                break
            if n_frames == 0 and (
                b"Xing" in payload[pos : pos + frame_len]
                or b"Info" in payload[pos : pos + frame_len]
            ):
                has_xing = True
            n_frames += 1
            total_samples += frame[5]
            bitrates.add(frame[3])
            bitrate_sum += frame[3]
            pos += frame_len
        if n_frames == 0:
            return None
        return {
            "version": version,
            "layer": layer,
            "sample_rate": rate,
            "bitrate_kbps": bitrate_sum // n_frames,
            "n_frames": n_frames,
            "duration_ms": total_samples * 1000 // rate,
            "vbr": len(bitrates) > 1,
            "has_xing": has_xing,
        }
    except Exception:  # noqa: BLE001
        return None


# ---------------------------------------------------------------------------
# WebP (RIFF container) — the one image format outside the real-decode tier;
# its container metadata (dims, lossy/lossless/extended variant) is plain
# public-spec parsing, so only the VP8 entropy-coded pixels stay gated.
# ---------------------------------------------------------------------------


def parse_webp(payload: bytes) -> dict | None:
    """Parse WebP container metadata: ``{variant, width, height}`` where
    variant ∈ vp8 (lossy) / vp8l (lossless) / vp8x (extended). Returns None
    for non-WebP or malformed payloads."""
    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
            return None
        pos = 12
        while pos + 8 <= len(payload):
            fourcc = payload[pos : pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            body = payload[pos + 8 : pos + 8 + size]
            if fourcc == b"VP8X" and len(body) >= 10:
                w = int.from_bytes(body[4:7], "little") + 1
                h = int.from_bytes(body[7:10], "little") + 1
                return {"variant": "vp8x", "width": w, "height": h}
            if fourcc == b"VP8 " and len(body) >= 10:
                # keyframe: frame-tag bit 0 clear, start code 9D 01 2A
                if body[0] & 1 or body[3:6] != b"\x9d\x01\x2a":
                    return None
                w = struct.unpack_from("<H", body, 6)[0] & 0x3FFF
                h = struct.unpack_from("<H", body, 8)[0] & 0x3FFF
                return {"variant": "vp8", "width": w, "height": h}
            if fourcc == b"VP8L" and len(body) >= 5:
                if body[0] != 0x2F:  # lossless signature byte
                    return None
                bits = struct.unpack_from("<I", body, 1)[0]
                w = (bits & 0x3FFF) + 1
                h = ((bits >> 14) & 0x3FFF) + 1
                return {"variant": "vp8l", "width": w, "height": h}
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        return None
    except Exception:  # noqa: BLE001
        return None


# ---------------------------------------------------------------------------
# Spark wiring
# ---------------------------------------------------------------------------

CONTAINER_META_SCHEMA = (
    "asset_id string, parsed_ok boolean, container string, duration_ms long, "
    "width int, height int, video_codec string, audio_codec string, "
    "n_video_samples long, sample_rate int, bitrate_kbps int, n_frames long"
)


def _container_meta_row(asset_id, payload: bytes | None) -> dict:
    row = {k: None for k in (
        "container", "duration_ms", "width", "height", "video_codec",
        "audio_codec", "n_video_samples", "sample_rate", "bitrate_kbps",
        "n_frames",
    )}
    row["asset_id"] = asset_id
    row["parsed_ok"] = False
    if payload is None:
        return row
    mp4 = parse_mp4(payload)
    if mp4 is not None:
        row.update(parsed_ok=True, container="mp4",
                   duration_ms=mp4["duration_ms"])
        for t in mp4["tracks"]:
            if t["kind"] == "video" and row["video_codec"] is None:
                row.update(video_codec=t["codec"], width=t["width"],
                           height=t["height"], n_video_samples=t["n_samples"])
            elif t["kind"] == "audio" and row["audio_codec"] is None:
                row.update(audio_codec=t["codec"],
                           sample_rate=t["sample_rate"])
        return row
    mp3 = parse_mp3(payload)
    if mp3 is not None:
        row.update(parsed_ok=True, container="mp3",
                   duration_ms=mp3["duration_ms"],
                   audio_codec=f"mp{mp3['layer']}",
                   sample_rate=mp3["sample_rate"],
                   bitrate_kbps=mp3["bitrate_kbps"],
                   n_frames=mp3["n_frames"])
        return row
    webp = parse_webp(payload)
    if webp is not None:
        row.update(parsed_ok=True, container="webp",
                   video_codec=webp["variant"],
                   width=webp["width"], height=webp["height"])
    return row


def extract_container_meta(assets: DataFrame) -> DataFrame:
    """Arrow-batched container-metadata extraction over binary payloads:
    same posture as the codec tiers — blobs stay on their scan partitions,
    the output is a narrow per-asset metadata table."""

    cols = [f.split()[0] for f in CONTAINER_META_SCHEMA.split(", ")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _container_meta_row(
                    aid, bytes(p) if p is not None else None
                )
                for aid, p in zip(pdf["asset_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=cols)

    return assets.mapInPandas(run, schema=CONTAINER_META_SCHEMA)


def frame_sample_plan_from_payloads(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """frame_sample_plan with REAL durations: the sampling grid comes from
    each payload's parsed container duration, not caller-supplied metadata.
    The parse is the narrow mapInPandas above; the per-frame expansion is
    JVM-side sequence()+explode over the metadata table, so the blob column
    is pruned before any row multiplication happens."""
    meta = extract_container_meta(assets)
    return (
        meta.filter(
            F.col("parsed_ok")
            & (F.col("duration_ms") > 0)
            & F.col("video_codec").isNotNull()  # frame sampling is a video concept
        )
        .select(
            "asset_id",
            "container",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


# ---------------------------------------------------------------------------
# Fixture builders (tests only) — minimal spec-valid payloads
# ---------------------------------------------------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def build_mp4(
    duration_ms: int = 2000,
    width: int = 640,
    height: int = 360,
    video_codec: str = "avc1",
    fps: int = 25,
    audio_rate: int = 48000,
) -> bytes:
    """Minimal spec-valid MP4: ftyp + moov(mvhd, video trak, audio trak) +
    empty mdat. Movie timescale 1000 so duration is in ms directly."""
    n_frames = max(duration_ms * fps // 1000, 1)

    def fullbox(btype, version, body):
        return _box(btype, bytes([version, 0, 0, 0]) + body)

    mvhd = fullbox(b"mvhd", 0, struct.pack(
        ">IIII", 0, 0, 1000, duration_ms) + b"\x00" * 80)

    def trak(kind, codec, media_timescale, media_dur, n_samples, delta):
        tkhd_tail = (
            b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0x0100 if kind == b"soun" else 0, 0)
            + b"\x00" * 36
            + struct.pack(">II",
                          (width << 16) if kind == b"vide" else 0,
                          (height << 16) if kind == b"vide" else 0)
        )
        tkhd = fullbox(b"tkhd", 0, struct.pack(
            ">IIIII", 0, 0, 1 if kind == b"vide" else 2, 0, duration_ms) + tkhd_tail)
        mdhd = fullbox(b"mdhd", 0, struct.pack(
            ">IIII", 0, 0, media_timescale, media_dur) + struct.pack(">HH", 0x55C4, 0))
        hdlr = fullbox(b"hdlr", 0, b"\x00" * 4 + kind + b"\x00" * 12 + b"\x00")
        if kind == b"vide":
            entry_body = (
                b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                + struct.pack(">HH", width, height) + b"\x00" * 50
            )
        else:
            entry_body = (
                b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8
                + struct.pack(">HHI", 2, 16, 0) + struct.pack(">I", audio_rate << 16)
            )
        entry = _box(codec.encode("latin-1"), entry_body)
        stsd = fullbox(b"stsd", 0, struct.pack(">I", 1) + entry)
        stts = fullbox(b"stts", 0, struct.pack(">III", 1, n_samples, delta))
        stsz = fullbox(b"stsz", 0, struct.pack(">III", 0, 100, n_samples))
        stbl = _box(b"stbl", stsd + stts + stsz)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    video = trak(b"vide", video_codec, fps * 1000,
                 duration_ms * fps, n_frames, 1000)
    n_audio = max(duration_ms * audio_rate // 1000 // 1024, 1)
    audio = trak(b"soun", "mp4a", audio_rate,
                 duration_ms * audio_rate // 1000, n_audio, 1024)
    moov = _box(b"moov", mvhd + video + audio)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    return ftyp + moov + _box(b"mdat", b"")


def build_mp3(
    n_frames: int = 38,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    id3_bytes: int = 0,
    vbr_second_rate: int | None = None,
) -> bytes:
    """Minimal MPEG-1 Layer III stream: valid frame headers with zeroed
    audio payload (header-walk parsers never read the granules). Optional
    leading ID3v2 tag and a mid-stream bitrate switch for VBR tests."""
    br_table = _BITRATES[(True, 3)]
    out = bytearray()
    if id3_bytes:
        body = id3_bytes
        out += b"ID3\x04\x00\x00" + bytes(
            [(body >> 21) & 0x7F, (body >> 14) & 0x7F, (body >> 7) & 0x7F, body & 0x7F]
        ) + b"\x00" * body
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    for i in range(n_frames):
        rate = (
            vbr_second_rate
            if vbr_second_rate is not None and i >= n_frames // 2
            else bitrate_kbps
        )
        br_idx = br_table.index(rate)
        header = (
            (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)  # MPEG1 L3, no CRC
            | (br_idx << 12) | (sr_idx << 10)
        )
        frame_len = 144 * rate * 1000 // sample_rate
        out += struct.pack(">I", header) + b"\x00" * (frame_len - 4)
    return bytes(out)
