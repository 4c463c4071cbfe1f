"""Pure-Python/numpy IMA ADPCM audio codec for the L5 multimodal tier.

The compressed-audio counterpart of imagecodecs.py: real decode of
DVI/IMA ADPCM WAV payloads (format tag 0x11 — 4 bits/sample, the classic
4:1 compressed WAV variant) using only the public IMA specification
("Recommended Practices for Enhancing Digital Audio Compatibility in
Multimedia Systems", IMA Digital Audio Focus Group, 1992). This lets
``decode_wav``/``extract_audio_features`` produce REAL sample features for
compressed audio instead of rejecting everything but PCM.

A matching mono encoder is provided for TEST FIXTURES only (the container
has no audio library to generate compressed fixtures with); the test suite
guards against encoder/decoder mirror bugs by checking decoded output
against the original waveform (SNR floor), not against the encoder.
"""

from __future__ import annotations

import struct

import numpy as np

#: IMA ADPCM step-size table (89 entries, fixed by the spec)
STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
        494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
        1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
        4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
        11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
        27086, 29794, 32767,
    ],
    dtype=np.int64,
)

#: index adjustment per 4-bit code (sign bit mirrors the low three)
INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64
)


def _decode_nibbles(nibbles: np.ndarray, predictor: int, index: int) -> np.ndarray:
    """Decode a run of 4-bit codes given the block-header state; returns
    int16 samples. Sequential by construction (each sample feeds the next
    predictor) — runs per Arrow batch inside mapInPandas, never row-at-a-time
    over Spark rows."""
    out = np.empty(len(nibbles), dtype=np.int16)
    for i, n in enumerate(nibbles):
        step = int(STEP_TABLE[index])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        predictor = predictor - diff if n & 8 else predictor + diff
        predictor = max(-32768, min(32767, predictor))
        out[i] = predictor
        index = max(0, min(88, index + int(INDEX_TABLE[n])))
    return out


def decode_ima_adpcm(data: bytes, n_channels: int, block_align: int) -> np.ndarray | None:
    """Decode an IMA ADPCM ``data`` chunk to a float32 mono array in
    [-1, 1] (multi-channel input is downmixed, matching the PCM path).
    Returns None for malformed block structure."""
    if n_channels < 1 or block_align < 4 * n_channels:
        return None
    # multi-channel data areas interleave channels in 4-byte groups — a
    # block whose body isn't whole groups would ValueError at the reshape
    # below (mono decodes nibble-linearly, no group constraint)
    if n_channels > 1 and (block_align - 4 * n_channels) % (4 * n_channels) != 0:
        return None
    chunks = []
    for base in range(0, len(data) - block_align + 1, block_align):
        block = data[base : base + block_align]
        per_ch = []
        for ch in range(n_channels):
            pred, idx = struct.unpack_from("<hBx", block, 4 * ch)
            if idx > 88:
                return None
            per_ch.append([np.array([pred], dtype=np.int16), (pred, idx)])
        body = np.frombuffer(block, dtype=np.uint8, offset=4 * n_channels)
        # nibble order: low nibble first within each byte
        nibbles = np.empty(2 * len(body), dtype=np.uint8)
        nibbles[0::2] = body & 0x0F
        nibbles[1::2] = body >> 4
        if n_channels == 1:
            pred, idx = per_ch[0][1]
            per_ch[0].append(_decode_nibbles(nibbles, pred, idx))
        else:
            # channels interleave in 4-byte (8-nibble) groups
            groups = nibbles.reshape(-1, n_channels, 8)
            for ch in range(n_channels):
                pred, idx = per_ch[ch][1]
                per_ch[ch].append(_decode_nibbles(groups[:, ch, :].reshape(-1), pred, idx))
        # header sample + decoded run, per channel, then downmix
        chans = [np.concatenate([c[0], c[2]]) for c in per_ch]
        chunks.append(np.stack(chans, axis=1).astype(np.float32).mean(axis=1))
    if not chunks:
        return None
    return np.concatenate(chunks) / 32768.0


def encode_ima_adpcm_wav(
    samples: np.ndarray, sample_rate: int, block_samples: int = 504
) -> bytes:
    """Minimal mono IMA ADPCM WAV encoder for TEST FIXTURES. ``samples`` is
    float in [-1, 1]; each block carries 1 header sample + ``block_samples``
    coded samples (``block_samples`` must be even so blocks stay whole
    bytes)."""
    if block_samples % 2:
        raise ValueError("block_samples must be even")
    pcm = np.clip(np.asarray(samples, dtype=np.float64) * 32768.0, -32768, 32767).astype(
        np.int64
    )
    block_align = 4 + block_samples // 2
    blocks = bytearray()
    index = 0
    pos = 0
    while pos < len(pcm):
        chunk = pcm[pos : pos + 1 + block_samples]
        pos += 1 + block_samples
        predictor = int(chunk[0])
        blocks += struct.pack("<hBx", predictor, index)
        nibbles = []
        for sample in chunk[1:]:
            step = int(STEP_TABLE[index])
            diff = int(sample) - predictor
            code = 0
            if diff < 0:
                code = 8
                diff = -diff
            if diff >= step:
                code |= 4
                diff -= step
            if diff >= step >> 1:
                code |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                code |= 1
            # reconstruct exactly as the decoder will, to stay in lockstep
            step_d = step >> 3
            if code & 1:
                step_d += step >> 2
            if code & 2:
                step_d += step >> 1
            if code & 4:
                step_d += step
            predictor = predictor - step_d if code & 8 else predictor + step_d
            predictor = max(-32768, min(32767, predictor))
            index = max(0, min(88, index + int(INDEX_TABLE[code])))
            nibbles.append(code)
        nibbles += [0] * (block_samples - len(nibbles))
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            blocks.append((hi << 4) | lo)
    samples_per_block = block_samples + 1
    byte_rate = (sample_rate * block_align + samples_per_block - 1) // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2, samples_per_block
    )
    data = bytes(blocks)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ===========================================================================
# FLAC (RFC 9639 / xiph.org spec) — real lossless compressed-audio decode
# ===========================================================================
#
# The container ships no audio libraries, but FLAC is fully specified and
# decodable with stdlib + numpy: Rice-coded residuals over fixed or LPC
# predictors, optional stereo decorrelation. ``decode_flac`` implements the
# general decoder (all blocksize/samplerate/bps codes, fixed orders 0-4,
# LPC up to order 32, all four channel assignments, escaped Rice
# partitions); ``encode_flac`` is a TEST-FIXTURE encoder (mono/stereo
# 16-bit, fixed predictors, single Rice partition) — spec-valid output with
# real CRC-8/CRC-16 trailers, but no rate-optimal modeling. Mirror bugs are
# guarded by hand-built bitstream pins in tests/test_codecs.py.

_FLAC_BLOCKSIZES = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                    **{n: 256 << (n - 8) for n in range(8, 16)}}
_FLAC_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
               7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_FLAC_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

#: fixed-predictor coefficients by order (RFC 9639 §9.2.1)
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


class _FlacBits:
    """MSB-first bit reader over bytes — the FLAC bitstream convention."""

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos  # byte position
        self.bit = 0  # bits consumed within data[pos]

    def read(self, n: int) -> int:
        out = 0
        while n > 0:
            if self.pos >= len(self.data):
                raise EOFError
            avail = 8 - self.bit
            take = min(n, avail)
            byte = self.data[self.pos]
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            n -= take
            if self.bit == 8:
                self.pos += 1
                self.bit = 0
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        count = 0
        while self.read(1) == 0:
            count += 1
            if count > 1 << 20:  # corrupt stream guard
                raise EOFError
        return count

    def read_rice(self, param: int) -> int:
        q = self.read_unary()
        v = (q << param) | self.read(param)
        return (v >> 1) ^ -(v & 1)  # zigzag → signed

    def align(self) -> None:
        if self.bit:
            self.pos += 1
            self.bit = 0


def _flac_utf8_number(bits: _FlacBits) -> int:
    """The frame header's UTF-8-style coded number (up to 7 bytes)."""
    first = bits.read(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    if n_extra < 1 or n_extra > 6:
        raise ValueError("bad UTF-8 coded number")
    val = first & (mask - 1)
    for _ in range(n_extra):
        byte = bits.read(8)
        if byte & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation")
        val = (val << 6) | (byte & 0x3F)
    return val


def _flac_residual(bits: _FlacBits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    param_bits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    porder = bits.read(4)
    if blocksize % (1 << porder):
        raise ValueError("partition does not divide blocksize")
    out: list[int] = []
    for p in range(1 << porder):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds first partition")
        param = bits.read(param_bits)
        if param == escape:
            raw = bits.read(5)
            out.extend(bits.read_signed(raw) if raw else 0 for _ in range(n))
        else:
            out.extend(bits.read_rice(param) for _ in range(n))
    return out


def _flac_subframe(bits: _FlacBits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):  # wasted-bits-per-sample flag
        wasted = bits.read_unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        samples = [bits.read_signed(bps)] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [bits.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        samples = [bits.read_signed(bps) for _ in range(order)]
        res = _flac_residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(r + pred)
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        samples = [bits.read_signed(bps) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("invalid qlp precision")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative qlp shift")
        coefs = [bits.read_signed(precision) for _ in range(order)]
        for r in _flac_residual(bits, blocksize, order):
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs)) >> shift
            samples.append(r + pred)
    else:
        raise ValueError("reserved subframe type")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes) -> tuple[int, np.ndarray] | None:
    """Decode a FLAC stream to (sample_rate, float32 mono array in [-1, 1])
    — multi-channel downmixed, matching the WAV paths. Returns None for
    malformed/non-FLAC payloads; one bad blob must never fail a batch."""
    try:
        if payload[:4] != b"fLaC":
            return None
        pos = 4
        rate = n_channels = bps = 0
        total_samples = -1
        # metadata blocks: 1-bit last flag, 7-bit type, 24-bit length
        while True:
            hdr = payload[pos : pos + 4]
            if len(hdr) < 4:
                return None
            last, btype = hdr[0] >> 7, hdr[0] & 0x7F
            length = int.from_bytes(hdr[1:4], "big")
            body = payload[pos + 4 : pos + 4 + length]
            if btype == 0:  # STREAMINFO
                if length < 34:
                    return None
                b = _FlacBits(body)
                b.read(16), b.read(16), b.read(24), b.read(24)  # block/frame sizes
                rate = b.read(20)
                n_channels = b.read(3) + 1
                bps = b.read(5) + 1
                total_samples = b.read(36)
            pos += 4 + length
            if last:
                break
        if rate <= 0 or n_channels < 1:
            return None
        bits = _FlacBits(payload, pos)
        channels_out: list[np.ndarray] = []
        decoded = 0
        while bits.pos < len(payload) and (total_samples <= 0 or decoded < total_samples):
            if bits.read(14) != 0x3FFE:
                return None  # lost frame sync
            bits.read(1)  # reserved
            bits.read(1)  # blocking strategy
            bs_code = bits.read(4)
            sr_code = bits.read(4)
            chan_code = bits.read(4)
            bps_code = bits.read(3)
            bits.read(1)  # reserved
            _flac_utf8_number(bits)
            if bs_code == 0 or sr_code == 15:
                return None
            blocksize = (
                bits.read(8) + 1 if bs_code == 6
                else bits.read(16) + 1 if bs_code == 7
                else _FLAC_BLOCKSIZES[bs_code]
            )
            if sr_code == 12:
                bits.read(8)
            elif sr_code in (13, 14):
                bits.read(16)
            frame_bps = bps if bps_code == 0 else _FLAC_BPS.get(bps_code)
            if frame_bps is None:
                return None
            bits.read(8)  # CRC-8 (fixture-grade: presence, not verification)
            if chan_code > 10:
                return None  # 11-15 are reserved (RFC 9639)
            if chan_code < 8:
                n_ch = chan_code + 1
                subs = [_flac_subframe(bits, blocksize, frame_bps) for _ in range(n_ch)]
            else:
                # stereo decorrelation; the side channel carries one extra bit
                extra = [0, 1] if chan_code in (8, 10) else [1, 0]
                a = _flac_subframe(bits, blocksize, frame_bps + extra[0])
                b_ = _flac_subframe(bits, blocksize, frame_bps + extra[1])
                if chan_code == 8:  # left/side
                    subs = [a, [l - s for l, s in zip(a, b_)]]
                elif chan_code == 9:  # right/side
                    subs = [[r + s for s, r in zip(a, b_)], b_]
                else:  # mid/side
                    left = [((m << 1) | (s & 1)) + s >> 1 for m, s in zip(a, b_)]
                    subs = [left, [l - s for l, s in zip(left, b_)]]
            bits.align()
            bits.pos += 2  # CRC-16
            mono = np.mean(
                np.array(subs, dtype=np.float64), axis=0
            ) / float(1 << (frame_bps - 1))
            channels_out.append(mono.astype(np.float32))
            decoded += blocksize
        if not channels_out:
            return None
        out = np.concatenate(channels_out)
        if total_samples > 0:
            out = out[:total_samples]
        return rate, out
    except (EOFError, ValueError, IndexError, KeyError):
        return None


# ------------------------------------------------------------------ encoder


class _FlacBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_rice(self, v: int, param: int) -> None:
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
        self.write_unary(u >> param)
        self.write(u, param)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _best_rice_param(residuals: list[int]) -> int:
    best, best_bits = 0, None
    for param in range(15):
        bits = sum((((abs(r) << 1) - (r < 0)) >> param) + 1 + param for r in residuals)
        if best_bits is None or bits < best_bits:
            best, best_bits = param, bits
    return best


def encode_flac(
    samples: np.ndarray, sample_rate: int, blocksize: int = 4096, order: int = 2
) -> bytes:
    """TEST-FIXTURE FLAC encoder: 16-bit mono (or (n, 2) stereo encoded as
    independent channels), fixed predictor of the given order, one Rice
    partition per subframe, real CRC-8/CRC-16 trailers. Spec-valid but not
    rate-optimal — exists so tests can exercise the real decoder without an
    audio library in the container."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(arr * 32768.0, -32768, 32767).astype(np.int64)
    n_total, n_ch = pcm.shape
    bps = 16

    stream = bytearray(b"fLaC")
    w = _FlacBitWriter()
    w.write(blocksize, 16), w.write(blocksize, 16)
    w.write(0, 24), w.write(0, 24)
    w.write(sample_rate, 20), w.write(n_ch - 1, 3), w.write(bps - 1, 5)
    w.write(n_total, 36)
    w.align()
    body = bytes(w.out) + b"\x00" * 16  # zeroed MD5 (unset per spec)
    stream += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last STREAMINFO

    for frame_idx, start in enumerate(range(0, n_total, blocksize)):
        chunk = pcm[start : start + blocksize]
        bs = len(chunk)
        hdr = _FlacBitWriter()
        hdr.write(0x3FFE, 14), hdr.write(0, 1), hdr.write(0, 1)
        hdr.write(7, 4)  # blocksize: 16-bit field follows
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        hdr.write(n_ch - 1, 4)  # independent channels
        hdr.write(4, 3)  # bps: 16
        hdr.write(0, 1)
        # UTF-8 coded frame number
        num = frame_idx
        if num < 0x80:
            hdr.write(num, 8)
        else:
            chunks = []
            n_bytes = 2
            while num.bit_length() > 7 - n_bytes + 6 * (n_bytes - 1):
                n_bytes += 1
            for _ in range(n_bytes - 1):
                chunks.append(0x80 | (num & 0x3F))
                num >>= 6
            hdr.write(((0xFF << (8 - n_bytes)) & 0xFF) | num, 8)
            for c in reversed(chunks):
                hdr.write(c, 8)
        hdr.write(bs - 1, 16)
        hdr.align()
        header_bytes = bytes(hdr.out)
        frame = _FlacBitWriter()
        for ch in range(n_ch):
            sig = chunk[:, ch].tolist()
            o = min(order, bs - 1, 4)
            frame.write(0, 1), frame.write(8 + o, 6), frame.write(0, 1)
            for s in sig[:o]:
                frame.write(s, bps)
            coefs = _FIXED_COEFS[o]
            res = [
                int(sig[i] - sum(c * sig[i - 1 - j] for j, c in enumerate(coefs)))
                for i in range(o, bs)
            ]
            param = _best_rice_param(res) if res else 0
            frame.write(0, 2)  # 4-bit Rice method
            frame.write(0, 4)  # partition order 0
            frame.write(param, 4)
            for r in res:
                frame.write_rice(r, param)
        frame.align()
        payload = header_bytes + bytes([_crc8(header_bytes)]) + bytes(frame.out)
        stream += payload + _crc16(payload).to_bytes(2, "big")
    return bytes(stream)


# --------------------------------------------------------------------------
# Sun/NeXT AU (.snd) and AIFF/AIFC containers with G.711 companding (r7)
# --------------------------------------------------------------------------
# Public specs: the AU header layout (Sun audio file format), AIFF-1.3 /
# AIFF-C (Apple, 1989/1991), and ITU-T G.711 mu-law/A-law expansion. These
# are the classic legacy corpora containers; CPython's own test audio data
# ships the same waveform in all three, which the test suite uses as a REAL
# cross-container agreement check (tests/test_real_files.py).


def ulaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 mu-law expansion, vectorized; float32 in [-1, 1]."""
    u = (~codes.astype(np.uint8)) & 0xFF
    t = ((((u & 0x0F) << 3).astype(np.int32)) + 0x84) << ((u >> 4) & 7).astype(
        np.int32
    )
    lin = np.where(u & 0x80, 0x84 - t, t - 0x84)
    return lin.astype(np.float32) / 32768.0


def alaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """ITU-T G.711 A-law expansion, vectorized; float32 in [-1, 1]."""
    a = (codes.astype(np.uint8) ^ 0x55).astype(np.int32)
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 7
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    lin = np.where(a & 0x80, t, -t)
    return lin.astype(np.float32) / 32768.0


def pcm_to_float(
    data: bytes, bits: int, *, little_endian: bool = False, unsigned8: bool = False
) -> np.ndarray | None:
    """Integer PCM → float32 [-1, 1], SHARED by the WAV (LE, unsigned
    8-bit) and AU/AIFF (BE, signed 8-bit) containers so the trickiest
    widening lives once. Trailing bytes short of a whole sample (buggy
    writers counting the pad byte) are truncated consistently at EVERY
    width, not just 24-bit."""
    if bits == 8:
        raw8 = np.frombuffer(data, dtype="u1" if unsigned8 else "i1")
        if unsigned8:
            return (raw8.astype(np.float32) - 128.0) / 128.0
        return raw8.astype(np.float32) / 128.0
    e = "<" if little_endian else ">"
    if bits == 16:
        data = data[: len(data) - len(data) % 2]
        return np.frombuffer(data, dtype=f"{e}i2").astype(np.float32) / 32768.0
    if bits == 24:
        b = np.frombuffer(data[: len(data) - len(data) % 3], dtype="u1")
        tri = b.reshape(-1, 3).astype(np.uint32)
        if little_endian:
            raw = (tri[:, 0] << 8) | (tri[:, 1] << 16) | (tri[:, 2] << 24)
        else:
            raw = (tri[:, 0] << 24) | (tri[:, 1] << 16) | (tri[:, 2] << 8)
        return (raw.astype(np.int32) >> 8).astype(np.float32) / 8388608.0
    if bits == 32:
        data = data[: len(data) - len(data) % 4]
        return np.frombuffer(data, dtype=f"{e}i4").astype(np.float32) / 2147483648.0
    return None


def float_pcm_to_float(data: bytes, bits: int, *, little_endian: bool = False):
    """IEEE float PCM → float32 clamped to [-1, 1] with NaN/Inf scrubbed —
    real DAW float exports routinely exceed full scale, and an unclamped
    NaN would poison downstream RMS/zero-cross features while
    decoded_ok=True (round-7 review find)."""
    width = bits // 8
    data = data[: len(data) - len(data) % width]
    e = "<" if little_endian else ">"
    arr = np.frombuffer(data, dtype=f"{e}f{width}").astype(np.float32)
    return np.clip(np.nan_to_num(arr, nan=0.0, posinf=1.0, neginf=-1.0), -1.0, 1.0)


def _be_pcm_to_float(data: bytes, bits: int) -> np.ndarray | None:
    """Big-endian integer PCM → float32 [-1, 1] (8-bit is SIGNED in both
    AU and AIFF, unlike WAV's unsigned 8-bit)."""
    return pcm_to_float(data, bits, little_endian=False, unsigned8=False)


def _downmix(arr: np.ndarray, n_ch: int) -> np.ndarray:
    if n_ch > 1:
        arr = arr[: len(arr) - len(arr) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return arr


def decode_au(payload: bytes) -> tuple[int, np.ndarray] | None:
    """Sun/NeXT .au decode: header ``.snd`` + 5 big-endian u32 fields
    (data offset, data size, encoding, rate, channels). Encodings: 1
    mu-law, 2-5 linear PCM 8/16/24/32, 6 float32, 7 float64, 27 A-law.
    Returns (sample_rate, mono float array) or None."""
    try:
        if payload[:4] != b".snd" or len(payload) < 24:
            return None
        offset, size, enc, rate, n_ch = struct.unpack_from(">IIIII", payload, 4)
        if offset < 24 or rate <= 0 or n_ch < 1:
            return None
        end = len(payload) if size == 0xFFFFFFFF else min(offset + size, len(payload))
        data = payload[offset:end]
        if enc == 1:
            arr = ulaw_to_linear(np.frombuffer(data, dtype="u1"))
        elif enc in (2, 3, 4, 5):
            arr = _be_pcm_to_float(data, 8 * (enc - 1))
        elif enc == 6:
            arr = float_pcm_to_float(data, 32)
        elif enc == 7:
            arr = float_pcm_to_float(data, 64)
        elif enc == 27:
            arr = alaw_to_linear(np.frombuffer(data, dtype="u1"))
        else:
            return None
        if arr is None:
            return None
        return rate, _downmix(arr, n_ch)
    except Exception:  # noqa: BLE001 — malformed payload must not raise
        return None


def _extended_float(b: bytes) -> float:
    """80-bit IEEE 754 extended float (AIFF's sample-rate field)."""
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    if se & 0x7FFF == 0 and mant == 0:
        return 0.0
    sign = -1.0 if se & 0x8000 else 1.0
    return sign * mant * 2.0 ** ((se & 0x7FFF) - 16383 - 63)


def decode_aiff(payload: bytes) -> tuple[int, np.ndarray] | None:
    """AIFF / AIFF-C decode: FORM container, COMM (channels, frames,
    bits, 80-bit-float rate, and for AIFC a compression fourcc) + SSND
    (offset, blocksize, big-endian frames). Compression: NONE, sowt
    (little-endian 16-bit), ulaw/ULAW, alaw/ALAW. Returns
    (sample_rate, mono float array) or None."""
    try:
        if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
            return None
        is_aifc = payload[8:12] == b"AIFC"
        pos, comm, frames_data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from(">I", payload, pos + 4)
            body = payload[pos + 8 : pos + 8 + size]
            if cid == b"COMM":
                n_ch, n_frames, bits = struct.unpack_from(">HIH", body, 0)
                rate = _extended_float(body[8:18])
                comp = body[18:22] if is_aifc and len(body) >= 22 else b"NONE"
                comm = (n_ch, n_frames, bits, rate, comp)
            elif cid == b"SSND":
                (off, _blk) = struct.unpack_from(">II", body, 0)
                frames_data = body[8 + off :]
            pos += 8 + size + (size & 1)
        if comm is None or frames_data is None:
            return None
        n_ch, n_frames, bits, rate, comp = comm
        if n_ch < 1 or rate <= 0:
            return None
        # honor COMM's frame count: SSND may carry block-alignment padding
        # (blockSize > 0) or trailing bytes that are NOT samples
        if comp in (b"ulaw", b"ULAW", b"alaw", b"ALAW"):
            frames_data = frames_data[: n_frames * n_ch]
        else:
            frames_data = frames_data[: n_frames * n_ch * (bits // 8)]
        if comp in (b"ulaw", b"ULAW"):
            arr = ulaw_to_linear(np.frombuffer(frames_data, dtype="u1"))
        elif comp in (b"alaw", b"ALAW"):
            arr = alaw_to_linear(np.frombuffer(frames_data, dtype="u1"))
        elif comp == b"sowt":  # little-endian 16-bit PCM
            arr = pcm_to_float(frames_data, 16, little_endian=True)
        elif comp in (b"NONE",):
            arr = _be_pcm_to_float(frames_data, bits)
        else:
            return None
        if arr is None:
            return None
        return int(round(rate)), _downmix(arr, n_ch)
    except Exception:  # noqa: BLE001 — malformed payload must not raise
        return None
