"""Pure-stdlib FLAC decoder (SURVEY X-codec seam, round-5).

FLAC is LOSSLESS: a conforming decoder reconstructs the encoded PCM
samples bit-exactly, so — like the JPEG coefficient half — decoded-
domain features are externally oracle-able with no tolerance. This
module implements the format's decode side from the public spec
(xiph.org FLAC format / RFC 9639):

 - :func:`decode_flac` — stream marker, STREAMINFO metadata block,
   frame headers (sync, UTF-8 frame/sample number, block-size and
   sample-rate codes, CRC-8 field), subframes CONSTANT / VERBATIM /
   FIXED(0..4) / LPC with wasted-bits, partitioned-Rice residuals
   (both 4-bit and 5-bit parameter widths, escape code), and the
   left-side / right-side / mid-side inter-channel decorrelations.
   Returns (flat float64 samples channel-interleaved, sample_rate,
   channels) matching the WAV decoder's output convention.
 - :func:`encode_flac_numpy` — test-rig encoder: builds a valid FLAC
   stream from CHOSEN samples using VERBATIM or FIXED-predictor
   subframes with Rice residuals, so planted-sample fixtures decode
   closed-form (and losslessness pins decode == plant exactly).

Remaining codec seam after this: lossless/arithmetic JPEG and MP4
(multimodal/binary.py raises there). librosa/soundfile are not in this
container; the bit-level work reuses the byte-windowed reader pattern
from multimodal/jpeg.py. Reference analog: the media payload ingest
seam (SURVEY §2.8); the reference itself reads only TIFF slides.
"""

from __future__ import annotations

import numpy as np


class _Bits:
    """MSB-first bit reader (byte-windowed accumulator, no per-bit
    Python loop — same pattern as jpeg._EntropyReader)."""

    __slots__ = ("data", "p", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.p = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.p >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            self.acc = ((self.acc << 8) | self.data[self.p]) & (
                (1 << 64) - 1
            )
            self.p += 1
            self.nbits += 8
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        """Count 0 bits up to the terminating 1 (Rice quotient)."""
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.nbits -= self.nbits % 8

    def byte_pos(self) -> int:
        return self.p - self.nbits // 8


def _read_utf8_number(b: _Bits) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number (up to 36
    bits, 7 bytes)."""
    first = b.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    if n == 0:
        raise ValueError("invalid FLAC UTF-8 number")
    v = first & (mask - 1)
    for _ in range(n):
        c = b.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _rice_residual(b: _Bits, n: int, method: int) -> np.ndarray:
    """One partition's Rice-coded residuals (or the escape raw form)."""
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    param = b.read(pbits)
    out = np.empty(n, dtype=np.int64)
    if param == escape:
        raw = b.read(5)
        for i in range(n):
            out[i] = b.read_signed(raw) if raw else 0
        return out
    for i in range(n):
        q = b.unary()
        v = (q << param) | b.read(param) if param else q
        out[i] = (v >> 1) ^ -(v & 1)  # zigzag -> signed
    return out


def _read_residuals(b: _Bits, block_size: int, pred_order: int) -> np.ndarray:
    method = b.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    plog = b.read(4)
    nparts = 1 << plog
    if block_size % nparts:
        raise ValueError("FLAC partition count does not divide block size")
    out: list[np.ndarray] = []
    for part in range(nparts):
        n = block_size // nparts - (pred_order if part == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds first partition")
        out.append(_rice_residual(b, n, method))
    return np.concatenate(out) if out else np.zeros(0, np.int64)


def _decode_subframe(b: _Bits, block_size: int, bps: int) -> np.ndarray:
    if b.read(1):
        raise ValueError("FLAC subframe sync error (padding bit set)")
    sf_type = b.read(6)
    wasted = 0
    if b.read(1):  # wasted-bits-per-sample flag: unary k-1
        wasted = b.unary() + 1
        bps -= wasted
    if sf_type == 0:  # CONSTANT
        out = np.full(block_size, b.read_signed(bps), dtype=np.int64)
    elif sf_type == 1:  # VERBATIM
        out = np.array(
            [b.read_signed(bps) for _ in range(block_size)], dtype=np.int64
        )
    elif 8 <= sf_type <= 12:  # FIXED, order = type - 8
        order = sf_type - 8
        warm = [b.read_signed(bps) for _ in range(order)]
        res = _read_residuals(b, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, block_size):
            acc = res[i - order]
            for j, c in enumerate(coefs):
                acc += c * out[i - 1 - j]
            out[i] = acc
    elif sf_type >= 32:  # LPC, order = (type & 31) + 1
        order = (sf_type & 31) + 1
        warm = [b.read_signed(bps) for _ in range(order)]
        prec = b.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision escape")
        shift = b.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [b.read_signed(prec) for _ in range(order)]
        res = _read_residuals(b, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * int(out[i - 1 - j])
            out[i] = int(res[i - order]) + (acc >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {sf_type}")
    return out << wasted


_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}


def decode_flac(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a FLAC stream to (flat float64 channel-interleaved
    samples, sample_rate, channels) — the WAV decoder's convention."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC marker)")
    pos = 4
    streaminfo = None
    while True:  # metadata blocks
        if pos + 4 > len(payload):
            raise ValueError("FLAC truncated in metadata")
        hdr = payload[pos]
        last = hdr >> 7
        btype = hdr & 0x7F
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if btype == 0:  # STREAMINFO
            b = _Bits(body)
            b.read(16)  # min block size
            b.read(16)  # max block size
            b.read(24)  # min frame size
            b.read(24)  # max frame size
            rate = b.read(20)
            channels = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            streaminfo = (rate, channels, bps, total)
        pos += 4 + size
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, channels, bps, total = streaminfo
    chunks: list[np.ndarray] = []
    got = 0
    while (total == 0 or got < total) and pos < len(payload):
        b = _Bits(payload, pos)
        sync = b.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC frame sync lost")
        b.read(1)  # reserved
        b.read(1)  # blocking strategy
        bs_code = b.read(4)
        sr_code = b.read(4)
        ch_code = b.read(4)
        sz_code = b.read(3)
        b.read(1)  # reserved
        _read_utf8_number(b)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            block_size = b.read(8) + 1
        elif bs_code == 7:
            block_size = b.read(16) + 1
        else:
            block_size = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            b.read(8)
        elif sr_code in (13, 14):
            b.read(16)
        elif sr_code == 15:
            # RFC 9639: sample-rate code 15 is invalid in a frame header
            raise ValueError("invalid FLAC frame sample rate code")
        frame_bps = {
            0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32
        }.get(sz_code)
        if frame_bps is None:
            raise ValueError("reserved FLAC sample size code")
        b.read(8)  # CRC-8 of the frame header (not verified)
        if ch_code <= 7:
            nch = ch_code + 1
            if nch != channels:
                raise ValueError("FLAC frame/STREAMINFO channel mismatch")
            subs = [
                _decode_subframe(b, block_size, frame_bps)
                for _ in range(nch)
            ]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("FLAC stereo decorrelation needs 2 channels")
            # the DIFFERENCE channel carries one extra bit (spec 9.2.2)
            if ch_code == 8:  # left-side
                left = _decode_subframe(b, block_size, frame_bps)
                side = _decode_subframe(b, block_size, frame_bps + 1)
                subs = [left, left - side]
            elif ch_code == 9:  # right-side
                side = _decode_subframe(b, block_size, frame_bps + 1)
                right = _decode_subframe(b, block_size, frame_bps)
                subs = [right + side, right]
            else:  # mid-side
                mid = _decode_subframe(b, block_size, frame_bps)
                side = _decode_subframe(b, block_size, frame_bps + 1)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("reserved FLAC channel assignment")
        b.align()
        chunks.append(np.stack(subs, axis=1).reshape(-1))
        got += block_size
        pos = b.byte_pos() + 2  # skip frame CRC-16 (not verified)
    if total and got != total:
        raise ValueError("FLAC truncated: sample count short of STREAMINFO")
    flat = (
        np.concatenate(chunks) if chunks else np.zeros(0, np.int64)
    )
    return flat.astype(np.float64), rate, channels


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1)
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def encode_flac_numpy(
    samples: np.ndarray,
    sample_rate: int = 8000,
    bps: int = 16,
    subframe: str = "verbatim",
    rice_param: int = 4,
) -> bytes:
    """Test-rig FLAC encoder: one frame per stream, fixed 'first' frame
    number, independent channels. ``samples``: (n, channels) int array.
    ``subframe``: 'verbatim' (raw samples) or 'fixed2' (order-2 fixed
    predictor with single-partition Rice residuals) — enough surface to
    exercise the decoder's warm-up/residual/prediction paths, while
    losslessness makes decode == plant an exact oracle."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if samples.min() < lo or samples.max() > hi:
        raise ValueError("samples exceed bits-per-sample range")
    # STREAMINFO (34 bytes)
    si = _BitWriter()
    si.write(n, 16)  # min block size
    si.write(n, 16)  # max block size
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.write(0, 128)  # md5 (unset)
    out = bytearray(b"fLaC")
    out.append(0x80)  # last metadata block, type 0
    out += len(si.out).to_bytes(3, "big")
    out += si.out
    # frame header
    hdr = _BitWriter()
    hdr.write(0x3FFE, 14)
    hdr.write(0, 1)
    hdr.write(0, 1)  # fixed blocksize strategy
    hdr.write(7, 4)  # block size: 16-bit at end of header
    hdr.write(0, 4)  # sample rate: from STREAMINFO
    hdr.write(channels - 1, 4)  # independent channels
    hdr.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
    hdr.write(0, 1)
    hdr.write(0, 8)  # frame number 0 (UTF-8 single byte)
    hdr.write(n - 1, 16)
    hdr.align()
    hdr_bytes = bytes(hdr.out)
    frame = _BitWriter()
    for byte in hdr_bytes:
        frame.write(byte, 8)
    frame.write(_crc8(hdr_bytes), 8)
    for ch in range(channels):
        x = samples[:, ch]
        frame.write(0, 1)  # padding
        if subframe == "verbatim":
            frame.write(1, 6)
            frame.write(0, 1)  # no wasted bits
            for v in x:
                frame.write(int(v), bps)
        elif subframe == "fixed2":
            if n < 3:
                raise ValueError("fixed2 rig needs >= 3 samples")
            frame.write(8 + 2, 6)
            frame.write(0, 1)
            for v in x[:2]:
                frame.write(int(v), bps)
            res = x[2:] - 2 * x[1:-1] + x[:-2]
            frame.write(0, 2)  # 4-bit Rice method
            frame.write(0, 4)  # one partition
            frame.write(rice_param, 4)
            for r in res:
                z = (int(r) << 1) ^ (int(r) >> 63)  # signed -> zigzag
                frame.write(1, (z >> rice_param) + 1)  # unary quotient
                frame.write(z & ((1 << rice_param) - 1), rice_param)
        else:
            raise ValueError("subframe must be 'verbatim' or 'fixed2'")
    frame.align()
    body = bytes(frame.out)
    out += body
    out += _crc16(body).to_bytes(2, "big")
    return bytes(out)
