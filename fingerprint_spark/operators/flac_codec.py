"""FLAC-subset codec (pure stdlib) — bit-exact lossless audio decode.

Closes the audio tier the way ``jpeg_codec.py`` closed images (r3
VERDICT #5): MP3/MP4 *sample* decode genuinely needs codec libraries
and stays stubbed, but FLAC is a fully public, lossless format
(RFC 9639 / the xiph FLAC format spec) whose core subset fits in pure
Python + numpy:

- container: ``fLaC`` magic, STREAMINFO (+ any other metadata blocks,
  skipped), then frames;
- frame header: 14-bit sync, fixed-blocksize strategy, UTF-8-coded
  frame number, 16-bit (blocksize-1) tail form, CRC-8 verified;
- subframes: CONSTANT, VERBATIM, FIXED predictors (orders 0-4, the
  standard difference polynomials) and LPC (orders 1-32, quantized
  coefficients + shift — what real encoders emit most), all with
  Rice-coded residuals (4-bit parameter, any partition order,
  escape-to-raw supported) and wasted-bits handling;
- frame footer CRC-16 verified; decoded audio verified against the
  STREAMINFO md5 of the raw little-endian sample stream — decode is
  PROVEN bit-exact per file, not assumed.

Stereo decorrelation (left/side, right/side, mid/side — the channel
assignments real encoders emit; the side channel is bps+1 wide) is
decoded and, for fixtures, encoded. Subset limits (refused with
ValueError, the E_PARSE contract): 16-bit samples only; negative LPC
shifts and reserved codes refuse. The encoder (fixture side) emits
CONSTANT for flat blocks, VERBATIM for sub-4 blocks, FIXED order-1 +
Rice otherwise — or the LPC recipe with ``lpc_order=2`` — and codes
shared trailing zeros as wasted bits, so every decoder path real
files hit is exercised.

Reference analog: the byte-level document fallbacks of
src/document/raw.rs; beyond-reference per the round brief's multimodal
requirement.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 (FLAC frame header)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 (FLAC frame)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits terminated by a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        out = 0
        while bits:
            if self.byte >= len(self.data):
                raise ValueError("flac: truncated bitstream")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            out = (out << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else ((-r) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index): standard UTF-8
    byte shapes extended to 7 bytes / 36 bits."""
    if n < 0x80:
        return bytes([n])
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if n < (1 << bits):
            break
    else:
        raise ValueError("flac: coded number out of range")
    lead_bits = 8 - nbytes - 1
    prefix = (0xFF << (lead_bits + 1)) & 0xFF
    out = [prefix | (n >> (6 * (nbytes - 1)))]
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_coded(data: bytes, pos: int) -> tuple[int, int]:
    b0 = data[pos]
    if b0 < 0x80:
        return b0, pos + 1
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    n = b0 & (mask - 1)
    for i in range(1, nbytes):
        b = data[pos + i]
        if (b & 0xC0) != 0x80:
            raise ValueError("flac: bad utf8-coded number")
        n = (n << 6) | (b & 0x3F)
    return n, pos + nbytes


# ---------------------------------------------------------------------------
# encoder (fixture side)
# ---------------------------------------------------------------------------


def _rice_param(folded: np.ndarray) -> int:
    """Pick the Rice parameter minimizing the coded size."""
    best_k, best_bits = 0, float("inf")
    for k in range(15):
        bits = int((folded >> k).sum()) + len(folded) * (k + 1)
        if bits < best_bits:
            best_k, best_bits = k, bits
    return best_k


def _write_residual(
    w: _BitWriter, res: np.ndarray, raw_bits: int = 18
) -> None:
    """Rice coding method 00, partition order 0, one 4-bit parameter.
    raw_bits: escape width (bps + 2 covers any first-difference of
    bps-bit samples)."""
    w.write(0, 2)   # coding method: rice, 4-bit params
    w.write(0, 4)   # partition order 0
    folded = np.array([_zigzag(int(r)) for r in res], dtype=np.int64)
    k = _rice_param(folded) if len(folded) else 0
    if k <= 14 and (len(folded) == 0 or int(folded.max(initial=0) >> k) < 4096):
        w.write(k, 4)
        for u in folded:
            w.write_unary(int(u) >> k)
            w.write(int(u), k)
    else:
        # escape: raw residuals
        w.write(0xF, 4)
        w.write(raw_bits, 5)
        for r in res:
            w.write(int(r) & ((1 << raw_bits) - 1), raw_bits)


# fixture LPC recipe: ANY quantized coefficient set roundtrips exactly
# (the encoder computes residuals with the decoder's own integer
# predictor), so a fixed order-2 near-[2,-1] filter suffices to
# exercise the real-world LPC path
_LPC_PREC = 12          # coded as prec-1 = 11
_LPC_SHIFT = 10
_LPC_COEFS = {2: [1946, -932]}   # ~[1.90, -0.91] at 2^10


def _write_subframe(
    w: _BitWriter, x: np.ndarray, bps: int, lpc_order: int = 0
) -> None:
    """CONSTANT for flat blocks, VERBATIM for sub-4-sample blocks,
    LPC (fixture recipe) when lpc_order is set, FIXED order-1 + Rice
    otherwise, at the given sample width (the side channel of a
    decorrelated stereo pair is bps+1 wide). Trailing zero bits shared
    by the whole block are emitted as wasted bits (spec §4.2.4)."""
    bs = len(x)
    x = x.astype(np.int64)
    # wasted bits: shared trailing zeros (arithmetic >> keeps sign;
    # the decoder shifts back up)
    wasted = 0
    while (
        wasted < bps - 1
        and (x != 0).any()
        and (x & 1 == 0).all()
    ):
        wasted += 1
        x = x >> 1
    eff = bps - wasted

    def _header(stype: int) -> None:
        w.write(0, 1)
        w.write(stype, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if np.all(x == x[0]):
        _header(0)      # CONSTANT
        w.write(int(x[0]), eff)
    elif bs < 4:
        _header(1)      # VERBATIM
        for v in x:
            w.write(int(v), eff)
    elif lpc_order and bs > lpc_order and lpc_order in _LPC_COEFS:
        coefs = _LPC_COEFS[lpc_order]
        _header(0x20 | (lpc_order - 1))   # LPC
        for v in x[:lpc_order]:
            w.write(int(v), eff)          # warm-up
        w.write(_LPC_PREC - 1, 4)
        w.write(_LPC_SHIFT, 5)
        for cf in coefs:
            w.write(cf, _LPC_PREC)
        res = [
            int(x[i])
            - (
                sum(coefs[j] * int(x[i - 1 - j]) for j in range(lpc_order))
                >> _LPC_SHIFT
            )
            for i in range(lpc_order, bs)
        ]
        _write_residual(w, np.array(res, dtype=np.int64), raw_bits=eff + 4)
    else:
        _header(0b001000 | 1)             # FIXED order 1
        w.write(int(x[0]), eff)           # warm-up
        _write_residual(w, np.diff(x), raw_bits=eff + 2)


_STEREO_ASSIGN = {"left_side": 8, "right_side": 9, "mid_side": 10}


def encode_flac(
    samples: np.ndarray,
    rate: int = 8000,
    blocksize: int = 64,
    stereo_mode: str = "independent",
    lpc_order: int = 0,
) -> bytes:
    """samples: int16 array shaped (n,) or (n, channels). Emits
    CONSTANT subframes for flat blocks, FIXED order-1 + Rice
    otherwise; lpc_order=2 switches non-trivial subframes to the LPC
    fixture recipe (exercises the decoder path real encoders hit).
    stereo_mode (2-channel input only): 'independent' or a
    decorrelation — 'left_side' / 'right_side' / 'mid_side' (the
    channel assignments real encoders emit; side = L - R at bps+1)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if not 1 <= ch <= 8:
        raise ValueError("flac: 1..8 channels")
    raw_md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()

    out = bytearray(b"fLaC")
    info = _BitWriter()
    info.write(blocksize, 16)
    info.write(blocksize, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(rate, 20)
    info.write(ch - 1, 3)
    info.write(15, 5)          # bits-per-sample - 1 = 15
    info.write(n, 36)
    body = info.bytes() + raw_md5
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last block

    # mode validation outside the frame loop (an invalid mode must
    # refuse even for empty input, with ValueError not KeyError)
    decorr = stereo_mode != "independent"
    if decorr:
        if stereo_mode not in _STEREO_ASSIGN:
            raise ValueError(
                f"flac: unknown stereo_mode {stereo_mode!r} "
                f"(independent|{'|'.join(sorted(_STEREO_ASSIGN))})"
            )
        if ch != 2:
            raise ValueError("flac: stereo_mode needs 2 channels")
        assign = _STEREO_ASSIGN[stereo_mode]
    else:
        assign = ch - 1
    for fi, start in enumerate(range(0, n, blocksize)):
        blk = s[start : start + blocksize]
        bs = len(blk)
        head = bytearray()
        head += b"\xff\xf8"     # sync 11111111 111110, reserved 0, fixed
        head.append((0x7 << 4) | 0x0)  # blocksize: 16-bit-1 tail; rate: streaminfo
        head.append((assign << 4) | (0x4 << 1) | 0)  # ch assignment, 16 bps
        head += _utf8_coded(fi)
        head += struct.pack(">H", bs - 1)
        head.append(_crc8(bytes(head)))
        w = _BitWriter()
        if decorr:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = left - right
            if stereo_mode == "left_side":
                chans = [(left, 16), (side, 17)]
            elif stereo_mode == "right_side":
                chans = [(side, 17), (right, 16)]
            else:  # mid_side: mid = (L+R)>>1 (floor), side = L-R
                chans = [((left + right) >> 1, 16), (side, 17)]
            for x, bps in chans:
                _write_subframe(w, x, bps, lpc_order)
        else:
            for c in range(ch):
                _write_subframe(
                    w, blk[:, c].astype(np.int64), 16, lpc_order
                )
        w.align()
        frame = bytes(head) + w.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_residual(r: _BitReader, bs: int, order: int) -> list[int]:
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError("flac: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("flac: blocksize not divisible by partitions")
    res: list[int] = []
    for p in range(nparts):
        cnt = bs // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("flac: predictor order exceeds partition")
        k = r.read(pbits)
        if k == escape:
            raw_bits = r.read(5)
            for _ in range(cnt):
                res.append(r.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(cnt):
                q = r.read_unary()
                u = (q << k) | r.read(k)
                res.append(_unzigzag(u))
    return res


def decode_flac(data: bytes) -> dict:
    """-> {rate, channels, n_samples, samples (n, ch) int32 ndarray}.
    Verifies frame CRC-8/CRC-16 and the STREAMINFO md5 of the decoded
    stream; any mismatch, truncation, or out-of-subset feature raises
    ValueError (the E_PARSE contract — callers never see IndexError/
    struct.error from corrupt bytes)."""
    try:
        return _decode_flac(data)
    except (IndexError, struct.error, MemoryError, OverflowError) as e:
        # OverflowError: a crafted LPC/escaped-residual stream can blow
        # predictor values past int64 before the frame CRC-16 is even
        # checked — still a corrupt-stream row outcome, not a crash
        raise ValueError(f"flac: truncated or corrupt stream ({e})") from None


def _decode_flac(data: bytes) -> dict:
    if data[:4] != b"fLaC":
        raise ValueError("flac: bad magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata")
        hdr = data[pos]
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if hdr & 0x7F == 0:
            br = _BitReader(body)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            rate = br.read(20)
            ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            md5 = body[18:34]
            info = (rate, ch, bps, total, md5)
        pos += 4 + length
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    rate, ch, bps, total, md5 = info
    if bps != 16:
        raise ValueError("flac: subset supports 16-bit samples only")
    # bound the 36-bit total-samples allocation ABSOLUTELY, not against
    # the stream size: silence/CONSTANT-heavy audio at real-encoder
    # blocksizes legitimately compresses far beyond any fixed ratio, so
    # a ratio bound would reject valid highly-compressible streams. A
    # corrupt/malicious header still can't drive a huge allocation
    # (MemoryError would escape the E_PARSE contract): cap the decoded
    # buffer at 1 GiB — far above any crawl audio payload this engine
    # ingests per row.
    # 4 bytes/sample: the decode buffer below is int32, not int16
    if total * ch * 4 > 1 << 30:
        raise ValueError(
            f"flac: total_samples {total} x {ch}ch exceeds the 1 GiB "
            "decode-buffer cap"
        )

    out = np.zeros((total, ch), dtype=np.int32)
    got = 0
    while got < total:
        hstart = pos
        if data[pos] != 0xFF or (data[pos + 1] & 0xFC) != 0xF8:
            raise ValueError("flac: lost frame sync")
        bs_code = data[pos + 2] >> 4
        sr_code = data[pos + 2] & 0x0F
        ch_asgn = data[pos + 3] >> 4
        ss_code = (data[pos + 3] >> 1) & 0x7
        if ch_asgn >= 11:
            raise ValueError("flac: reserved channel assignment")
        decorr = ch_asgn >= 8
        if decorr:
            if ch != 2:
                raise ValueError("flac: channel count mismatch")
        elif ch_asgn + 1 != ch:
            raise ValueError("flac: channel count mismatch")
        if ss_code != 0x4:
            raise ValueError("flac: subset supports 16-bit samples only")
        pos += 4
        _num, pos = _read_utf8_coded(data, pos)
        if bs_code == 0x6:
            bs = data[pos] + 1
            pos += 1
        elif bs_code == 0x7:
            bs = struct.unpack(">H", data[pos : pos + 2])[0] + 1
            pos += 2
        else:
            table = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                     8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                     13: 8192, 14: 16384, 15: 32768}
            if bs_code not in table:
                raise ValueError("flac: reserved blocksize code")
            bs = table[bs_code]
        if sr_code in (0xC, 0xD, 0xE):
            pos += 1 if sr_code == 0xC else 2
        elif sr_code == 0xF:
            raise ValueError("flac: invalid sample-rate code")
        crc8 = data[pos]
        if _crc8(data[hstart:pos]) != crc8:
            raise ValueError("flac: frame header CRC-8 mismatch")
        pos += 1

        r = _BitReader(data, pos)
        blk = np.zeros((bs, ch), dtype=np.int64)
        for c in range(ch):
            # the side channel of a decorrelated pair carries bps+1
            # bits (its range is the difference of two bps-bit values)
            bps_c = bps + (
                1
                if decorr
                and (
                    (ch_asgn == 8 and c == 1)   # left/side
                    or (ch_asgn == 9 and c == 0)  # right/side (side first)
                    or (ch_asgn == 10 and c == 1)  # mid/side
                )
                else 0
            )
            if r.read(1):
                raise ValueError("flac: bad subframe padding bit")
            stype = r.read(6)
            wasted = 0
            if r.read(1):
                # wasted-bits: unary count-1 follows; samples are
                # coded at bps - wasted and shifted back up after
                wasted = r.read_unary() + 1
                if wasted >= bps_c:
                    raise ValueError("flac: wasted bits exceed bps")
            eff_bps = bps_c - wasted
            if stype == 0:
                blk[:, c] = r.read_signed(eff_bps)
            elif stype == 1:
                for i in range(bs):
                    blk[i, c] = r.read_signed(eff_bps)
            elif 8 <= stype <= 12:
                order = stype - 8
                if order > bs:
                    raise ValueError("flac: order exceeds blocksize")
                warm = [r.read_signed(eff_bps) for _ in range(order)]
                res = _read_residual(r, bs, order)
                sig = list(warm)
                coefs = _FIXED_COEFS[order]
                for i in range(order, bs):
                    pred = sum(
                        coefs[j] * sig[i - 1 - j] for j in range(order)
                    )
                    sig.append(res[i - order] + pred)
                blk[:, c] = sig
            elif stype >= 0x20:
                # LPC subframe, order 1..32 — what real encoders emit
                order = (stype & 0x1F) + 1
                if order > bs:
                    raise ValueError("flac: order exceeds blocksize")
                warm = [r.read_signed(eff_bps) for _ in range(order)]
                prec = r.read(4)
                if prec == 0xF:
                    raise ValueError("flac: invalid LPC precision")
                prec += 1
                shift = r.read(5)
                if shift >= 16:  # 5-bit signed; negative is forbidden
                    raise ValueError("flac: negative LPC shift")
                coefs = [r.read_signed(prec) for _ in range(order)]
                res = _read_residual(r, bs, order)
                sig = list(warm)
                for i in range(order, bs):
                    pred = sum(
                        coefs[j] * sig[i - 1 - j] for j in range(order)
                    ) >> shift
                    sig.append(res[i - order] + pred)
                blk[:, c] = sig
            else:
                raise ValueError("flac: reserved subframe type")
            if wasted:
                blk[:, c] <<= wasted
        if decorr:
            # undo the decorrelation (RFC 9639 §4.2: side = L - R;
            # mid = (L+R)>>1 with the lost low bit recovered from the
            # side channel's parity)
            if ch_asgn == 8:      # left/side
                left, side = blk[:, 0].copy(), blk[:, 1]
                blk[:, 1] = left - side
            elif ch_asgn == 9:    # right/side
                side, right = blk[:, 0].copy(), blk[:, 1]
                blk[:, 0] = right + side
            else:                 # mid/side
                mid, side = blk[:, 0].copy(), blk[:, 1].copy()
                mid2 = (mid << 1) | (side & 1)
                blk[:, 0] = (mid2 + side) >> 1
                blk[:, 1] = (mid2 - side) >> 1
        r.align()
        fend = r.byte
        crc16 = struct.unpack(">H", data[fend : fend + 2])[0]
        if _crc16(data[hstart:fend]) != crc16:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = fend + 2
        take = min(bs, total - got)
        out[got : got + take] = blk[:take]
        got += take

    if hashlib.md5(out.astype("<i2").tobytes()).digest() != md5:
        raise ValueError("flac: decoded stream md5 mismatch")
    return {
        "rate": rate,
        "channels": ch,
        "n_samples": total,
        "samples": out,
    }
