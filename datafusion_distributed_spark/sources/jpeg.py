"""Pure-Python baseline JPEG codec (stdlib only) — the real-decode path for
the multimodal pipeline (operators/multimodal.py), closing the last codec in
the repo's decode gate (PNG/WAV/Y4M landed earlier via the same playbook).

The container ships no image libraries, so the codec is implemented from the
PUBLIC spec (ITU-T T.81 / ISO 10918-1): marker segments (SOI/DQT/DHT/SOF0/
SOS/EOI), canonical Huffman code construction from BITS/HUFFVAL (Annex C),
entropy-coded DC differentials and AC run/size symbols with EOB and ZRL
(F.1.2), 0xFF byte stuffing (F.1.2.3), zigzag coefficient order (Figure
A.6), dequantization, and the 2-D inverse DCT with level shift and clamping
(A.3.3). The reference engine has no JPEG path; this is additive
training-pipeline scope (multimodal binary columns).

Scope (documented, checked):
- DECODE: any baseline sequential (SOF0) single-component 8-bit JPEG with
  one Huffman-coded scan and no restart markers. Progressive (SOF2),
  multi-component, 12-bit, arithmetic coding, and DRI/RSTn are rejected
  with a clear error, never silently wrong.
- ENCODE (the test harness, like the PNG encoder): images are DEFINED in
  the frequency domain — the caller supplies quantized coefficients per
  8x8 block and the encoder performs real entropy coding (canonical DHT
  construction, DC prediction, AC run-length with EOB/ZRL, byte stuffing).
  Because JPEG's only lossy step is forward quantization, coefficients
  round-trip EXACTLY: decode(encode(coeffs)) recovers the coefficients
  bit-for-bit, and the decoded pixels are a closed-form function of the
  coefficients — which is what lets a SQL oracle recompute every pixel
  (operators/multimodal.py mm_jpeg_pixel_stats).

IDCT determinism: the decoder computes f(x,y) = sum over nonzero F(u,v) of
F * BASIS[u][x] * BASIS[v][y] (that multiplication order), then
floor(s + 0.5) + 128, clamped to [0, 255]. The oracle mirrors the same
BASIS constants (repr-exact literals) and the same per-term product order;
the only engine difference is floating summation ORDER across a block's
nonzero coefficients (<= 3 in the fixtures), a last-ulp exposure identical
to the d2u rounding class documented in operators/similarity.py.

Per-payload Python is the known cost: at 100 TB the decode is
embarrassingly parallel (one payload per row via Arrow-batched mapInPandas,
zero shuffle); production swaps the codec loop for libjpeg-turbo behind the
same decode_jpeg signature and schema.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

#: Zigzag order (T.81 Figure A.6): natural index (v*8 + u) of the k-th
#: zigzag-ordered coefficient.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: 1-D IDCT basis: BASIS[u][x] = C(u)/2 * cos((2x+1) u pi / 16), C(0)=1/sqrt2.
#: The SQL oracle embeds these exact doubles as repr literals.
BASIS = [
    [
        ((1.0 / math.sqrt(2.0)) if u == 0 else 1.0)
        * 0.5
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


@dataclass
class JpegImage:
    width: int
    height: int
    pixels: list  # row-major width*height 8-bit luma samples
    n_blocks: int
    coeffs: list  # per-block quantized coefficients, zigzag order (decode proof)


# ---------------------------------------------------------------------------
# Canonical Huffman (T.81 Annex C): codes of increasing length, values in
# HUFFVAL order; within a length, consecutive codes.
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the Annex C generation procedure."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _single_length_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """BITS/HUFFVAL assigning every symbol the same canonical length L, the
    smallest L with 2**L > len(symbols) (strict: the all-1-bits code of any
    length stays unused, as T.81 C.2 requires)."""
    n = len(symbols)
    length = 2
    while (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, sorted(symbols)


# ---------------------------------------------------------------------------
# Bit I/O with 0xFF byte stuffing (F.1.2.3)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (F.1.2.3)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: entropy data exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("jpeg: unexpected marker in entropy data")
                self.pos += 1  # skip stuffed 0x00
            self._acc = byte
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(value: int, size: int) -> int:
    """F.2.2.1 EXTEND: map `size` received bits to the signed coefficient."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _csize(v: int) -> int:
    """Bit-size category of a coefficient value (F.1.2.1.1)."""
    return abs(v).bit_length()


def _value_bits(v: int, size: int) -> int:
    """The `size` appended bits for value v (one's-complement for negatives)."""
    return v if v >= 0 else v + (1 << size) - 1


# ---------------------------------------------------------------------------
# Encoder (frequency-domain test harness; real entropy coding + markers)
# ---------------------------------------------------------------------------


def encode_jpeg_gray(
    width: int, height: int, blocks: list[list[int]], qtable_zig: list[int]
) -> bytes:
    """Real single-component baseline JPEG bytes from per-block QUANTIZED
    coefficients in zigzag order. width/height must be multiples of 8;
    blocks are raster-ordered 8x8 block coefficient lists (64 ints each)."""
    if width % 8 or height % 8:
        raise ValueError("jpeg encoder: dimensions must be multiples of 8")
    if len(blocks) != (width // 8) * (height // 8):
        raise ValueError("jpeg encoder: wrong block count")
    # Collect the DC/AC symbols actually used, then build canonical
    # single-length tables (spec-legal: tables are transmitted in DHT).
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    prev_dc = 0
    for blk in blocks:
        dc_syms.add(_csize(blk[0] - prev_dc))
        prev_dc = blk[0]
        run = 0
        for k in range(1, 64):
            v = blk[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.add(0xF0)  # ZRL
                run -= 16
            ac_syms.add((run << 4) | _csize(v))
            run = 0
        if run:
            ac_syms.add(0x00)  # EOB
    if not ac_syms:
        ac_syms.add(0x00)
    dc_bits, dc_vals = _single_length_table(sorted(dc_syms))
    ac_bits, ac_vals = _single_length_table(sorted(ac_syms))
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    # DQT: Pq=0 (8-bit), Tq=0, 64 zigzag-order bytes
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0x00]) + bytes(qtable_zig)
    # SOF0: 8-bit, 1 component, H=V=1, quant table 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes([1, 0x11, 0])
    # DHT x2
    for tc, (bits, vals) in ((0, (dc_bits, dc_vals)), (1, (ac_bits, ac_vals))):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc << 4]) + bytes(bits) + bytes(vals)
    # SOS: 1 component, DC table 0 / AC table 0, Ss=0 Se=63 AhAl=0
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])

    w = _BitWriter()
    prev_dc = 0
    for blk in blocks:
        diff = blk[0] - prev_dc
        prev_dc = blk[0]
        size = _csize(diff)
        code, length = dc_codes[size]
        w.write(code, length)
        if size:
            w.write(_value_bits(diff, size), size)
        run = 0
        for k in range(1, 64):
            v = blk[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]
                w.write(code, length)
                run -= 16
            size = _csize(v)
            code, length = ac_codes[(run << 4) | size]
            w.write(code, length)
            w.write(_value_bits(v, size), size)
            run = 0
        if run:
            code, length = ac_codes[0x00]
            w.write(code, length)
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder (full baseline single-component path)
# ---------------------------------------------------------------------------


def _clamp8(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _idct_block(coef_nat: list[int]) -> list[int]:
    """Dequantized natural-order coefficients -> 64 clamped 8-bit samples
    (row-major y, x). Skipping zero coefficients is numerically identical
    (adding 0.0 never changes an IEEE sum)."""
    out = []
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                bvy = BASIS[v][y]
                row = v * 8
                for u in range(8):
                    c = coef_nat[row + u]
                    if c:
                        s += c * BASIS[u][x] * bvy
            out.append(_clamp8(int(math.floor(s + 0.5)) + 128))
    return out


def decode_jpeg(data: bytes) -> JpegImage:
    """Decode a baseline sequential single-component 8-bit JPEG."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    comp_q = comp_dc = comp_ac = 0
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: only 8-bit quant tables supported")
                qtables[tq] = list(body[b + 1 : b + 65])
                b += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                codes = _canonical_codes(bits, vals)
                htables[(tc, th)] = {
                    (length, code): sym for sym, (code, length) in codes.items()
                }
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = body[0]
            if precision != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            height, width = struct.unpack(">HH", body[1:5])
            nf = body[5]
            if nf != 1:
                raise NotImplementedError(
                    "jpeg: only single-component (grayscale) baseline supported"
                )
            hv = body[7]
            if hv != 0x11:
                raise NotImplementedError("jpeg: subsampling not supported")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("jpeg: only baseline sequential (SOF0)")
        elif marker == 0xDD:
            raise NotImplementedError("jpeg: restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise NotImplementedError("jpeg: single-component scan only")
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0x0F
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if width is None or scan_start is None:
        raise ValueError("jpeg: missing SOF0/SOS")
    if width % 8 or height % 8:
        raise NotImplementedError("jpeg: partial edge blocks not supported")
    q = qtables[comp_q]
    dc_tab = htables[(0, comp_dc)]
    ac_tab = htables[(1, comp_ac)]
    # Entropy segment runs to the EOI marker.
    end = data.rfind(b"\xff\xd9")
    reader = _BitReader(data[scan_start:end])

    bw, bh = width // 8, height // 8
    pixels = [0] * (width * height)
    coeffs: list[list[int]] = []
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            zig = [0] * 64
            size = _decode_symbol(reader, dc_tab)
            diff = _extend(reader.read_bits(size), size)
            pred += diff
            zig[0] = pred
            k = 1
            while k < 64:
                sym = _decode_symbol(reader, ac_tab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0x0F
                k += run
                if k > 63:
                    raise ValueError("jpeg: AC run past block end")
                zig[k] = _extend(reader.read_bits(size), size)
                k += 1
            coeffs.append(list(zig))
            nat = [0] * 64
            for kk in range(64):
                nat[ZIGZAG[kk]] = zig[kk] * q[kk]
            samples = _idct_block(nat)
            base = (by * 8) * width + bx * 8
            for yy in range(8):
                row = base + yy * width
                srow = yy * 8
                pixels[row : row + 8] = samples[srow : srow + 8]
    return JpegImage(
        width=width,
        height=height,
        pixels=pixels,
        n_blocks=bw * bh,
        coeffs=coeffs,
    )
