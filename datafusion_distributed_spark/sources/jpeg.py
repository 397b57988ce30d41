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
- DECODE: any baseline sequential (SOF0) 8-bit JPEG with one Huffman-coded
  scan — single-component grayscale, or 3-component interleaved YCbCr
  converted to RGB with the JFIF (T.871) matrix at 4:4:4, 4:2:2 or 4:2:0
  (chroma upsampled by sample replication over the 2x1 / 2x2 cell, the
  JFIF nearest-neighbor convention; r11), with restart intervals honored
  (DRI + modulo-8 RSTn re-sync and predictor reset, T.81 F.2.1.3.1; r11).
  Progressive (SOF2), other sampling layouts (4:1:1), 12-bit, and
  arithmetic coding are rejected with a clear error, never silently
  wrong.
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
    pixels: list  # row-major width*height*channels 8-bit samples (RGB interleaved when channels=3)
    n_blocks: int  # MCU count (one block per component per MCU)
    coeffs: list  # per-block quantized coefficients in decode order (proof of the entropy roundtrip)
    channels: int = 1


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

    def sync_restart(self, n: int) -> None:
        """Consume an RSTn marker at a restart boundary (T.81 F.2.1.3.1):
        discard the current byte's padding bits, then require the exact
        expected modulo-8 marker — a wrong or missing RSTn means the
        entropy stream lost sync and must fail loudly."""
        self._nbits = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + n
        ):
            raise ValueError(f"jpeg: expected RST{n} marker at {self.pos}")
        self.pos += 2


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


#: JFIF YCbCr -> RGB constants (ITU-T T.871 / JFIF spec). Mirrored as
#: repr-exact literals in the mm_jpeg_color oracle.
YCC_R_CR = 1.402
YCC_G_CB = 0.344136
YCC_G_CR = 0.714136
YCC_B_CB = 1.772


def _decode_block(
    reader: _BitReader,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
    pred: int,
) -> tuple[list[int], int]:
    """Entropy-decode one 8x8 block: zigzag quantized coefficients + the
    updated DC predictor."""
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
    return zig, pred


def _samples_from_zig(zig: list[int], q: list[int]) -> list[int]:
    nat = [0] * 64
    for kk in range(64):
        nat[ZIGZAG[kk]] = zig[kk] * q[kk]
    return _idct_block(nat)


def decode_jpeg(data: bytes) -> JpegImage:
    """Decode a baseline sequential 8-bit JPEG: single-component
    (grayscale, channels=1) or 3-component interleaved YCbCr converted to
    interleaved RGB (channels=3) at 4:4:4 (all 1x1 sampling) or 4:2:0
    (Y 2x2, chroma 1x1 — the dominant real-world layout; chroma upsampled
    by 2x2 sample replication, JFIF's nearest-neighbor convention).
    Restart intervals (DRI + RSTn, T.81 F.2.1.3.1) are honored: predictors
    reset and the reader re-syncs at every expected modulo-8 marker."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    # (component id, h sampling, v sampling, quant table id)
    frame_comps: list[tuple[int, int, int, int]] = []
    scan_tabs: dict[int, tuple[int, int]] = {}  # comp id -> (Td, Ta)
    scan_order: list[int] = []
    scan_start = None
    restart_interval = 0
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
            if nf not in (1, 3):
                raise NotImplementedError(
                    "jpeg: only 1-component (gray) or 3-component (YCbCr) "
                    "baseline supported"
                )
            for ci in range(nf):
                cid = body[6 + 3 * ci]
                hv = body[7 + 3 * ci]
                frame_comps.append(
                    (cid, hv >> 4, hv & 0x0F, body[8 + 3 * ci])
                )
            factors = tuple((h, v) for _, h, v, _ in frame_comps)
            if factors not in (
                ((1, 1),),                          # grayscale
                ((1, 1), (1, 1), (1, 1)),           # 4:4:4
                ((2, 2), (1, 1), (1, 1)),           # 4:2:0
                ((2, 1), (1, 1), (1, 1)),           # 4:2:2
            ):
                raise NotImplementedError(
                    f"jpeg: unsupported sampling layout {factors} "
                    "(gray, 4:4:4, 4:2:2 or 4:2:0 only)"
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("jpeg: only baseline sequential (SOF0)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != len(frame_comps):
                raise NotImplementedError("jpeg: single interleaved scan only")
            for ci in range(ns):
                cid = body[1 + 2 * ci]
                tt = body[2 + 2 * ci]
                scan_tabs[cid] = (tt >> 4, tt & 0x0F)
                scan_order.append(cid)
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if width is None or scan_start is None:
        raise ValueError("jpeg: missing SOF0/SOS")
    comp_hv = {cid: (h, v) for cid, h, v, _ in frame_comps}
    comp_q = {cid: tq for cid, _h, _v, tq in frame_comps}
    hmax = max(h for _, h, _v, _ in frame_comps)
    vmax = max(v for _, _h, v, _ in frame_comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    if width % mcu_w or height % mcu_h:
        raise NotImplementedError("jpeg: partial edge MCUs not supported")
    # Entropy segment runs to the EOI marker. A missing EOI must fail
    # loudly: rfind's -1 would silently slice data[scan_start:-1] and
    # surface as a confusing mid-stream "entropy data exhausted" (or a
    # quietly truncated decode for a short final block).
    end = data.rfind(b"\xff\xd9")
    if end < scan_start:
        raise ValueError("jpeg: missing EOI marker")
    reader = _BitReader(data[scan_start:end])

    mw, mh = width // mcu_w, height // mcu_h
    nch = 1 if len(frame_comps) == 1 else 3
    pixels = [0] * (width * height * nch)
    coeffs: list[list[int]] = []
    preds = {cid: 0 for cid in scan_order}
    mcu_index = 0
    for by in range(mh):
        for bx in range(mw):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.sync_restart((mcu_index // restart_interval - 1) % 8)
                preds = {cid: 0 for cid in scan_order}
            # comp id -> its (8h x 8v) MCU sample plane, row-major.
            planes: dict[int, list[int]] = {}
            for cid in scan_order:
                td, ta = scan_tabs[cid]
                h, v = comp_hv[cid]
                plane = [0] * (8 * h * 8 * v)
                for sv in range(v):
                    for sh in range(h):
                        zig, preds[cid] = _decode_block(
                            reader, htables[(0, td)], htables[(1, ta)],
                            preds[cid],
                        )
                        coeffs.append(list(zig))
                        samples = _samples_from_zig(zig, qtables[comp_q[cid]])
                        for yy in range(8):
                            row = (sv * 8 + yy) * (8 * h) + sh * 8
                            plane[row : row + 8] = samples[yy * 8 : yy * 8 + 8]
                planes[cid] = plane

            def comp_at(cid: int, x: int, y: int) -> int:
                # Subsampled components replicate each sample over the
                # (hmax/h x vmax/v) pixel cell (nearest-neighbor upsample).
                h, v = comp_hv[cid]
                return planes[cid][((y * v) // vmax) * (8 * h) + (x * h) // hmax]

            base_y, base_x = by * mcu_h, bx * mcu_w
            if nch == 1:
                cid = scan_order[0]
                for yy in range(mcu_h):
                    row = (base_y + yy) * width + base_x
                    for xx in range(mcu_w):
                        pixels[row + xx] = comp_at(cid, xx, yy)
            else:
                c_y, c_cb, c_cr = scan_order
                for yy in range(mcu_h):
                    row = ((base_y + yy) * width + base_x) * 3
                    for xx in range(mcu_w):
                        y = comp_at(c_y, xx, yy)
                        cb = comp_at(c_cb, xx, yy)
                        cr = comp_at(c_cr, xx, yy)
                        # JFIF conversion (T.871), floor(x+0.5) like the
                        # IDCT; expression shapes mirrored in the oracle.
                        r = y + YCC_R_CR * (cr - 128)
                        g = y - YCC_G_CB * (cb - 128) - YCC_G_CR * (cr - 128)
                        b = y + YCC_B_CB * (cb - 128)
                        o = row + xx * 3
                        pixels[o] = _clamp8(int(math.floor(r + 0.5)))
                        pixels[o + 1] = _clamp8(int(math.floor(g + 0.5)))
                        pixels[o + 2] = _clamp8(int(math.floor(b + 0.5)))
            mcu_index += 1
    return JpegImage(
        width=width,
        height=height,
        pixels=pixels,
        n_blocks=mw * mh,
        coeffs=coeffs,
        channels=nch,
    )


def encode_jpeg_color(
    width: int,
    height: int,
    blocks: list[tuple[list[int], list[int], list[int]]],
    q_luma: list[int],
    q_chroma: list[int],
) -> bytes:
    """Real 3-component 4:4:4 baseline JPEG bytes from per-MCU quantized
    (Y, Cb, Cr) coefficient triples in zigzag order. Component 1 uses
    quant/huffman table slot 0; components 2-3 share slot 1 — the standard
    luma/chroma table split."""
    if width % 8 or height % 8:
        raise ValueError("jpeg encoder: dimensions must be multiples of 8")
    if len(blocks) != (width // 8) * (height // 8):
        raise ValueError("jpeg encoder: wrong MCU count")

    def _symbols(blks: list[list[int]], preds_seed: int = 0):
        dc_syms: set[int] = set()
        ac_syms: set[int] = set()
        pred = preds_seed
        for blk in blks:
            dc_syms.add(_csize(blk[0] - pred))
            pred = blk[0]
            run = 0
            for k in range(1, 64):
                v = blk[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms.add(0xF0)
                    run -= 16
                ac_syms.add((run << 4) | _csize(v))
                run = 0
            if run:
                ac_syms.add(0x00)
        if not ac_syms:
            ac_syms.add(0x00)
        return dc_syms, ac_syms

    y_blocks = [m[0] for m in blocks]
    # Chroma components interleave but keep SEPARATE DC predictors; the
    # symbol sweep mirrors that.
    cb_blocks = [m[1] for m in blocks]
    cr_blocks = [m[2] for m in blocks]
    dc0, ac0 = _symbols(y_blocks)
    dcb, acb = _symbols(cb_blocks)
    dcr, acr = _symbols(cr_blocks)
    dc1, ac1 = dcb | dcr, acb | acr

    tables = {}
    for slot, (dcs, acs) in ((0, (dc0, ac0)), (1, (dc1, ac1))):
        db, dv = _single_length_table(sorted(dcs))
        ab, av = _single_length_table(sorted(acs))
        tables[slot] = (
            (db, dv, _canonical_codes(db, dv)),
            (ab, av, _canonical_codes(ab, av)),
        )

    out = bytearray()
    out += b"\xff\xd8"
    for tq, qt in ((0, q_luma), (1, q_chroma)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(qt)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    for slot in (0, 1):
        (db, dv, _), (ab, av, _) = tables[slot]
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(dv))
        out += bytes([slot]) + bytes(db) + bytes(dv)
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(av))
        out += bytes([0x10 | slot]) + bytes(ab) + bytes(av)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])

    w = _BitWriter()
    preds = [0, 0, 0]
    for mcu in blocks:
        for ci, blk in enumerate(mcu):
            slot = 0 if ci == 0 else 1
            (_, _, dc_codes), (_, _, ac_codes) = tables[slot]
            diff = blk[0] - preds[ci]
            preds[ci] = blk[0]
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
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_subsampled(
    width: int,
    height: int,
    mcus: list[tuple[list[list[int]], list[int], list[int]]],
    q_luma: list[int],
    q_chroma: list[int],
    restart_interval: int = 0,
    factors: tuple[int, int] = (2, 2),
) -> bytes:
    """Real subsampled baseline JPEG bytes: each MCU is (the luma blocks
    in raster order — fh*fv of them for luma ``factors`` (fh, fv): 4 for
    4:2:0, 2 for 4:2:2 — one Cb block, one Cr block), all as quantized
    zigzag coefficient lists. ``restart_interval`` > 0 emits a DRI segment
    and injects the modulo-8 RSTn markers every that-many MCUs (T.81
    F.2.1.3.1): the writer pads to a byte boundary with 1-bits and every
    DC predictor resets — exactly the state machine decode_jpeg's
    sync_restart verifies."""
    fh, fv = factors
    if factors not in ((2, 2), (2, 1)):
        raise ValueError("jpeg encoder: luma factors must be 2x2 or 2x1")
    mcu_w, mcu_h = 8 * fh, 8 * fv
    n_luma = fh * fv
    if width % mcu_w or height % mcu_h:
        raise ValueError(
            f"jpeg encoder: dimensions must be multiples of {mcu_w}x{mcu_h}"
        )
    if len(mcus) != (width // mcu_w) * (height // mcu_h):
        raise ValueError("jpeg encoder: wrong MCU count")
    for ys, _cb, _cr in mcus:
        if len(ys) != n_luma:
            raise ValueError(
                f"jpeg encoder: each MCU needs {n_luma} Y blocks"
            )

    def _sweep_symbols():
        """Collect the exact DC/AC symbol sets the writing loop will emit,
        including restart-boundary predictor resets."""
        dc: dict[int, set[int]] = {0: set(), 1: set()}
        ac: dict[int, set[int]] = {0: set(), 1: set()}
        preds = [0, 0, 0]
        for i, (ys, cb, cr) in enumerate(mcus):
            if restart_interval and i and i % restart_interval == 0:
                preds = [0, 0, 0]
            for slot, ci, blks in ((0, 0, ys), (1, 1, [cb]), (1, 2, [cr])):
                for blk in blks:
                    dc[slot].add(_csize(blk[0] - preds[ci]))
                    preds[ci] = blk[0]
                    run = 0
                    for k in range(1, 64):
                        v = blk[k]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ac[slot].add(0xF0)
                            run -= 16
                        ac[slot].add((run << 4) | _csize(v))
                        run = 0
                    if run:
                        ac[slot].add(0x00)
        for slot in (0, 1):
            if not ac[slot]:
                ac[slot].add(0x00)
        return dc, ac

    dc_syms, ac_syms = _sweep_symbols()
    tables = {}
    for slot in (0, 1):
        db, dv = _single_length_table(sorted(dc_syms[slot]))
        ab, av = _single_length_table(sorted(ac_syms[slot]))
        tables[slot] = (_canonical_codes(db, dv), _canonical_codes(ab, av),
                        db, dv, ab, av)

    out = bytearray()
    out += b"\xff\xd8"
    for tq, qt in ((0, q_luma), (1, q_chroma)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(qt)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes([1, (fh << 4) | fv, 0, 2, 0x11, 1, 3, 0x11, 1])
    for slot in (0, 1):
        _, _, db, dv, ab, av = tables[slot]
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(dv))
        out += bytes([slot]) + bytes(db) + bytes(dv)
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(av))
        out += bytes([0x10 | slot]) + bytes(ab) + bytes(av)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])

    w = _BitWriter()
    preds = [0, 0, 0]
    rst_n = 0
    for i, (ys, cb, cr) in enumerate(mcus):
        if restart_interval and i and i % restart_interval == 0:
            w.flush()
            out += w.out
            out += bytes([0xFF, 0xD0 + rst_n])
            rst_n = (rst_n + 1) % 8
            w = _BitWriter()
            preds = [0, 0, 0]
        for slot, ci, blks in ((0, 0, ys), (1, 1, [cb]), (1, 2, [cr])):
            dc_codes, ac_codes = tables[slot][0], tables[slot][1]
            for blk in blks:
                diff = blk[0] - preds[ci]
                preds[ci] = blk[0]
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
    out += b"\xff\xd9"
    return bytes(out)
