"""Pure-Python WebP-lossless (VP8L) codec subset (stdlib only) — narrowing
the multimodal decode gate (operators/multimodal.py) from "webp" to
"lossy webp" only. Implemented from the PUBLIC "WebP Lossless Bitstream
Specification" (the VP8L format inside a RIFF/WEBP container): LSB-first
bit packing, the five-prefix-code pixel model (G/R/B/A/distance), SIMPLE
and NORMAL prefix-code descriptions (the normal path carries the full
code-length code: 19 3-bit lengths in kCodeLengthCodeOrder, canonical
construction, 16/17/18 repeat symbols), LZ77 backward references with the
DEFLATE-style (prefix, extra-bits) value coding, and the color cache with
its 0x1e35a7bd multiplicative hash. The reference engine has no image
path; this is additive training-pipeline scope.

Scope (documented, checked — the JPEG codec's discipline):
- DECODE: VP8L streams with any combination of the SUBTRACT_GREEN and
  PREDICTOR transforms (r12 — all 14 predictor modes, block-size grid,
  spec border rules incl. the rightmost-column TR wrap; inverses applied
  in reverse stream order), no meta prefix image (one prefix-code group),
  any mix of literals, color-cache hits, and backward references with
  ABSOLUTE (> 120) or NEAR (<= 120, the spec's 120-entry window offset
  table — r12) distance codes. The color/palette transforms, meta prefix
  codes, and lossy VP8 payloads still reject loudly.
- ENCODE (the test/fixture harness): real VP8L bytes for arbitrary ARGB
  pixels — real canonical prefix codes described via the NORMAL path
  (code-length code + canonical build), optional color cache, optional
  backward references (near-distance codes opt-in), optional predictor
  transform (mode grid emitted as a real entropy-coded sub-image).
  Lossless means decode(encode(pixels)) == pixels bit-for-bit, which is
  what lets the SQL oracle recompute the fixture's closed-form pixel
  formulas directly (operators/multimodal.py mm_webp_lossless_stats /
  mm_webp_predictor_stats) while the roundtrip proves every decoder
  layer.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

#: Code-length-code symbol storage order (spec section "Prefix code
#: lengths"): the 19 3-bit lengths are stored in this symbol order.
CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

#: Color-cache hash multiplier (spec constant).
_CACHE_MUL = 0x1E35A7BD

#: G-tree alphabet: 256 literals + 24 length prefix codes (+ cache size).
_NUM_LITERALS = 256
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40


def _near_distance_table() -> list[tuple[int, int]]:
    """The spec's 120-entry near-distance (dx, dy) offset table (r12,
    closing the r11 scope rejection). The spec lists it as an explicit
    constant, but the list IS generable: the candidate window is exactly
    {(x, y): 0 <= y <= 7, -7 <= x <= 8, and (y > 0 or x >= 1)} — 8 + 7*16
    = 120 offsets, the same ranges the libwebp nibble packing
    (y = entry >> 4, x = 8 - (entry & 0xF)) can express — ordered by
    squared Euclidean distance with ties broken by LARGER y first, then
    larger x (positive before negative). tests/test_webp_codec.py pins
    this generated table against the spec's explicit 120-entry listing
    transcribed independently, so a rule error cannot pass silently."""
    cands = [
        (x, y)
        for y in range(8)
        for x in range(-7, 9)
        if y > 0 or x >= 1
    ]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return cands


_NEAR_DISTANCES = _near_distance_table()


def _near_code_distance(dist_code: int, width: int) -> int:
    """Pixel distance for a near code (1..120): dx + dy * width, clamped
    to >= 1 (spec: 'if the distance is less than 1, it is set to 1')."""
    dx, dy = _NEAR_DISTANCES[dist_code - 1]
    return max(1, dy * width + dx)


@dataclass
class WebpImage:
    width: int
    height: int
    pixels: list  # row-major width*height*4 samples, RGBA interleaved
    channels: int = 4


class _LsbReader:
    """LSB-first bit reader (VP8L packs bits little-endian within bytes)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bitpos = 0

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte_i = self.bitpos >> 3
            if byte_i >= len(self.data):
                raise ValueError("vp8l: bitstream exhausted")
            v |= ((self.data[byte_i] >> (self.bitpos & 7)) & 1) << i
            self.bitpos += 1
        return v


class _LsbWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._bitpos = 0

    def write_bits(self, value: int, n: int) -> None:
        for i in range(n):
            if self._bitpos & 7 == 0:
                self.out.append(0)
            if (value >> i) & 1:
                self.out[-1] |= 1 << (self._bitpos & 7)
            self._bitpos += 1


def _canonical_from_lengths(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length): canonical prefix codes (shorter first,
    ties by symbol order — the DEFLATE/VP8L construction)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    for length in range(1, 16):
        for sym in range(len(lengths)):
            if lengths[sym] == length:
                codes[sym] = (code, length)
                code += 1
        code <<= 1
    return codes


class _PrefixCode:
    """Decode-side prefix code: either a 0-bit single symbol or a
    (length, code) lookup consumed MSB-of-code-first."""

    def __init__(self, lengths: list[int]) -> None:
        live = [s for s, l in enumerate(lengths) if l > 0]
        if not live:
            raise ValueError("vp8l: empty prefix code")
        if len(live) == 1:
            self.single: int | None = live[0]
            self.table: dict[tuple[int, int], int] = {}
        else:
            self.single = None
            self.table = {
                (length, code): sym
                for sym, (code, length) in _canonical_from_lengths(lengths).items()
            }

    @classmethod
    def single_symbol(cls, sym: int) -> "_PrefixCode":
        pc = cls.__new__(cls)
        pc.single = sym
        pc.table = {}
        return pc

    def decode(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read_bits(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("vp8l: invalid prefix code")


def _read_prefix_code(br: _LsbReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bits(1):  # simple code
        num_symbols = br.read_bits(1) + 1
        if br.read_bits(1):  # first symbol is 8 bits
            sym0 = br.read_bits(8)
        else:
            sym0 = br.read_bits(1)
        if num_symbols == 1:
            return _PrefixCode.single_symbol(sym0)
        sym1 = br.read_bits(8)
        lengths = [0] * alphabet_size
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _PrefixCode(lengths)
    # normal code: code-length code first
    num_cl = 4 + br.read_bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[CODE_LENGTH_ORDER[i]] = br.read_bits(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read_bits(1):  # bounded max_symbol
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = cl_code.decode(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            for _ in range(3 + br.read_bits(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif sym == 17:
            i += 3 + br.read_bits(3)
        else:  # 18
            i += 11 + br.read_bits(7)
    return _PrefixCode(lengths)


def _lz77_value(code: int, br: _LsbReader) -> int:
    """Length/distance prefix value (spec: first 4 codes literal, then
    (2 + code&1) << extra with `extra` appended bits)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read_bits(extra) + 1


def _cache_index(argb: int, cache_bits: int) -> int:
    return ((_CACHE_MUL * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _decode_entropy_image(br: _LsbReader, width: int, height: int,
                          level0: bool) -> list[int]:
    """One entropy-coded ARGB image (spec DecodeImageStream below the
    transform layer): color-cache info, [level0 only] the meta-prefix bit
    (sub-images never carry one — the bit is simply absent there), the
    five prefix codes, then the literal/backref/cache pixel loop. Used for
    the main image AND transform sub-images (the predictor mode grid)."""
    cache_bits = 0
    if br.read_bits(1):
        cache_bits = br.read_bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: invalid color cache size")
    if level0 and br.read_bits(1):
        raise NotImplementedError("vp8l: meta prefix codes not supported")
    g_alpha = _NUM_LITERALS + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    g_code = _read_prefix_code(br, g_alpha)
    r_code = _read_prefix_code(br, 256)
    b_code = _read_prefix_code(br, 256)
    a_code = _read_prefix_code(br, 256)
    d_code = _read_prefix_code(br, _NUM_DISTANCE_CODES)

    n = width * height
    argb: list[int] = []
    cache = [0] * (1 << cache_bits) if cache_bits else None

    def push(px: int) -> None:
        argb.append(px)
        if cache is not None:
            cache[_cache_index(px, cache_bits)] = px

    while len(argb) < n:
        sym = g_code.decode(br)
        if sym < _NUM_LITERALS:
            g = sym
            r = r_code.decode(br)
            b = b_code.decode(br)
            a = a_code.decode(br)
            push((a << 24) | (r << 16) | (g << 8) | b)
        elif sym < _NUM_LITERALS + _NUM_LENGTH_CODES:
            length = _lz77_value(sym - _NUM_LITERALS, br)
            dist_code = _lz77_value(d_code.decode(br), br)
            if dist_code <= 120:
                # Near-distance code (r12): (dx, dy) window offset.
                dist = _near_code_distance(dist_code, width)
            else:
                dist = dist_code - 120
            if dist > len(argb):
                raise ValueError("vp8l: backward reference before image start")
            if len(argb) + length > n:
                # Fail loudly (ADVICE r11): a malformed stream whose final
                # copy extends past width*height must not silently yield an
                # oversized pixel list — this decode gate sees arbitrary
                # external payloads.
                raise ValueError("vp8l: backward reference past image end")
            for _ in range(length):
                push(argb[-dist])
        else:
            if cache is None:
                raise ValueError("vp8l: cache symbol without color cache")
            idx = sym - (_NUM_LITERALS + _NUM_LENGTH_CODES)
            argb.append(cache[idx])  # cache hit re-inserts the same value
    return argb


def _avg2(a: int, b: int) -> int:
    """Per-channel Average2 on packed ARGB: (x + y) / 2 floor, channelwise
    (no carry between channels — computed per extracted channel)."""
    return (
        (((a >> 24 & 0xFF) + (b >> 24 & 0xFF)) // 2) << 24
        | (((a >> 16 & 0xFF) + (b >> 16 & 0xFF)) // 2) << 16
        | (((a >> 8 & 0xFF) + (b >> 8 & 0xFF)) // 2) << 8
        | (((a & 0xFF) + (b & 0xFF)) // 2)
    )


def _clamp255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select_predict(left: int, top: int, topleft: int) -> int:
    """Spec Select(): pick L or T by Manhattan distance to the per-channel
    gradient estimate L + T - TL (strictly-less picks L)."""
    p_l = p_t = 0
    for shift in (24, 16, 8, 0):
        cl = (left >> shift) & 0xFF
        ct = (top >> shift) & 0xFF
        ctl = (topleft >> shift) & 0xFF
        pred = cl + ct - ctl
        p_l += abs(pred - cl)
        p_t += abs(pred - ct)
    return left if p_l < p_t else top


def _clamp_add_subtract_full(left: int, top: int, topleft: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        c = _clamp255(
            ((left >> shift) & 0xFF) + ((top >> shift) & 0xFF)
            - ((topleft >> shift) & 0xFF)
        )
        out |= c << shift
    return out


def _clamp_add_subtract_half(left: int, top: int, topleft: int) -> int:
    """Spec ClampAddSubtractHalf: per channel a = Average2(L, T) then
    Clamp(a + (a - TL) / 2) with C-style truncating division (toward
    zero — (a - TL) may be negative)."""
    out = 0
    for shift in (24, 16, 8, 0):
        a = (((left >> shift) & 0xFF) + ((top >> shift) & 0xFF)) // 2
        d = a - ((topleft >> shift) & 0xFF)
        half = d // 2 if d >= 0 else -((-d) // 2)  # trunc toward zero
        out |= _clamp255(a + half) << shift
    return out


def _predict(mode: int, left: int, top: int, topleft: int, topright: int) -> int:
    """The 14 spec predictor modes (packed-ARGB in, packed-ARGB out)."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:
        return _select_predict(left, top, topleft)
    if mode == 12:
        return _clamp_add_subtract_full(left, top, topleft)
    if mode == 13:
        return _clamp_add_subtract_half(left, top, topleft)
    raise ValueError(f"vp8l: invalid predictor mode {mode}")


def _add_pixels(residual: int, pred: int) -> int:
    """Per-channel mod-256 addition of packed ARGB values."""
    return (
        (((residual >> 24) + (pred >> 24)) & 0xFF) << 24
        | ((((residual >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
        | ((((residual >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
        | (((residual & 0xFF) + (pred & 0xFF)) & 0xFF)
    )


def _predictor_inverse(
    argb: list[int], width: int, height: int,
    modes: list[int], size_bits: int, modes_w: int,
) -> None:
    """In-place inverse PREDICTOR_TRANSFORM: raster scan, each pixel =
    residual + predicted(neighbors already reconstructed), per channel mod
    256. Border rules per spec: (0,0) predicts 0xff000000; the rest of row
    0 predicts L; the rest of column 0 predicts T; the TR neighbor of a
    rightmost-column pixel is the LEFTMOST pixel of the current row."""
    for y in range(height):
        row = y * width
        for x in range(width):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = argb[i - 1]
            elif x == 0:
                pred = argb[i - width]
            else:
                mode = modes[(y >> size_bits) * modes_w + (x >> size_bits)]
                left = argb[i - 1]
                top = argb[i - width]
                topleft = argb[i - width - 1]
                topright = (
                    argb[i - width + 1] if x + 1 < width else argb[row]
                )
                pred = _predict(mode, left, top, topleft, topright)
            argb[i] = _add_pixels(argb[i], pred)


def decode_webp_lossless(data: bytes) -> WebpImage:
    """Decode a VP8L-in-RIFF webp payload within the documented scope."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP container")
    chunk = data[12:16]
    if chunk == b"VP8 ":
        raise NotImplementedError("webp: lossy VP8 not supported (VP8L only)")
    if chunk != b"VP8L":
        raise NotImplementedError(f"webp: unsupported chunk {chunk!r}")
    (payload_len,) = struct.unpack("<I", data[16:20])
    payload = data[20 : 20 + payload_len]
    if not payload or payload[0] != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    br = _LsbReader(payload[1:])
    width = br.read_bits(14) + 1
    height = br.read_bits(14) + 1
    br.read_bits(1)  # alpha hint (informational)
    if br.read_bits(3) != 0:
        raise ValueError("vp8l: unsupported version")
    # Transforms are read in stream order; inverses apply in REVERSE order
    # after the main image decodes (spec).
    transforms: list[tuple] = []
    while br.read_bits(1):
        ttype = br.read_bits(2)
        if ttype == 2:  # SUBTRACT_GREEN: r -= g, b -= g at encode time
            transforms.append(("subtract_green",))
            continue
        if ttype == 0:  # PREDICTOR_TRANSFORM (r12)
            size_bits = 3 + br.read_bits(3)
            mw = (width + (1 << size_bits) - 1) >> size_bits
            mh = (height + (1 << size_bits) - 1) >> size_bits
            mode_img = _decode_entropy_image(br, mw, mh, level0=False)
            modes = [(px >> 8) & 0xFF for px in mode_img]  # green channel
            transforms.append(("predictor", size_bits, mw, modes))
            continue
        raise NotImplementedError(
            f"vp8l: transform type {ttype} not supported "
            "(predictor / subtract-green only)"
        )
    argb = _decode_entropy_image(br, width, height, level0=True)
    for t in reversed(transforms):
        if t[0] == "subtract_green":
            for i, px in enumerate(argb):
                g = (px >> 8) & 0xFF
                r = ((px >> 16 & 0xFF) + g) & 0xFF
                b = ((px & 0xFF) + g) & 0xFF
                argb[i] = (px & 0xFF00FF00) | (r << 16) | b
        else:  # predictor
            _, size_bits, mw, modes = t
            _predictor_inverse(argb, width, height, modes, size_bits, mw)
    pixels: list[int] = []
    for px in argb:
        pixels.extend(
            ((px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF, (px >> 24) & 0xFF)
        )
    return WebpImage(width=width, height=height, pixels=pixels)


# ---------------------------------------------------------------------------
# Encoder (fixture harness): literal/backref/cache token stream -> real
# VP8L bytes with NORMAL prefix-code descriptions.
# ---------------------------------------------------------------------------


def _length_limited_lengths(freqs: dict[int, int], alphabet: int) -> list[int]:
    """COMPLETE canonical code lengths for the observed symbols (Kraft sum
    exactly 1): with n live symbols and d = ceil(log2(n)), put k = 2n - 2^d
    leaves at depth d and n - k at depth d - 1 (a balanced binary tree).
    Not entropy-optimal — the fixture optimizes determinism, not ratio —
    but canonically valid, which is what the decoder checks."""
    live = sorted(s for s, c in freqs.items() if c > 0)
    n = len(live)
    if n <= 1:
        raise ValueError("use a simple code for <= 1 symbol")
    d = 1
    while (1 << d) < n:
        d += 1
    k = 2 * n - (1 << d)  # leaves at depth d; Kraft: (n-k)/2^(d-1)+k/2^d = 1
    lengths = [0] * alphabet
    for i, s in enumerate(live):
        lengths[s] = d - 1 if i < n - k else d
    return lengths


def _write_prefix_code(bw: _LsbWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Emit a prefix-code description; returns symbol -> (code, length)."""
    live = [s for s, l in enumerate(lengths) if l > 0]
    if len(live) == 1 and live[0] < 256:
        bw.write_bits(1, 1)  # simple
        bw.write_bits(0, 1)  # one symbol
        if live[0] <= 1:
            bw.write_bits(0, 1)
            bw.write_bits(live[0], 1)
        else:
            bw.write_bits(1, 1)
            bw.write_bits(live[0], 8)
        return {live[0]: (0, 0)}
    if (
        len(live) == 2
        and all(lengths[s] == 1 for s in live)
        and all(s < 256 for s in live)
    ):
        bw.write_bits(1, 1)
        bw.write_bits(1, 1)  # two symbols
        if live[0] <= 1:
            bw.write_bits(0, 1)
            bw.write_bits(live[0], 1)
        else:
            bw.write_bits(1, 1)
            bw.write_bits(live[0], 8)
        bw.write_bits(live[1], 8)
        return _canonical_from_lengths(lengths)
    # normal path: code-length code over the DISTINCT lengths used
    bw.write_bits(0, 1)
    used = sorted({l for l in lengths if l > 0} | {0})
    cl_freq = {l: lengths.count(l) if l else 1 for l in used}
    cl_lengths = [0] * 19
    if len(used) == 1:
        cl_lengths[used[0]] = 1  # degenerate; never happens (0 always used)
    else:
        clen = 1
        while (1 << clen) < len(used):
            clen += 1
        # complete the code exactly as in _length_limited_lengths
        tmp = _length_limited_lengths({l: 1 for l in used}, 19)
        cl_lengths = tmp
    # num_code_lengths: enough positions in CODE_LENGTH_ORDER to cover
    # every nonzero cl length.
    needed = max(
        (CODE_LENGTH_ORDER.index(l) for l in range(19) if cl_lengths[l] > 0),
        default=0,
    )
    num_cl = max(4, needed + 1)
    bw.write_bits(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write_bits(cl_lengths[CODE_LENGTH_ORDER[i]], 3)
    cl_codes = _canonical_from_lengths(cl_lengths)
    bw.write_bits(0, 1)  # no max_symbol bound: emit every position
    for l in lengths:
        code, ln = cl_codes[l]
        for i in range(ln - 1, -1, -1):
            bw.write_bits((code >> i) & 1, 1)
    return _canonical_from_lengths(lengths)


def _lz77_prefix(value: int) -> tuple[int, int, int]:
    """(code, extra_bits_value, extra_bits_count) for a length/distance."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 1
    code = 2 * nbits + ((v >> (nbits - 1)) & 1)
    extra = v & ((1 << (nbits - 1)) - 1)
    return code, extra, nbits - 1


def _write_entropy_image(
    bw: _LsbWriter,
    tokens: list,
    cache_bits: int,
    level0: bool,
    dist_code_value,
) -> None:
    """Emit one entropy-coded image: color-cache header, [level0 only] the
    meta-prefix bit, the five prefix-code descriptions, then the token
    stream. ``dist_code_value`` maps an actual pixel distance to its
    distance-code value (near code or dist + 120)."""
    if cache_bits:
        bw.write_bits(1, 1)
        bw.write_bits(cache_bits, 4)
    else:
        bw.write_bits(0, 1)
    if level0:
        bw.write_bits(0, 1)  # no meta prefix
    g_alpha = _NUM_LITERALS + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    freqs = {"g": {}, "r": {}, "b": {}, "a": {}, "d": {}}

    def bump(t, s):
        freqs[t][s] = freqs[t].get(s, 0) + 1

    for kind, payload in tokens:
        if kind == "lit":
            px = payload[0]
            bump("g", (px >> 8) & 0xFF)
            bump("r", (px >> 16) & 0xFF)
            bump("b", px & 0xFF)
            bump("a", (px >> 24) & 0xFF)
        elif kind == "ref":
            length, dist = payload
            bump("g", _NUM_LITERALS + _lz77_prefix(length)[0])
            bump("d", _lz77_prefix(dist_code_value(dist))[0])
        else:
            bump("g", _NUM_LITERALS + _NUM_LENGTH_CODES + payload[0])

    def lengths_for(tree: str, alphabet: int) -> list[int]:
        fr = freqs[tree]
        if not fr:
            fr = {0: 1}
        if len(fr) == 1:
            lengths = [0] * alphabet
            lengths[next(iter(fr))] = -1  # sentinel: simple single-symbol
            return lengths
        return _length_limited_lengths(fr, alphabet)

    def emit_tree(tree: str, alphabet: int) -> dict[int, tuple[int, int]]:
        lengths = lengths_for(tree, alphabet)
        if -1 in lengths:
            sym = lengths.index(-1)
            if sym < 256:
                bw.write_bits(1, 1)
                bw.write_bits(0, 1)
                if sym <= 1:
                    bw.write_bits(0, 1)
                    bw.write_bits(sym, 1)
                else:
                    bw.write_bits(1, 1)
                    bw.write_bits(sym, 8)
                return {sym: (0, 0)}
            # symbols >= 256 can't ride the simple 8-bit path: describe a
            # 2-symbol normal-ish code instead (pair with symbol 0).
            lengths = [0] * alphabet
            lengths[0] = 1
            lengths[sym] = 1
        return _write_prefix_code(bw, lengths)

    g_codes = emit_tree("g", g_alpha)
    r_codes = emit_tree("r", 256)
    b_codes = emit_tree("b", 256)
    a_codes = emit_tree("a", 256)
    d_codes = emit_tree("d", _NUM_DISTANCE_CODES)

    def put(codes, sym):
        code, ln = codes[sym]
        for i in range(ln - 1, -1, -1):
            bw.write_bits((code >> i) & 1, 1)

    for kind, payload in tokens:
        if kind == "lit":
            px = payload[0]
            put(g_codes, (px >> 8) & 0xFF)
            put(r_codes, (px >> 16) & 0xFF)
            put(b_codes, px & 0xFF)
            put(a_codes, (px >> 24) & 0xFF)
        elif kind == "ref":
            length, dist = payload
            lcode, lextra, lbits = _lz77_prefix(length)
            put(g_codes, _NUM_LITERALS + lcode)
            bw.write_bits(lextra, lbits)
            dcode, dextra, dbits = _lz77_prefix(dist_code_value(dist))
            put(d_codes, dcode)
            bw.write_bits(dextra, dbits)
        else:
            put(g_codes, _NUM_LITERALS + _NUM_LENGTH_CODES + payload[0])


def _sub_pixels(px: int, pred: int) -> int:
    """Per-channel mod-256 subtraction of packed ARGB values (the forward
    predictor residual; inverse of _add_pixels)."""
    return (
        ((((px >> 24) & 0xFF) - ((pred >> 24) & 0xFF)) & 0xFF) << 24
        | ((((px >> 16) & 0xFF) - ((pred >> 16) & 0xFF)) & 0xFF) << 16
        | ((((px >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF) << 8
        | (((px & 0xFF) - (pred & 0xFF)) & 0xFF)
    )


def encode_webp_lossless(
    width: int,
    height: int,
    rgba: list[int],
    backrefs: list[tuple[int, int, int]] | None = None,
    cache_bits: int = 0,
    subtract_green: bool = False,
    predictor_size_bits: int | None = None,
    predictor_modes: list[int] | None = None,
    near_codes: bool = False,
) -> bytes:
    """Real VP8L bytes for row-major RGBA samples. ``backrefs`` optionally
    replaces runs with LZ77 copies: (pixel_index, length, distance) —
    pixels covered by a backref must EQUAL the pixels `distance` back in
    the CODED plane (post-transform residuals when a predictor is active;
    the encoder checks; lossless means the decode still reproduces
    ``rgba``). ``cache_bits`` > 0 enables the color cache. ``near_codes``
    emits distances that fall inside the spec's 120-entry window as
    near-distance codes (r12). ``predictor_size_bits``/``predictor_modes``
    emit a PREDICTOR_TRANSFORM (r12): the mode grid is
    ceil(w/2^bits) x ceil(h/2^bits) row-major, forward residuals are
    computed against ORIGINAL neighbors (the decoder reconstructs them
    progressively), and — matching the spec's reversed-inverse rule — a
    requested subtract-green applies AFTER the predictor, on residuals,
    with the header listing [PREDICTOR, SUBTRACT_GREEN] in that order."""
    n = width * height
    if len(rgba) != 4 * n:
        raise ValueError("webp encoder: wrong sample count")
    argb = [
        (rgba[4 * i + 3] << 24) | (rgba[4 * i] << 16)
        | (rgba[4 * i + 1] << 8) | rgba[4 * i + 2]
        for i in range(n)
    ]
    if predictor_size_bits is not None:
        mw = (width + (1 << predictor_size_bits) - 1) >> predictor_size_bits
        mh = (height + (1 << predictor_size_bits) - 1) >> predictor_size_bits
        if predictor_modes is None or len(predictor_modes) != mw * mh:
            raise ValueError("webp encoder: predictor mode grid size mismatch")
        residuals = list(argb)
        for y in range(height):
            row = y * width
            for x in range(width):
                i = row + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = argb[i - 1]
                elif x == 0:
                    pred = argb[i - width]
                else:
                    mode = predictor_modes[
                        (y >> predictor_size_bits) * mw
                        + (x >> predictor_size_bits)
                    ]
                    pred = _predict(
                        mode,
                        argb[i - 1],
                        argb[i - width],
                        argb[i - width - 1],
                        argb[i - width + 1] if x + 1 < width else argb[row],
                    )
                residuals[i] = _sub_pixels(argb[i], pred)
        argb = residuals
    if subtract_green:  # forward transform: store r-g, b-g (mod 256)
        argb = [
            (px & 0xFF00FF00)
            | ((((px >> 16) & 0xFF) - ((px >> 8) & 0xFF)) & 0xFF) << 16
            | ((px & 0xFF) - ((px >> 8) & 0xFF)) & 0xFF
            for px in argb
        ]
    ref_at = {}
    for start, length, dist in backrefs or ():
        for k in range(length):
            if argb[start + k] != argb[start + k - dist]:
                raise ValueError("webp encoder: backref does not match data")
        ref_at[start] = (length, dist)
    # Near-distance reverse map (r12): actual pixel distance -> near code,
    # first (closest) table entry wins — mirrors _near_code_distance's
    # clamp so the decoder maps the code back to the identical distance.
    near_map: dict[int, int] = {}
    if near_codes:
        for idx, (dx, dy) in enumerate(_NEAR_DISTANCES):
            d = max(1, dy * width + dx)
            near_map.setdefault(d, idx + 1)

    def _dist_code_value(dist: int) -> int:
        return near_map.get(dist, dist + 120)

    # Tokenize: (kind, payload) with kind in {lit, ref, hit}.
    tokens: list[tuple[str, tuple]] = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    i = 0
    while i < n:
        if i in ref_at:
            length, dist = ref_at[i]
            tokens.append(("ref", (length, dist)))
            if cache is not None:
                for k in range(length):
                    cache[_cache_index(argb[i + k], cache_bits)] = argb[i + k]
            i += length
            continue
        px = argb[i]
        if cache is not None:
            idx = _cache_index(px, cache_bits)
            if cache[idx] == px:
                tokens.append(("hit", (idx,)))
                i += 1
                continue
            cache[idx] = px
        tokens.append(("lit", (px,)))
        i += 1

    bw = _LsbWriter()
    bw.write_bits(width - 1, 14)
    bw.write_bits(height - 1, 14)
    bw.write_bits(1, 1)  # alpha hint
    bw.write_bits(0, 3)  # version
    if predictor_size_bits is not None:
        bw.write_bits(1, 1)  # a transform follows
        bw.write_bits(0, 2)  # PREDICTOR_TRANSFORM
        bw.write_bits(predictor_size_bits - 3, 3)
        # Mode grid as an entropy-coded sub-image (modes ride the green
        # channel; no meta bit at sub-image level — the decoder never
        # reads one there).
        _write_entropy_image(
            bw,
            [("lit", ((m & 0xFF) << 8,)) for m in predictor_modes],
            0,
            level0=False,
            dist_code_value=_dist_code_value,
        )
    if subtract_green:
        bw.write_bits(1, 1)  # a transform follows
        bw.write_bits(2, 2)  # SUBTRACT_GREEN
    bw.write_bits(0, 1)  # no (more) transforms
    _write_entropy_image(
        bw, tokens, cache_bits, level0=True, dist_code_value=_dist_code_value
    )

    payload = bytes([0x2F]) + bytes(bw.out)
    # RIFF convention: the chunk size field excludes the odd-length pad
    # byte; the pad is appended AFTER the sized payload (ADVICE r11 — the
    # previous spelling counted the pad inside the size, which strict
    # external muxer parsers would read as bitstream data).
    pad = b"\x00" if len(payload) % 2 else b""
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload + pad
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
