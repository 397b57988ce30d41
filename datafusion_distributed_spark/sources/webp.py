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
- DECODE: VP8L streams with the SUBTRACT_GREEN transform or none, no meta
  prefix image (one prefix-code group), any mix of literals, color-cache
  hits, and backward references with ABSOLUTE distance codes (> 120). The
  120-entry near-distance pixel-offset table is NOT implemented — dist
  codes <= 120 reject loudly (the table is a literal spec constant;
  guessing it risks silently-wrong pixels, the one failure mode this gate
  bans). The predictor / color / palette transforms, meta prefix codes,
  and lossy VP8 payloads also reject loudly.
- ENCODE (the test/fixture harness): real VP8L bytes for arbitrary ARGB
  pixels — real canonical prefix codes described via the NORMAL path
  (code-length code + canonical build), optional color cache, optional
  backward references. Lossless means decode(encode(pixels)) == pixels
  bit-for-bit, which is what lets the SQL oracle recompute the fixture's
  closed-form pixel formulas directly (operators/multimodal.py
  mm_webp_lossless_stats) while the roundtrip proves every decoder layer.
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
    subtract_green = False
    while br.read_bits(1):
        ttype = br.read_bits(2)
        if ttype == 2:  # SUBTRACT_GREEN: r -= g, b -= g at encode time
            subtract_green = True
            continue
        raise NotImplementedError(
            f"vp8l: transform type {ttype} not supported "
            "(subtract-green only)"
        )
    cache_bits = 0
    if br.read_bits(1):
        cache_bits = br.read_bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: invalid color cache size")
    if br.read_bits(1):
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
                raise NotImplementedError(
                    "vp8l: near-distance codes (<= 120) not supported"
                )
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
    pixels: list[int] = []
    for px in argb:
        r, g, b, a = (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF, (px >> 24) & 0xFF
        if subtract_green:  # inverse transform: add green back (mod 256)
            r = (r + g) & 0xFF
            b = (b + g) & 0xFF
        pixels.extend((r, g, b, a))
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


def encode_webp_lossless(
    width: int,
    height: int,
    rgba: list[int],
    backrefs: list[tuple[int, int, int]] | None = None,
    cache_bits: int = 0,
    subtract_green: bool = False,
) -> bytes:
    """Real VP8L bytes for row-major RGBA samples. ``backrefs`` optionally
    replaces runs with LZ77 copies: (pixel_index, length, distance) —
    pixels covered by a backref must EQUAL the pixels `distance` back (the
    encoder checks; lossless means the decode still reproduces `rgba`).
    ``cache_bits`` > 0 enables the color cache; pixels whose value sits in
    the running cache are emitted as cache hits."""
    n = width * height
    if len(rgba) != 4 * n:
        raise ValueError("webp encoder: wrong sample count")
    def _px(i: int) -> int:
        r, g, b, a = rgba[4 * i], rgba[4 * i + 1], rgba[4 * i + 2], rgba[4 * i + 3]
        if subtract_green:  # forward transform: store r-g, b-g (mod 256)
            r = (r - g) & 0xFF
            b = (b - g) & 0xFF
        return (a << 24) | (r << 16) | (g << 8) | b

    argb = [_px(i) for i in range(n)]
    ref_at = {}
    for start, length, dist in backrefs or ():
        for k in range(length):
            if argb[start + k] != argb[start + k - dist]:
                raise ValueError("webp encoder: backref does not match data")
        ref_at[start] = (length, dist)

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
            bump("d", _lz77_prefix(dist + 120)[0])
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

    bw = _LsbWriter()
    bw.write_bits(width - 1, 14)
    bw.write_bits(height - 1, 14)
    bw.write_bits(1, 1)  # alpha hint
    bw.write_bits(0, 3)  # version
    if subtract_green:
        bw.write_bits(1, 1)  # one transform follows
        bw.write_bits(2, 2)  # SUBTRACT_GREEN
    bw.write_bits(0, 1)  # no (more) transforms
    if cache_bits:
        bw.write_bits(1, 1)
        bw.write_bits(cache_bits, 4)
    else:
        bw.write_bits(0, 1)
    bw.write_bits(0, 1)  # no meta prefix

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
            dcode, dextra, dbits = _lz77_prefix(dist + 120)
            put(d_codes, dcode)
            bw.write_bits(dextra, dbits)
        else:
            put(g_codes, _NUM_LITERALS + _NUM_LENGTH_CODES + payload[0])

    payload = bytes([0x2F]) + bytes(bw.out)
    # RIFF convention: the chunk size field excludes the odd-length pad
    # byte; the pad is appended AFTER the sized payload (ADVICE r11 — the
    # previous spelling counted the pad inside the size, which strict
    # external muxer parsers would read as bitstream data).
    pad = b"\x00" if len(payload) % 2 else b""
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload + pad
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
