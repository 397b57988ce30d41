"""Unit tests for the pure-Python VP8L (webp-lossless) codec subset
(sources/webp.py) — the codec-level complement to the end-to-end
mm_webp_lossless_stats oracle query. Covers: exact roundtrip of random
ARGB pixels through real prefix codes (normal descriptions with the
code-length code), constrained palettes (short codes), LZ77 backward
references with absolute distance codes, the color cache and its
0x1e35a7bd hash, and the scope gates (lossy VP8, transforms, meta prefix
codes, near-distance codes all reject loudly)."""

from __future__ import annotations

import random
import struct

import pytest

from datafusion_distributed_spark.sources.webp import (
    _canonical_from_lengths,
    _length_limited_lengths,
    _lz77_prefix,
    _LsbReader,
    _lz77_value,
    decode_webp_lossless,
    encode_webp_lossless,
)


def test_random_literal_roundtrip():
    rng = random.Random(7)
    for _ in range(40):
        w, h = rng.randint(1, 9), rng.randint(1, 7)
        rgba = [rng.randint(0, 255) for _ in range(4 * w * h)]
        img = decode_webp_lossless(encode_webp_lossless(w, h, rgba))
        assert (img.width, img.height, img.channels) == (w, h, 4)
        assert img.pixels == rgba


def test_palette_roundtrip_short_codes():
    rng = random.Random(11)
    for _ in range(10):
        pal = [
            (rng.randint(0, 255), rng.randint(0, 255), rng.randint(0, 255), 255)
            for _ in range(3)
        ]
        rgba = []
        for _ in range(64):
            rgba.extend(pal[rng.randint(0, 2)])
        assert decode_webp_lossless(encode_webp_lossless(8, 8, rgba)).pixels == rgba


def test_backward_reference_and_cache():
    w, h = 8, 4
    row = [v for x in range(w) for v in (x * 17 % 256, 30, 200, 255)]
    rgba = row * h
    data = encode_webp_lossless(
        w, h, rgba, backrefs=[(w, w * (h - 1), w)], cache_bits=4
    )
    assert decode_webp_lossless(data).pixels == rgba
    # encoder refuses a backref that does not reproduce the data
    bad = list(rgba)
    bad[4 * w] = (bad[4 * w] + 1) % 256
    with pytest.raises(ValueError, match="backref"):
        encode_webp_lossless(w, h, bad, backrefs=[(w, w, w)])


def test_kraft_complete_lengths():
    rng = random.Random(3)
    for _ in range(50):
        n = rng.randint(2, 40)
        freqs = {rng.randint(0, 255): 1 for _ in range(n)}
        lengths = _length_limited_lengths(freqs, 256)
        assert abs(sum(2.0 ** -l for l in lengths if l) - 1.0) < 1e-12
        # canonical build succeeds and is prefix-free by construction
        codes = _canonical_from_lengths(lengths)
        assert len(codes) == len([l for l in lengths if l])


def test_lz77_prefix_value_inverse():
    for v in list(range(1, 70)) + [127, 128, 129, 1000, 4096]:
        code, extra, nbits = _lz77_prefix(v)
        # feed the extra bits back through a reader
        from datafusion_distributed_spark.sources.webp import _LsbWriter

        bw = _LsbWriter()
        bw.write_bits(extra, nbits)
        br = _LsbReader(bytes(bw.out) or b"\x00")
        assert _lz77_value(code, br) == v


def test_scope_gates():
    with pytest.raises(NotImplementedError, match="VP8L"):
        decode_webp_lossless(b"RIFF\x00\x00\x00\x00WEBPVP8 \x00\x00\x00\x00")
    good = encode_webp_lossless(2, 2, [1, 2, 3, 255] * 4)
    # flip the no-transform bit (first bit after the 29-bit header inside
    # the VP8L payload): payload starts at byte 20, signature at 20,
    # bitstream at 21; header = 14+14+1+3 = 32 bits -> transform flag is
    # bit 0 of payload byte 21+4.
    mutated = bytearray(good)
    mutated[25] |= 0x01
    with pytest.raises((NotImplementedError, ValueError)):
        decode_webp_lossless(bytes(mutated))
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp_lossless(b"JUNK" + good[4:])


def test_container_layout():
    data = encode_webp_lossless(3, 2, [9, 8, 7, 255] * 6)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    assert data[12:16] == b"VP8L"
    (riff_len,) = struct.unpack("<I", data[4:8])
    assert riff_len == len(data) - 8
    assert data[20] == 0x2F


def test_subtract_green_transform_roundtrip():
    rng = random.Random(21)
    for _ in range(15):
        w, h = rng.randint(1, 8), rng.randint(1, 6)
        rgba = [rng.randint(0, 255) for _ in range(4 * w * h)]
        data = encode_webp_lossless(w, h, rgba, subtract_green=True)
        img = decode_webp_lossless(data)
        assert img.pixels == rgba
    # the transform genuinely changes the stored stream for non-gray pixels
    rgba = [200, 10, 55, 255] * 4
    a = encode_webp_lossless(2, 2, rgba)
    b = encode_webp_lossless(2, 2, rgba, subtract_green=True)
    assert a != b
    assert decode_webp_lossless(a).pixels == decode_webp_lossless(b).pixels


# ---------------------------------------------------------------------------
# r12: near-distance codes + predictor transform
# ---------------------------------------------------------------------------

from datafusion_distributed_spark.sources.webp import (  # noqa: E402
    _clamp_add_subtract_half,
    _near_code_distance,
    _near_distance_table,
    _predict,
    _select_predict,
)

# The spec's explicit 120-entry near-distance listing ((dx, dy) pairs),
# transcribed INDEPENDENTLY of the generation rule in sources/webp.py —
# the whole point of this pin: two separate encodings of the constant
# must agree exactly, so a rule error cannot pass silently.
_SPEC_NEAR_TABLE = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def test_near_distance_table_matches_spec_listing():
    got = _near_distance_table()
    assert len(got) == 120
    assert got == _SPEC_NEAR_TABLE


def test_near_code_distance_clamp():
    # (1, 0) -> distance 1 at any width; (0, 1) -> the row stride;
    # (-7, 1) at width 4 gives 4 - 7 = -3 -> clamped to 1 (spec rule).
    w4 = 4
    assert _near_code_distance(2, w4) == 1          # (1, 0)
    assert _near_code_distance(1, w4) == 4          # (0, 1)
    neg_code = _SPEC_NEAR_TABLE.index((-7, 1)) + 1
    assert _near_code_distance(neg_code, w4) == 1   # clamped


def test_near_code_backref_roundtrip():
    rng = random.Random(7)
    for w, h in [(4, 4), (8, 5), (12, 3)]:
        row = [rng.randint(0, 255) for _ in range(4 * w)]
        rgba = row * h
        refs = [(w * y, w, w) for y in range(1, h)]
        near = encode_webp_lossless(w, h, rgba, backrefs=refs, near_codes=True)
        absolute = encode_webp_lossless(w, h, rgba, backrefs=refs)
        assert decode_webp_lossless(near).pixels == rgba
        assert decode_webp_lossless(absolute).pixels == rgba
        # near coding produced a genuinely different stream
        assert near != absolute


def test_predictor_all_modes_roundtrip():
    rng = random.Random(13)
    for mode in range(14):
        w, h = 16, 8
        rgba = [rng.randint(0, 255) for _ in range(4 * w * h)]
        data = encode_webp_lossless(
            w, h, rgba, predictor_size_bits=4, predictor_modes=[mode]
        )
        assert decode_webp_lossless(data).pixels == rgba, f"mode {mode}"


def test_predictor_multiblock_and_rightmost_tr():
    # width NOT a multiple of the block size, and mode 3/9 (TR-using)
    # blocks covering the rightmost column -> exercises the spec's
    # leftmost-pixel-of-current-row TR substitution.
    rng = random.Random(29)
    w, h = 13, 9  # size_bits 3 -> grid 2 x 2
    rgba = [rng.randint(0, 255) for _ in range(4 * w * h)]
    data = encode_webp_lossless(
        w, h, rgba, predictor_size_bits=3, predictor_modes=[3, 9, 5, 10]
    )
    assert decode_webp_lossless(data).pixels == rgba


def test_predictor_with_subtract_green_and_cache():
    rng = random.Random(31)
    w, h = 20, 10
    rgba = [rng.randint(0, 255) for _ in range(4 * w * h)]
    data = encode_webp_lossless(
        w, h, rgba, predictor_size_bits=3,
        predictor_modes=[11, 12, 13, 7, 2, 6],
        subtract_green=True, cache_bits=3,
    )
    assert decode_webp_lossless(data).pixels == rgba


def test_clamp_add_subtract_half_truncates_toward_zero():
    # Per spec (C semantics), (a - TL) / 2 truncates toward zero:
    # L=100 T=100 TL=255 -> a=100, d=-155, half=-77 (not floor's -78),
    # channel = clamp(23) = 23.
    left = 0xFF000000 | (100 << 16)
    top = 0xFF000000 | (100 << 16)
    topleft = 0xFF000000 | (255 << 16)
    out = _clamp_add_subtract_half(left, top, topleft)
    assert (out >> 16) & 0xFF == 23
    # alpha channel: a=255, d=0 -> stays 255
    assert (out >> 24) & 0xFF == 255


def test_select_predict_strict_less_picks_left():
    # Equal Manhattan distances -> NOT strictly less -> returns TOP.
    l_px = 0xFF000000 | (10 << 16)
    t_px = 0xFF000000 | (20 << 16)
    tl = 0xFF000000 | (15 << 16)
    # pred_r = 10+20-15 = 15; |15-10| == |15-20| -> tie -> top
    assert _select_predict(l_px, t_px, tl) == t_px
    # make left strictly closer
    tl2 = 0xFF000000 | (19 << 16)  # pred_r = 11; dL=1 < dT=9
    assert _select_predict(l_px, t_px, tl2) == l_px


def test_predictor_border_rules():
    # 1x1 image: the only pixel predicts 0xff000000 regardless of mode ->
    # residual a-channel = a - 255; roundtrip must restore exactly.
    for mode in (0, 5, 12):
        rgba = [7, 8, 9, 200]
        data = encode_webp_lossless(
            1, 1, rgba, predictor_size_bits=3, predictor_modes=[mode]
        )
        assert decode_webp_lossless(data).pixels == rgba
    # single row (all L-predicted) and single column (all T-predicted)
    rgba_row = [1, 2, 3, 255, 4, 5, 6, 255, 7, 8, 9, 255]
    data = encode_webp_lossless(
        3, 1, rgba_row, predictor_size_bits=3, predictor_modes=[13]
    )
    assert decode_webp_lossless(data).pixels == rgba_row
    data = encode_webp_lossless(
        1, 3, rgba_row, predictor_size_bits=3, predictor_modes=[13]
    )
    assert decode_webp_lossless(data).pixels == rgba_row
