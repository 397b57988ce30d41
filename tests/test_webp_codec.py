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
