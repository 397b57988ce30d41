"""Pure-Python PNG codec (sources/png.py) — the real-decode path behind
operators/multimodal.py.

Strategy mirrors the Avro decoder's tests: a COMMITTED fixture pins the
wire format (a decoder regression breaks known pixel values, independent of
the encoder), filter-0 decode is verified against hand-built scanlines
(independent of the encoder's filter math), every filter type roundtrips,
and the malformed-input paths reject loudly instead of decoding garbage.
The distributed seat (mapInPandas over binary payloads) is proven by the
oracle-checked mm_png_pixel_stats query."""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import pytest

from datafusion_distributed_spark.sources.png import (
    PNG_SIGNATURE,
    PngImage,
    decode_png,
    encode_png,
)

FIXTURE = Path(__file__).parent / "fixtures" / "gradient_rgb.png"


def _gradient(w: int, h: int, nch: int, seed: int = 11) -> bytes:
    return bytes(
        (seed + 3 * x + 7 * y + 11 * c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(nch)
    )


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def test_committed_fixture_decodes_to_known_pixels():
    """The committed bytes pin the format: decoding them must keep yielding
    the exact gradient they were generated from (8x5 RGB, filters cycled
    across all five types)."""
    img = decode_png(FIXTURE.read_bytes())
    assert (img.width, img.height, img.channels) == (8, 5, 3)
    assert img.pixels == _gradient(8, 5, 3)
    assert img.pixel(0, 0) == (11, 22, 33)
    assert img.pixel(7, 4) == ((11 + 21 + 28) % 256, 71, 82)


def test_filter0_decode_against_handbuilt_scanlines():
    """Decoder correctness INDEPENDENT of the encoder: filter type 0 means
    the IDAT scanlines are the raw samples, so a hand-assembled PNG checks
    parse/inflate/row-split with no shared filter code on either side."""
    w, h = 5, 3
    px = _gradient(w, h, 1, seed=40)
    raw = b"".join(
        b"\x00" + px[y * w : (y + 1) * w] for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # grayscale
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    img = decode_png(data)
    assert img.channels == 1 and img.pixels == px


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, "cycle"])
@pytest.mark.parametrize("nch", [1, 2, 3, 4])
def test_roundtrip_every_filter_and_color_type(filter_type, nch):
    """encode -> decode is the identity for every filter type and every
    supported channel count (gray / gray+alpha / RGB / RGBA)."""
    w, h = 7, 6
    px = _gradient(w, h, nch, seed=200)  # wraps mod 256 inside the image
    img = decode_png(encode_png(w, h, nch, px, filter_type=filter_type))
    assert (img.width, img.height, img.channels) == (w, h, nch)
    assert img.pixels == px


def test_single_pixel_and_single_row_edges():
    for w, h in ((1, 1), (4, 1), (1, 4)):
        px = _gradient(w, h, 3, seed=9)
        assert decode_png(encode_png(w, h, 3, px, "cycle")).pixels == px


def test_palette_decode_expands_plte():
    """Color type 3: indexed samples expand through the PLTE chunk to RGB."""
    w, h = 4, 2
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    idx = bytes([0, 1, 2, 0, 2, 1, 0, 1])
    raw = b"\x00" + idx[:w] + b"\x00" + idx[w:]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    img = decode_png(data)
    assert img.channels == 3
    assert img.pixel(0, 0) == (255, 0, 0)
    assert img.pixel(1, 0) == (0, 255, 0)
    assert img.pixel(2, 0) == (0, 0, 255)
    assert img.pixel(0, 1) == (0, 0, 255)
    assert img.pixel(1, 1) == (0, 255, 0)


def test_malformed_inputs_reject_loudly():
    good = FIXTURE.read_bytes()
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"GIF89a" + good[6:])
    # flip one IDAT byte: CRC must catch it
    corrupt = bytearray(good)
    corrupt[-20] ^= 0xFF
    with pytest.raises(ValueError, match="bad CRC|IDAT|truncated|Error -3"):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError, match="missing IEND"):
        decode_png(good[:-12])
    # interlaced header rejected, not silently mis-decoded
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    data = PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="interlace"):
        decode_png(data)
    # 16-bit depth out of scope
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(PNG_SIGNATURE + _chunk(b"IHDR", ihdr))
    # palette image without PLTE
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(data)


def test_multimodal_real_decode_dispatch():
    """_fake_decode routes PNG-signature payloads through the REAL codec;
    the stand-in remains for other payloads (r8 VERDICT item 5)."""
    from datafusion_distributed_spark.operators import multimodal

    w, h = 6, 4
    png = encode_png(w, h, 1, _gradient(w, h, 1), "cycle")
    assert multimodal._fake_decode(png) == (w, h, 1, "png")
    # non-PNG payloads keep the deterministic stand-in
    assert multimodal._fake_decode(b"plain text payload")[3] in (
        "png", "jpeg", "webp",
    )
    # JPEG signatures now dispatch to the REAL baseline codec (round 10),
    # so a malformed jpeg-signature payload fails loudly in the decoder
    # rather than falling back to the stand-in.
    with pytest.raises(ValueError):
        multimodal._real_decode(b"\xff\xd8\xff\xe0 jpeg-ish")
    # formats without a codec in this container stay environment-gated
    with pytest.raises(NotImplementedError, match="webp"):
        multimodal._real_decode(b"RIFF....WEBP")


def test_pngimage_pixel_accessor():
    img = PngImage(2, 2, 1, 0, bytes([1, 2, 3, 4]))
    assert img.pixel(1, 1) == (4,)
