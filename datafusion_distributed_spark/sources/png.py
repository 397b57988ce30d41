"""Pure-Python PNG codec over stdlib ``zlib`` — the real-decode path for the
multimodal pipeline (operators/multimodal.py).

The container ships no image libraries, so — same playbook as the Avro
decoder in :mod:`.avro` — the codec is implemented from the PUBLIC spec
(PNG, RFC 2083 / ISO 15948: 8-byte signature, length-type-data-CRC chunks,
IHDR geometry, zlib-deflated IDAT scanlines with five per-row filter types,
PLTE palettes). Nothing here touches Spark: the distributed seat is
``mapInPandas`` over binary payload columns in multimodal.py, which streams
Arrow batches through :func:`decode_png` partition-parallel.

Scope (documented, checked):
- bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA); palettes expanded to RGB on decode.
- all five scanline filters (None/Sub/Up/Average/Paeth) on decode AND
  encode — the roundtrip query mm_png_pixel_stats cycles filters per row so
  every unfilter path is exercised against the SQL oracle.
- no Adam7 interlace, no 16-bit, no ancillary-chunk semantics (tRNS etc.) —
  rejected with a clear error, never silently wrong.

Per-pixel Python is the known cost: at 100 TB the decode stays
embarrassingly parallel (one payload per row, no shuffle) and the real
bottleneck is the codec loop, which production would swap for a vectorized
library behind the same ``decode_png`` signature and schema.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: samples per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


@dataclass
class PngImage:
    width: int
    height: int
    channels: int  # after palette expansion
    color_type: int
    pixels: bytes  # row-major, width*height*channels samples, 8-bit

    def pixel(self, x: int, y: int) -> tuple:
        off = (y * self.width + x) * self.channels
        return tuple(self.pixels[off : off + self.channels])


def _iter_chunks(data: bytes):
    """Yield (chunk_type, payload) verifying each CRC (spec: CRC-32 over
    type+data)."""
    pos = len(PNG_SIGNATURE)
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC on {ctype!r} chunk")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND chunk")


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (spec §6.6): nearest of left/up/up-left to a+b-c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> PngImage:
    """Parse + inflate + unfilter a PNG byte string into raw 8-bit samples."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    color_type = bit_depth = None
    palette: bytes | None = None
    idat = bytearray()
    for ctype, body in _iter_chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth} (only 8)")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            if interlace != 0:
                raise ValueError("Adam7 interlace not supported")
        elif ctype == b"PLTE":
            if len(body) % 3:
                raise ValueError("PLTE length not a multiple of 3")
            palette = body
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise ValueError("missing IHDR chunk")
    if color_type == 3 and palette is None:
        raise ValueError("palette image without PLTE chunk")

    nch = _CHANNELS[color_type]
    stride = width * nch  # bytes per unfiltered scanline (8-bit samples)
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"IDAT size mismatch: {len(raw)} != {(stride + 1) * height}"
        )

    out = bytearray(stride * height)
    prev_off = -stride  # row above (all zero for the first row, per spec)
    for y in range(height):
        fbyte = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        off = y * stride
        if fbyte == 0:  # None
            out[off : off + stride] = line
        elif fbyte == 1:  # Sub
            for i in range(stride):
                left = out[off + i - nch] if i >= nch else 0
                out[off + i] = (line[i] + left) & 0xFF
        elif fbyte == 2:  # Up
            for i in range(stride):
                up = out[prev_off + off + i] if y else 0
                out[off + i] = (line[i] + up) & 0xFF
        elif fbyte == 3:  # Average
            for i in range(stride):
                left = out[off + i - nch] if i >= nch else 0
                up = out[prev_off + off + i] if y else 0
                out[off + i] = (line[i] + (left + up) // 2) & 0xFF
        elif fbyte == 4:  # Paeth
            for i in range(stride):
                left = out[off + i - nch] if i >= nch else 0
                up = out[prev_off + off + i] if y else 0
                ul = out[prev_off + off + i - nch] if (y and i >= nch) else 0
                out[off + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {fbyte} on row {y}")

    if color_type == 3:
        expanded = bytearray(width * height * 3)
        for i, idx in enumerate(out):
            if idx * 3 + 3 > len(palette):
                raise ValueError(f"palette index {idx} out of range")
            expanded[i * 3 : i * 3 + 3] = palette[idx * 3 : idx * 3 + 3]
        return PngImage(width, height, 3, color_type, bytes(expanded))
    return PngImage(width, height, nch, color_type, bytes(out))


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    filter_type: int | str = 0,
) -> bytes:
    """Encode raw 8-bit samples as a valid PNG.

    ``filter_type``: a single filter (0-4) applied to every row, or
    ``"cycle"`` to use filter ``y % 5`` on row y — the roundtrip tests use
    cycle mode so every decoder unfilter path is exercised."""
    ct = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if ct is None:
        raise ValueError(f"channels must be 1/2/3/4, got {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"pixel buffer {len(pixels)} != {stride * height}")

    filtered = bytearray()
    for y in range(height):
        f = (y % 5) if filter_type == "cycle" else int(filter_type)
        row = pixels[y * stride : (y + 1) * stride]
        prev = pixels[(y - 1) * stride : y * stride] if y else bytes(stride)
        filtered.append(f)
        if f == 0:
            filtered += row
        elif f == 1:
            filtered += bytes(
                (row[i] - (row[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif f == 2:
            filtered += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:
            filtered += bytes(
                (
                    row[i]
                    - ((row[i - channels] if i >= channels else 0) + prev[i]) // 2
                )
                & 0xFF
                for i in range(stride)
            )
        elif f == 4:
            filtered += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"filter_type must be 0-4 or 'cycle', got {f}")

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ct, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(filtered), 6))
        + _chunk(b"IEND", b"")
    )
