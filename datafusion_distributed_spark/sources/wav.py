"""Pure-Python WAV/PCM codec over stdlib ``struct`` — the real-decode path
for AUDIO payloads in the multimodal pipeline (operators/multimodal.py),
the audio twin of the PNG codec in :mod:`.png`.

Implemented from the PUBLIC spec (RIFF/WAVE, Microsoft WAVEFORMAT /
RFC 2361 format codes): ``RIFF <size> WAVE`` container, even-padded
``<fourcc> <size> <data>`` chunks, a ``fmt `` chunk declaring PCM layout
(format code 1 = integer PCM), and a ``data`` chunk of interleaved
little-endian frames. Scope (checked, rejected loudly otherwise):

- integer PCM only (format code 1); 8-bit unsigned, 16/24/32-bit signed;
- no float PCM (code 3), no WAVE_FORMAT_EXTENSIBLE (0xFFFE), no
  compression codecs — a stand-in remains for those;
- chunk sizes are validated against the container and odd-sized chunks
  consume their pad byte (the RIFF rule real encoders rely on).

Like the PNG codec, nothing here touches Spark: the distributed seat is
``mapInPandas`` over binary columns; decode stays embarrassingly parallel
(one payload per row, zero shuffle).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass
class WavAudio:
    sample_rate: int
    channels: int
    bits: int
    n_frames: int
    samples: list  # interleaved ints: frame-major, channel-minor

    def channel(self, c: int) -> list:
        return self.samples[c :: self.channels]


def _iter_chunks(data: bytes):
    """Yield (fourcc, payload) from the RIFF body, honoring even padding."""
    if len(data) < 12 or data[:4] != b"RIFF":
        raise ValueError("not a RIFF file (bad magic)")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if data[8:12] != b"WAVE":
        raise ValueError("RIFF file is not WAVE")
    end = 8 + riff_size
    if end > len(data):
        raise ValueError("RIFF size exceeds the payload")
    pos = 12
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {fourcc!r} chunk")
        yield fourcc, body
        pos += 8 + size + (size & 1)  # odd chunks carry one pad byte


def decode_wav(data: bytes) -> WavAudio:
    """Parse + validate a WAV byte string into interleaved integer samples."""
    fmt = None
    pcm = None
    for fourcc, body in _iter_chunks(data):
        if fourcc == b"fmt ":
            if len(body) < 16:
                raise ValueError("fmt chunk too short")
            code, channels, rate, _byte_rate, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if code != 1:
                raise ValueError(
                    f"unsupported WAV format code {code} (integer PCM only)"
                )
            if bits not in (8, 16, 24, 32):
                raise ValueError(f"unsupported bit depth {bits}")
            if channels < 1:
                raise ValueError("channel count must be >= 1")
            if block_align != channels * (bits // 8):
                raise ValueError(
                    f"block align {block_align} != channels*bytes_per_sample"
                )
            fmt = (channels, rate, bits)
        elif fourcc == b"data":
            pcm = body
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if pcm is None:
        raise ValueError("missing data chunk")
    channels, rate, bits = fmt
    bps = bits // 8
    frame_bytes = channels * bps
    if len(pcm) % frame_bytes:
        raise ValueError(
            f"data chunk ({len(pcm)} bytes) is not a whole number of "
            f"{frame_bytes}-byte frames"
        )
    n_frames = len(pcm) // frame_bytes

    samples: list[int] = []
    if bits == 8:  # unsigned, per spec
        samples = list(pcm)
    elif bits == 16:
        samples = list(struct.unpack(f"<{n_frames * channels}h", pcm))
    elif bits == 32:
        samples = list(struct.unpack(f"<{n_frames * channels}i", pcm))
    else:  # 24-bit: sign-extend each LE triple
        for i in range(0, len(pcm), 3):
            v = pcm[i] | (pcm[i + 1] << 8) | (pcm[i + 2] << 16)
            samples.append(v - (1 << 24) if v & 0x800000 else v)
    return WavAudio(rate, channels, bits, n_frames, samples)


def encode_wav(
    sample_rate: int, channels: int, bits: int, samples: list
) -> bytes:
    """Encode interleaved integer samples as a canonical PCM WAV."""
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported bit depth {bits}")
    if channels < 1 or len(samples) % channels:
        raise ValueError("samples must be whole interleaved frames")
    bps = bits // 8
    if bits == 8:
        pcm = bytes(samples)
    elif bits == 16:
        pcm = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 32:
        pcm = struct.pack(f"<{len(samples)}i", *samples)
    else:
        out = bytearray()
        for v in samples:
            out += (v & 0xFFFFFF).to_bytes(3, "little")
        pcm = bytes(out)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * bps, channels * bps, bits,
    )
    chunks = b"".join(
        fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")
        for fourcc, body in ((b"fmt ", fmt), (b"data", pcm))
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
