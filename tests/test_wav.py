"""Pure-Python WAV/PCM codec (sources/wav.py) — the audio real-decode path
behind operators/multimodal.py, tested with the PNG codec's strategy: a
COMMITTED fixture pins the wire format, hand-assembled RIFF bytes verify
the decoder independently of the encoder, every bit depth roundtrips, the
RIFF even-padding rule is honored, and malformed inputs reject loudly.
The distributed seat is proven by the oracle-checked mm_wav_sample_stats
query."""

from __future__ import annotations

import struct
from pathlib import Path

import pytest

from datafusion_distributed_spark.sources.wav import decode_wav, encode_wav

FIXTURE = Path(__file__).parent / "fixtures" / "tone_stereo.wav"


def _tone(nf: int, nch: int, seed: int = 11) -> list:
    return [
        ((seed * 7 + 13 * t + 5 * c) % 2003) - 1001
        for t in range(nf)
        for c in range(nch)
    ]


def test_committed_fixture_decodes_to_known_samples():
    au = decode_wav(FIXTURE.read_bytes())
    assert (au.sample_rate, au.channels, au.bits, au.n_frames) == (12000, 2, 16, 33)
    assert au.samples == _tone(33, 2)
    # channel de-interleave accessor
    assert au.channel(1)[0] == au.samples[1]


def test_handbuilt_riff_decodes_independently_of_encoder():
    """8-bit mono assembled byte-by-byte from the spec — no shared code
    with encode_wav on the write side."""
    pcm = bytes([0, 127, 128, 255, 7])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm + b"\x00"  # odd pad
    )
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    au = decode_wav(data)
    assert (au.channels, au.bits, au.n_frames) == (1, 8, 5)
    assert au.samples == [0, 127, 128, 255, 7]


def test_odd_chunk_padding_rule():
    """A chunk BEFORE data with an odd size must consume its pad byte, or
    every later chunk misparses."""
    note = b"abc"  # odd-length LIST-style chunk
    pcm = struct.pack("<4h", 1, -1, 2, -2)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = (
        b"note" + struct.pack("<I", len(note)) + note + b"\x00"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    au = decode_wav(data)
    assert au.n_frames == 2 and au.samples == [1, -1, 2, -2]


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("nch", [1, 2, 3])
def test_roundtrip_every_bit_depth(bits, nch):
    nf = 17
    lo, hi = (0, 255) if bits == 8 else (-(1 << (bits - 1)), (1 << (bits - 1)) - 1)
    vals = [lo, hi, 0, 1, -1 if bits != 8 else 2]
    samples = [vals[(t * nch + c) % len(vals)] for t in range(nf) for c in range(nch)]
    au = decode_wav(encode_wav(44100, nch, bits, samples))
    assert (au.sample_rate, au.channels, au.bits, au.n_frames) == (44100, nch, bits, nf)
    assert au.samples == samples


def test_malformed_inputs_reject_loudly():
    good = FIXTURE.read_bytes()
    with pytest.raises(ValueError, match="bad magic"):
        decode_wav(b"RIFX" + good[4:])
    with pytest.raises(ValueError, match="not WAVE"):
        decode_wav(good[:8] + b"AVI " + good[12:])
    with pytest.raises(ValueError, match="exceeds the payload"):
        decode_wav(good[:-4])
    # float PCM (format code 3) is out of scope, never silently wrong
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", 0)
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="format code 3"):
        decode_wav(data)
    # ragged data chunk (not whole frames)
    pcm = b"\x01\x02\x03"  # 3 bytes, 16-bit mono -> 1.5 frames
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm + b"\x00"
    )
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="whole number of"):
        decode_wav(data)
    with pytest.raises(ValueError, match="missing fmt"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="bit depth"):
        encode_wav(8000, 1, 12, [0])
    with pytest.raises(ValueError, match="whole interleaved frames"):
        encode_wav(8000, 2, 16, [0, 1, 2])
