"""Pure-Python Y4M (YUV4MPEG2) codec (sources/y4m.py) — the video
real-decode path behind operators/multimodal.py; same strategy as the PNG
and WAV codec tests: committed fixture, hand-assembled stream decoded
independently of the encoder, roundtrips across colorspaces, loud
rejection of malformed/out-of-scope streams. The distributed seat and the
every-2nd-frame sample step are proven by the oracle-checked
mm_y4m_frame_sample query."""

from __future__ import annotations

from pathlib import Path

import pytest

from datafusion_distributed_spark.sources.y4m import decode_y4m, encode_y4m

FIXTURE = Path(__file__).parent / "fixtures" / "gradient_c420.y4m"


def _planes(d, w, h, f):
    y = bytes((d + 3 * x + 7 * yy + 11 * f) % 256 for yy in range(h) for x in range(w))
    cw, ch = w // 2, h // 2
    u = bytes((d + 5 * x + 9 * yy + 2 * f) % 256 for yy in range(ch) for x in range(cw))
    v = bytes((d + 4 * x + 6 * yy + 3 * f) % 256 for yy in range(ch) for x in range(cw))
    return y, u, v


def test_committed_fixture_decodes_to_known_planes():
    vid = decode_y4m(FIXTURE.read_bytes())
    assert (vid.width, vid.height, vid.colorspace, vid.n_frames) == (6, 4, "C420", 4)
    assert vid.frames == [_planes(11, 6, 4, f) for f in range(4)]


def test_handbuilt_stream_decodes_independently_of_encoder():
    """C444 2x2, two frames, assembled byte-by-byte from the spec text —
    including an aspect tag and a FRAME parameter the decoder must skip."""
    y0, u0, v0 = b"\x01\x02\x03\x04", b"\x05\x06\x07\x08", b"\x09\x0a\x0b\x0c"
    y1, u1, v1 = b"\x11\x12\x13\x14", b"\x15\x16\x17\x18", b"\x19\x1a\x1b\x1c"
    data = (
        b"YUV4MPEG2 W2 H2 F25:1 Ip A4:3 C444\n"
        b"FRAME\n" + y0 + u0 + v0 +
        b"FRAME Xtag\n" + y1 + u1 + v1
    )
    vid = decode_y4m(data)
    assert (vid.width, vid.height, vid.fps_num, vid.fps_den) == (2, 2, 25, 1)
    assert vid.frames == [(y0, u0, v0), (y1, u1, v1)]


def test_default_colorspace_is_c420():
    """No C tag -> C420 per the spec default."""
    w, h = 2, 2
    y, u, v = b"\x00" * 4, b"\x01", b"\x02"
    data = b"YUV4MPEG2 W2 H2 F30:1\nFRAME\n" + y + u + v
    vid = decode_y4m(data)
    assert vid.colorspace == "C420" and vid.frames == [(y, u, v)]


@pytest.mark.parametrize("cs", ["C444", "C420", "C420jpeg", "C420mpeg2"])
def test_roundtrip_colorspaces(cs):
    w, h, nf = 4, 6, 3
    csz = w * h if cs == "C444" else (w * h) // 4
    frames = [
        (
            bytes((f + i) % 256 for i in range(w * h)),
            bytes((f + 7 + i) % 256 for i in range(csz)),
            bytes((f + 13 + i) % 256 for i in range(csz)),
        )
        for f in range(nf)
    ]
    vid = decode_y4m(encode_y4m(w, h, frames, fps=(24, 1), colorspace=cs))
    assert (vid.colorspace, vid.fps_num) == (cs, 24)
    assert vid.frames == frames


def test_malformed_inputs_reject_loudly():
    good = FIXTURE.read_bytes()
    with pytest.raises(ValueError, match="bad magic"):
        decode_y4m(b"JUNK4MPEG " + good[10:])
    with pytest.raises(ValueError, match="truncated frame"):
        decode_y4m(good[:-5])
    with pytest.raises(ValueError, match="missing W/H"):
        decode_y4m(b"YUV4MPEG2 F30:1\n")
    with pytest.raises(ValueError, match="unsupported colorspace"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F30:1 C422\n")
    with pytest.raises(ValueError, match="interlaced"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F30:1 It C444\n")
    with pytest.raises(ValueError, match="even dimensions"):
        decode_y4m(b"YUV4MPEG2 W3 H2 F30:1 C420\n")
    with pytest.raises(ValueError, match="expected FRAME marker"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F30:1 C444\nBLOB\n" + b"\x00" * 12)


def test_encoder_validates_plane_sizes():
    with pytest.raises(ValueError, match="plane sizes"):
        encode_y4m(2, 2, [(b"\x00" * 4, b"\x00", b"\x00")], colorspace="C444")
    with pytest.raises(ValueError, match="unsupported colorspace"):
        encode_y4m(2, 2, [], colorspace="C422")
