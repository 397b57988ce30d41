"""Pure-Python Y4M (YUV4MPEG2) codec — the real-decode VIDEO path for the
multimodal pipeline, completing the image (png.py) / audio (wav.py) /
video trio of spec-implemented codecs.

Y4M is mplayer/ffmpeg's uncompressed interchange format (PUBLIC spec:
a plain-ASCII stream header ``YUV4MPEG2 W<w> H<h> F<num>:<den> [I<i>]
[A<n>:<d>] [C<cs>]\\n`` followed by ``FRAME[params]\\n`` markers, each
carrying raw planar YUV). Scope (validated, rejected loudly otherwise):

- colorspaces C444 (full-resolution planes) and C420 family
  (C420/C420jpeg/C420paldv/C420mpeg2 — quarter-resolution chroma; even
  dimensions required);
- progressive streams; interlacing params other than Ip are rejected;
- every frame's payload length is checked against the geometry.

The frame-SAMPLE step of a real video pipeline (decode -> keep every Nth
frame -> per-frame features) runs over these decoded planes in
operators/multimodal.py, Arrow-batched and shuffle-free.
"""

from __future__ import annotations

from dataclasses import dataclass

MAGIC = b"YUV4MPEG2"

#: (y_scale_num, y_scale_den) of the chroma planes per supported colorspace
_CHROMA = {
    "C444": (1, 1),
    "C420": (1, 4),
    "C420jpeg": (1, 4),
    "C420paldv": (1, 4),
    "C420mpeg2": (1, 4),
}


@dataclass
class Y4MVideo:
    width: int
    height: int
    fps_num: int
    fps_den: int
    colorspace: str
    frames: list  # list of (y_plane: bytes, u_plane: bytes, v_plane: bytes)

    @property
    def n_frames(self) -> int:
        return len(self.frames)


def _plane_sizes(width: int, height: int, colorspace: str) -> tuple[int, int]:
    num, den = 1, 1
    cnum, cden = _CHROMA[colorspace]
    y = width * height * num // den
    if cden == 4 and (width % 2 or height % 2):
        raise ValueError(
            f"{colorspace} requires even dimensions, got {width}x{height}"
        )
    c = width * height * cnum // cden
    return y, c


def decode_y4m(data: bytes) -> Y4MVideo:
    """Parse a Y4M byte stream into per-frame planar YUV."""
    nl = data.find(b"\n")
    if nl == -1 or not data.startswith(MAGIC + b" "):
        raise ValueError("not a Y4M stream (bad magic)")
    width = height = None
    fps_num, fps_den = 30, 1
    colorspace = "C420"  # the spec's default when no C tag is present
    for tok in data[len(MAGIC) + 1 : nl].decode("ascii").split():
        if tok.startswith("W"):
            width = int(tok[1:])
        elif tok.startswith("H"):
            height = int(tok[1:])
        elif tok.startswith("F"):
            fps_num, fps_den = (int(x) for x in tok[1:].split(":"))
        elif tok.startswith("C"):
            if tok not in _CHROMA:
                raise ValueError(f"unsupported colorspace {tok}")
            colorspace = tok
        elif tok.startswith("I") and tok != "Ip":
            raise ValueError(f"interlaced streams not supported ({tok})")
        # A (aspect) and X (extension) tags carry no decode semantics
    if not width or not height:
        raise ValueError("missing W/H in stream header")
    if fps_den <= 0 or fps_num <= 0:
        raise ValueError("invalid frame rate")
    ysz, csz = _plane_sizes(width, height, colorspace)
    frame_bytes = ysz + 2 * csz

    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl == -1 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"expected FRAME marker at byte {pos}")
        body = data[fnl + 1 : fnl + 1 + frame_bytes]
        if len(body) != frame_bytes:
            raise ValueError(
                f"truncated frame {len(frames)}: {len(body)} of "
                f"{frame_bytes} bytes"
            )
        frames.append(
            (body[:ysz], body[ysz : ysz + csz], body[ysz + csz :])
        )
        pos = fnl + 1 + frame_bytes
    return Y4MVideo(width, height, fps_num, fps_den, colorspace, frames)


def encode_y4m(
    width: int,
    height: int,
    frames: list,
    fps: tuple = (30, 1),
    colorspace: str = "C444",
) -> bytes:
    """Encode (y, u, v) plane tuples as a canonical Y4M stream."""
    if colorspace not in _CHROMA:
        raise ValueError(f"unsupported colorspace {colorspace}")
    ysz, csz = _plane_sizes(width, height, colorspace)
    out = bytearray(
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 "
        f"{colorspace}\n".encode("ascii")
    )
    for i, (y, u, v) in enumerate(frames):
        if len(y) != ysz or len(u) != csz or len(v) != csz:
            raise ValueError(
                f"frame {i}: plane sizes ({len(y)},{len(u)},{len(v)}) != "
                f"({ysz},{csz},{csz}) for {colorspace} {width}x{height}"
            )
        out += b"FRAME\n" + bytes(y) + bytes(u) + bytes(v)
    return bytes(out)
