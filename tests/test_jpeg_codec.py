"""Unit tests for the pure-Python baseline JPEG codec (sources/jpeg.py) —
the codec-level complement to the end-to-end mm_jpeg_pixel_stats oracle
query. Covers: exact coefficient roundtrip through the entropy layer
(JPEG's only lossy step is forward quantization, which the frequency-domain
encoder skips), byte-stuffing, ZRL/EOB paths, DC prediction across blocks,
the closed-form DC-only IDCT, clamping, 3-component color (interleaved
4:4:4 MCUs, per-component DC predictors, JFIF YCbCr->RGB), and the
unsupported-feature gates (progressive, subsampling, restart intervals
fail loudly, never silently wrong — the PNG codec's scope discipline)."""

from __future__ import annotations

import math
import random
import struct

import pytest

from datafusion_distributed_spark.sources.jpeg import (
    BASIS,
    ZIGZAG,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg_gray,
)

_Q = [20] + [8 + (k * 3) % 17 for k in range(1, 64)]


def _blk(dc=0, **ac):
    b = [0] * 64
    b[0] = dc
    for k, v in ac.items():
        b[int(k[1:])] = v
    return b


def test_coefficient_roundtrip_exact():
    blocks = [
        _blk(dc=-64, z1=3, z25=-2),
        _blk(dc=63, z5=-3, z20=2),
        _blk(dc=0),  # all-zero AC -> immediate EOB
    ]
    data = encode_jpeg_gray(24, 8, blocks, _Q)
    img = decode_jpeg(data)
    assert img.width == 24 and img.height == 8 and img.n_blocks == 3
    assert img.coeffs == blocks


def test_dc_only_block_is_flat_and_closed_form():
    dcq = 40
    img = decode_jpeg(encode_jpeg_gray(8, 8, [_blk(dc=dcq)], _Q))
    # DC-only IDCT: every sample = floor(dcq*q0 * B00^2 + 0.5) + 128.
    expected = int(math.floor(dcq * _Q[0] * BASIS[0][0] * BASIS[0][0] + 0.5)) + 128
    assert set(img.pixels) == {expected}


def test_clamping_both_ends():
    lo = decode_jpeg(encode_jpeg_gray(8, 8, [_blk(dc=-2000)], _Q))
    hi = decode_jpeg(encode_jpeg_gray(8, 8, [_blk(dc=2000)], _Q))
    assert set(lo.pixels) == {0}
    assert set(hi.pixels) == {255}


def test_zrl_long_zero_runs():
    # position 60 forces runs > 16 -> ZRL symbols on the wire
    blocks = [_blk(dc=5, z60=7), _blk(dc=5, z1=1, z63=-1)]
    img = decode_jpeg(encode_jpeg_gray(16, 8, blocks, _Q))
    assert img.coeffs == blocks


def test_byte_stuffing_roundtrip():
    # Sweep DC values until the entropy stream contains a stuffed 0xFF00,
    # then prove the decoder unstuffs it.
    # A single DC-only block can't align eight 1-bits (EOB interrupts the
    # run), so sweep random multi-block coefficient sets until the ENTROPY
    # segment contains a stuffed 0xFF00, then prove the decoder unstuffs it.
    rng = random.Random(1)
    found = 0
    for _ in range(300):
        blocks = []
        for _ in range(4):
            b = [0] * 64
            b[0] = rng.choice((1023, -1023, 511, 767))
            b[rng.randint(1, 10)] = rng.choice((255, -255, 127))
            blocks.append(b)
        data = encode_jpeg_gray(32, 8, blocks, _Q)
        sos = data.find(b"\xff\xda")
        entropy = data[sos + 10 : -2]
        if b"\xff\x00" in entropy:
            found += 1
            assert decode_jpeg(data).coeffs == blocks
    assert found > 0, "no trial produced a stuffed 0xFF - writer suspect"


def test_dc_prediction_across_blocks():
    # Large swings exercise several DC size categories and the differential.
    blocks = [_blk(dc=v) for v in (0, 1000, -1000, 3, -3, 512)]
    img = decode_jpeg(encode_jpeg_gray(48, 8, blocks, _Q))
    assert [b[0] for b in img.coeffs] == [0, 1000, -1000, 3, -3, 512]


def test_fuzz_roundtrip_random_coefficients():
    rng = random.Random(42)
    for _ in range(100):
        nb = rng.randint(1, 6)
        blocks = []
        for _ in range(nb):
            b = [0] * 64
            b[0] = rng.randint(-1023, 1023)
            for _ in range(rng.randint(0, 12)):
                b[rng.randint(1, 63)] = rng.randint(-255, 255)
            blocks.append(b)
        img = decode_jpeg(encode_jpeg_gray(8 * nb, 8, blocks, _Q))
        assert img.coeffs == blocks


def test_rejects_non_baseline_and_malformed():
    good = encode_jpeg_gray(8, 8, [_blk(dc=1)], _Q)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x00" + good[2:])  # missing SOI
    # SOF2 (progressive) must be rejected: patch the SOF0 marker byte.
    sof0 = good.find(b"\xff\xc0")
    progressive = good[:sof0 + 1] + b"\xc2" + good[sof0 + 2 :]
    with pytest.raises(NotImplementedError):
        decode_jpeg(progressive)
    # DRI (restart interval) is SUPPORTED since r11: an interval the
    # stream never reaches (8 > MCU count 1) decodes to identical pixels.
    dri = good[:2] + b"\xff\xdd" + struct.pack(">HH", 4, 8) + good[2:]
    assert decode_jpeg(dri).pixels == decode_jpeg(good).pixels


def test_canonical_code_generation_matches_annex_c():
    # The T.81 Annex K.3.1 luminance DC table: BITS/HUFFVAL -> known codes.
    bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    vals = list(range(12))
    codes = _canonical_codes(bits, vals)
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[11] == (0b111111110, 9)


def test_encoder_tables_never_use_all_ones_code():
    """T.81 C.2: the all-1-bits code of any length must stay unused (it
    would alias the 0xFF marker prefix after stuffing removal)."""
    data = encode_jpeg_gray(
        48, 16, [_blk(dc=i * 97 % 1000 - 500, z3=i % 5 - 2) for i in range(12)], _Q
    )
    pos = 2
    while pos < len(data) - 2:
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if marker == 0xC4:
            body = data[pos + 4 : pos + 2 + seglen]
            b = 0
            while b < len(body):
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                codes = _canonical_codes(bits, list(body[b + 17 : b + 17 + n]))
                for code, length in codes.values():
                    assert code != (1 << length) - 1
                b += 17 + n
        if marker == 0xDA:
            break
        pos += 2 + seglen


def test_color_roundtrip_and_rgb_conversion():
    """3-component 4:4:4: interleaved MCUs, separate DC predictors and
    luma/chroma table slots, JFIF YCbCr->RGB with floor(x+0.5)."""
    from datafusion_distributed_spark.sources.jpeg import (
        YCC_B_CB, YCC_G_CB, YCC_G_CR, YCC_R_CR, encode_jpeg_color,
    )

    qc = [22] + [9 + (k * 5) % 13 for k in range(1, 64)]
    mcus = [
        (_blk(dc=40), _blk(dc=-20, z3=2), _blk(dc=30)),
        (_blk(dc=-60, z5=-1), _blk(dc=10), _blk(dc=-10, z20=1)),
    ]
    img = decode_jpeg(encode_jpeg_color(16, 8, mcus, _Q, qc))
    assert img.channels == 3 and img.n_blocks == 2
    assert img.coeffs == [b for m in mcus for b in m]
    # DC-only first MCU: flat YCbCr -> one flat RGB triple over 64 pixels
    y = int(math.floor(40 * _Q[0] * BASIS[0][0] * BASIS[0][0] + 0.5)) + 128
    cr = int(math.floor(30 * qc[0] * BASIS[0][0] * BASIS[0][0] + 0.5)) + 128
    # Cb block has an AC term -> not flat; check a pixel where its basis
    # contribution is recomputed exactly below instead: use the R channel,
    # which depends only on Y and Cr (both DC-only in MCU 0).
    r = max(0, min(255, int(math.floor(y + YCC_R_CR * (cr - 128) + 0.5))))
    got_r = {img.pixels[(yy * 16 + xx) * 3] for yy in range(8) for xx in range(8)}
    assert got_r == {r}


def test_color_separate_dc_predictors():
    from datafusion_distributed_spark.sources.jpeg import encode_jpeg_color

    qc = [22] + [9 + (k * 5) % 13 for k in range(1, 64)]
    mcus = [
        (_blk(dc=100), _blk(dc=-100), _blk(dc=50)),
        (_blk(dc=100), _blk(dc=-100), _blk(dc=50)),  # zero diffs per comp
        (_blk(dc=0), _blk(dc=0), _blk(dc=0)),
    ]
    img = decode_jpeg(encode_jpeg_color(24, 8, mcus, _Q, qc))
    assert [b[0] for b in img.coeffs] == [100, -100, 50, 100, -100, 50, 0, 0, 0]


def test_color_rejects_unsupported_sampling_layouts():
    """4:4:4, 4:2:2 and 4:2:0 are in scope since r11; anything else
    (4:1:1 here) still rejects loudly."""
    from datafusion_distributed_spark.sources.jpeg import encode_jpeg_color

    qc = [22] + [9 + (k * 5) % 13 for k in range(1, 64)]
    data = bytearray(encode_jpeg_color(8, 8, [(_blk(dc=1), _blk(dc=1), _blk(dc=1))], _Q, qc))
    sof = bytes(data).find(b"\xff\xc0")
    data[sof + 11] = 0x41  # luma H=4, V=1 -> 4:1:1
    with pytest.raises(NotImplementedError, match="sampling layout"):
        decode_jpeg(bytes(data))


def test_subsampled_roundtrip_with_restarts():
    """4:2:0 + DRI/RSTn (r11): coefficients round-trip exactly through the
    entropy layer across restart boundaries; chroma upsamples by 2x2
    replication; a corrupted RSTn index fails loudly."""
    from datafusion_distributed_spark.sources.jpeg import (
        encode_jpeg_subsampled,
    )

    qc = [22] + [9 + (k * 5) % 13 for k in range(1, 64)]

    def mcu(b):
        ys = []
        for j in range(4):
            blk = [0] * 64
            blk[0] = (b * 11 + j * 17) % 160 - 80
            blk[1 + ((b + j) % 5)] = ((b + j) % 5) - 2
            ys.append(blk)
        cb = [0] * 64
        cb[0] = (b * 7) % 120 - 60
        cr = [0] * 64
        cr[0] = (b * 5) % 120 - 60
        return (ys, cb, cr)

    mcus = [mcu(b) for b in range(4)]  # 64x16: 3 restart boundaries
    data = encode_jpeg_subsampled(64, 16, mcus, _Q, qc, restart_interval=1)
    assert data.count(b"\xff\xd0") + data.count(b"\xff\xd1") + data.count(
        b"\xff\xd2"
    ) >= 3
    img = decode_jpeg(data)
    assert (img.width, img.height, img.channels, img.n_blocks) == (64, 16, 3, 4)
    flat = []
    for ys, cb, cr in mcus:
        flat.extend(ys + [cb, cr])
    assert img.coeffs == flat  # exact entropy roundtrip across restarts

    # chroma replication: DC-only chroma means each 2x2 pixel cell shares
    # its Cb/Cr, so R of the four pixels in a cell is identical when Y's
    # AC terms cancel at matching positions — check a flat MCU instead:
    flat_mcu = ([[0] * 64 for _ in range(4)], [0] * 64, [0] * 64)
    flat_img = decode_jpeg(
        encode_jpeg_subsampled(16, 16, [flat_mcu], _Q, qc, restart_interval=0)
    )
    assert len(set(flat_img.pixels)) <= 3  # one RGB triple everywhere

    # Wrong RSTn modulo index must fail loudly.
    i = data.find(b"\xff\xd0")
    corrupted = data[:i + 1] + b"\xd5" + data[i + 2 :]
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg(corrupted)


def test_422_subsampled_roundtrip():
    """4:2:2 (luma 2x1): the generalized MCU loop's horizontal-only
    upsample path, with restart markers."""
    from datafusion_distributed_spark.sources.jpeg import (
        encode_jpeg_subsampled,
    )

    qc = [22] + [9 + (k * 5) % 13 for k in range(1, 64)]

    def mcu(b):
        ys = []
        for j in range(2):
            blk = [0] * 64
            blk[0] = (b * 13 + j * 19) % 160 - 80
            blk[2 + ((b + j) % 4)] = ((b + j) % 5) - 2
            ys.append(blk)
        cb = [0] * 64
        cb[0] = (b * 7) % 120 - 60
        cr = [0] * 64
        cr[0] = (b * 5) % 120 - 60
        return (ys, cb, cr)

    mcus = [mcu(b) for b in range(6)]  # 48x16 = 3x2 MCUs of 16x8
    data = encode_jpeg_subsampled(
        48, 16, mcus, _Q, qc, restart_interval=2, factors=(2, 1)
    )
    img = decode_jpeg(data)
    assert (img.width, img.height, img.channels, img.n_blocks) == (48, 16, 3, 6)
    flat = []
    for ys, cb, cr in mcus:
        flat.extend(ys + [cb, cr])
    assert img.coeffs == flat
    # horizontal 2x replication: a flat MCU yields one RGB triple
    flat_img = decode_jpeg(
        encode_jpeg_subsampled(
            16, 8, [([[0] * 64] * 2, [0] * 64, [0] * 64)], _Q, qc,
            factors=(2, 1),
        )
    )
    assert len(set(flat_img.pixels)) <= 3
