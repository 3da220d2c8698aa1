"""From-scratch baseline JPEG codec (datapipe/jpeg.py).

The reference treats compressed media as opaque library-decoded payloads;
here the codec itself is from-spec (ITU-T T.81 baseline sequential), so
these tests pin the spec behaviors: canonical Huffman assignment, zigzag
involution, quality-scaled quantization, byte stuffing, restart markers,
lossless constant blocks, bounded round-trip error, and loud failures on
unsupported processes.
"""

from __future__ import annotations

import numpy as np
import pytest

from graph_embeddings_spark.datapipe.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    QTABLE_LUMA,
    UNZIGZAG,
    ZIGZAG,
    _canonical_codes,
    _quality_table,
    decode_jpeg_gray,
    encode_jpeg_gray8,
    is_jpeg,
)


def _roundtrip(img: np.ndarray, **kw) -> np.ndarray:
    return decode_jpeg_gray(encode_jpeg_gray8(img, **kw))


def test_zigzag_is_a_permutation_and_involution():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert np.array_equal(ZIGZAG[UNZIGZAG], np.arange(64))
    # spec spot checks: zigzag order starts (0,0),(0,1),(1,0),(2,0),(1,1),(0,2)
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_annex_k_table_shapes():
    assert sum(DC_LUMA_BITS) == 12
    assert sum(AC_LUMA_BITS) == len(AC_LUMA_VALS) == 162
    codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    # canonical property: codes of each length are consecutive, and the
    # whole set is prefix-free
    by_len: dict[int, list[int]] = {}
    for code, length in codes.values():
        by_len.setdefault(length, []).append(code)
    for length, cs in by_len.items():
        cs.sort()
        assert cs == list(range(cs[0], cs[0] + len(cs)))
    as_bits = {format(c, f"0{l}b") for c, l in codes.values()}
    assert len(as_bits) == len(codes)
    for a in as_bits:
        for b in as_bits:
            assert a == b or not b.startswith(a)
    # EOB (0x00) gets the 4-bit code per Annex K.3.2
    assert codes[0x00][1] == 4


def test_quality_table_scaling():
    assert np.array_equal(_quality_table(QTABLE_LUMA, 50), QTABLE_LUMA)
    assert (_quality_table(QTABLE_LUMA, 100) == 1).all()  # scale 0 -> clamp 1
    assert (_quality_table(QTABLE_LUMA, 10) >= QTABLE_LUMA).all()
    assert (_quality_table(QTABLE_LUMA, 90) <= QTABLE_LUMA).all()


def test_constant_image_roundtrips_exactly():
    # a constant block is pure DC; DC quantizes/dequantizes losslessly when
    # the level-shifted value is a multiple of the DC step after rounding
    img = np.full((16, 24), 130, dtype=np.uint8)
    out = _roundtrip(img, quality=90)
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_smooth_gradient_tight_error():
    y, x = np.mgrid[0:32, 0:40]
    img = ((3 * x + 2 * y) % 256).astype(np.uint8)
    out = _roundtrip(img, quality=95)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_noise_bounded_error_and_odd_dims():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 17), dtype=np.uint8)  # not multiples of 8
    out = _roundtrip(img, quality=90)
    assert out.shape == img.shape
    err = np.abs(out.astype(float) - img.astype(float))
    assert err.max() <= 40  # DCT on white noise: coarse bound
    assert err.mean() <= 6.0
    # quality 100 (all-ones quant table): near-lossless
    out100 = _roundtrip(img, quality=100)
    assert int(np.abs(out100.astype(int) - img.astype(int)).max()) <= 2


def test_restart_markers_decode_identically():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 64), dtype=np.uint8)
    base = _roundtrip(img, quality=92)
    for ri in (1, 3, 7):
        enc = encode_jpeg_gray8(img, quality=92, restart_interval=ri)
        assert b"\xff\xdd" in enc  # DRI segment present
        assert np.array_equal(decode_jpeg_gray(enc), base)


def test_byte_stuffing_roundtrip():
    # hunt a payload that actually contains stuffed 0xFF00 in the entropy
    # segment, then prove it decodes
    for seed in range(40):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        enc = encode_jpeg_gray8(img, quality=85)
        body = enc[2:-2]
        if b"\xff\x00" in body:
            decode_jpeg_gray(enc)  # must not raise
            return
    pytest.skip("no stuffed byte produced in 40 seeds (unlikely)")


def test_is_jpeg_sniff():
    img = np.full((8, 8), 7, dtype=np.uint8)
    assert is_jpeg(encode_jpeg_gray8(img))
    assert not is_jpeg(b"BM\x00\x00")
    assert not is_jpeg(b"")
    assert not is_jpeg(b"\xff\xd8")  # too short


def test_unsupported_processes_raise():
    img = np.full((8, 8), 7, dtype=np.uint8)
    enc = bytearray(encode_jpeg_gray8(img))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_gray(bytes(enc))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_gray(b"plainly not a jpeg")


def test_truncated_stream_raises():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    enc = encode_jpeg_gray8(img, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg_gray(enc[: len(enc) // 2])


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_jpeg_gray8(np.zeros((0, 0), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg_gray8(np.zeros((4, 4, 3), dtype=np.uint8))


def test_multimodal_dispatch_uses_jpeg_codec():
    from graph_embeddings_spark.datapipe.multimodal import _decode_image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 12), dtype=np.uint8)
    out = _decode_image(encode_jpeg_gray8(img, quality=95), 12, 8)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 40
