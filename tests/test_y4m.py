"""From-spec Y4M codec (datapipe/y4m.py) + the real multimodal video path."""

from __future__ import annotations

import numpy as np
import pytest

from graph_embeddings_spark.datapipe.y4m import decode_y4m_luma, encode_y4m_gray, is_y4m


@pytest.mark.parametrize("n,h,w", [(1, 2, 2), (3, 8, 8), (5, 4, 10), (2, 6, 2)])
def test_luma_roundtrip_exact(n, h, w):
    rng = np.random.default_rng(n * 100 + h * 10 + w)
    frames = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    payload = encode_y4m_gray(frames, fps=(30, 1))
    assert is_y4m(payload)
    got, (gw, gh, num, den) = decode_y4m_luma(payload)
    assert (gw, gh, num, den) == (w, h, 30, 1)
    assert np.array_equal(got, frames)


def test_mono_colorspace_decodes():
    frames = np.arange(2 * 4 * 4, dtype=np.uint8).reshape(2, 4, 4)
    payload = b"YUV4MPEG2 W4 H4 F25:1 Ip Cmono\n"
    payload += b"".join(b"FRAME\n" + f.tobytes() for f in frames)
    got, (w, h, _, _) = decode_y4m_luma(payload)
    assert (w, h) == (4, 4)
    assert np.array_equal(got, frames)


def test_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        decode_y4m_luma(b"definitely not yuv4mpeg2 content here")
    with pytest.raises(ValueError):
        encode_y4m_gray(np.zeros((1, 3, 4), dtype=np.uint8))  # odd height
    with pytest.raises(ValueError):
        decode_y4m_luma(b"YUV4MPEG2 W4 H4 C444\nFRAME\n" + b"\x00" * 48)
    with pytest.raises(ValueError):
        # truncated frame: header promises 4x4 C420 (24 bytes) but only 10 follow
        decode_y4m_luma(b"YUV4MPEG2 W4 H4 C420\nFRAME\n" + b"\x00" * 10)


def test_sample_frames_returns_real_luma(spark):
    """The driver-visible frame-sampling stage over REAL encoded bytes."""
    from graph_embeddings_spark.datapipe.multimodal import MEDIA_SCHEMA, sample_frames

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(7, 4, 6), dtype=np.uint8)
    payload = encode_y4m_gray(frames)
    rows = [(0, "video", bytearray(payload), {"width": 6, "height": 4, "sample_rate": 0, "n_frames": 7})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["frame_idx"]: bytes(r["frame"]) for r in sample_frames(media, every=3).collect()}
    assert sorted(got) == [0, 3, 6]
    for fi, blob in got.items():
        assert np.array_equal(np.frombuffer(blob, dtype=np.uint8).reshape(4, 6), frames[fi])


def test_synthetic_media_videos_are_real_y4m(spark):
    from graph_embeddings_spark.datapipe.multimodal import synthetic_media_df

    media = synthetic_media_df(spark, 12, partitions=2).collect()
    n_video = 0
    for r in media:
        if r["kind"] == "video":
            n_video += 1
            luma, (w, h, _, _) = decode_y4m_luma(bytes(r["payload"]))
            assert (w, h) == (r["meta"]["width"], r["meta"]["height"])
            assert luma.shape[0] == r["meta"]["n_frames"]
    assert n_video == 4
