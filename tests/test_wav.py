"""From-spec PCM WAV codec (datapipe/wav.py) + the real multimodal audio path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from graph_embeddings_spark.datapipe.wav import decode_wav, encode_wav_pcm16, is_wav


@pytest.mark.parametrize("n,ch", [(1, 1), (64, 1), (63, 1), (100, 2), (7, 3)])
def test_pcm16_roundtrip_exact(n, ch):
    rng = np.random.default_rng(n * 10 + ch)
    samples = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    payload = encode_wav_pcm16(samples, 16000)
    assert is_wav(payload)
    got, rate = decode_wav(payload)
    assert rate == 16000
    assert np.array_equal(got, samples)


def test_mono_1d_input_roundtrips_as_one_channel():
    samples = np.array([0, 100, -100, 32767, -32768], dtype=np.int16)
    got, rate = decode_wav(encode_wav_pcm16(samples, 8000))
    assert rate == 8000
    assert got.shape == (5, 1)
    assert np.array_equal(got[:, 0], samples)


def test_unknown_chunks_are_skipped():
    """Files with LIST/INFO metadata between fmt and data still decode —
    the chunk walk skips ids it doesn't know, honoring word alignment."""
    samples = np.arange(-10, 10, dtype=np.int16)
    payload = encode_wav_pcm16(samples, 44100)
    # splice an odd-sized LIST chunk right after the fmt chunk (ends at 36)
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad to even
    spliced = payload[:36] + junk + payload[36:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    got, rate = decode_wav(spliced)
    assert rate == 44100
    assert np.array_equal(got[:, 0], samples)


def test_pcm8_widens_to_int16():
    # hand-build an 8-bit mono file: header mirrors the encoder's, bits=8
    raw = bytes([0, 128, 255, 64])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    got, rate = decode_wav(payload)
    assert rate == 8000
    assert np.array_equal(got[:, 0], (np.array([0, 128, 255, 64], dtype=np.int16) - 128) << 8)


def test_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all, definitely not a riff file ok")
    payload = bytearray(encode_wav_pcm16(np.zeros(16, dtype=np.int16), 16000))
    payload[20] = 3  # IEEE float tag
    with pytest.raises(ValueError):
        decode_wav(bytes(payload))


def test_audio_features_pure_tone_band(spark):
    """The driver-visible feature stage over REAL encoded bytes: a pure
    mid-band sine's FFT energy must land in the expected band, and rms/zcr
    must match closed-form values."""
    from graph_embeddings_spark.datapipe.multimodal import MEDIA_SCHEMA, audio_features

    n, rate = 512, 16000
    t = np.arange(n)
    # bin 144 of 256 rfft bins (after DC drop: index 143) -> band 4 of 8
    tone = (16000.0 * np.sin(2 * np.pi * 144 * t / n)).astype(np.int16)
    payload = encode_wav_pcm16(tone, rate)
    rows = [(0, "audio", bytearray(payload), {"width": 0, "height": 0, "sample_rate": rate, "n_frames": 1})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = audio_features(media, n_bands=8).collect()
    assert len(got) == 1
    feat = np.array(got[0]["feat"])
    assert feat.shape == (10,)
    rms_want = np.sqrt(np.mean(tone.astype(np.float64) ** 2)) / 32768.0
    assert abs(feat[0] - rms_want) < 1e-5
    assert 0.0 < feat[1] < 1.0  # a sine crosses zero regularly
    assert feat[2 + 4] > 0.95  # 255 rfft mags (DC dropped), idx 143 -> band 4
    assert abs(feat[2:].sum() - 1.0) < 1e-5


def test_synthetic_media_audio_are_real_wavs(spark):
    from graph_embeddings_spark.datapipe.multimodal import synthetic_media_df

    media = synthetic_media_df(spark, 12, partitions=2).collect()
    n_audio = 0
    for r in media:
        if r["kind"] == "audio":
            n_audio += 1
            samples, rate = decode_wav(bytes(r["payload"]))
            assert rate == r["meta"]["sample_rate"] == 16000
            assert samples.shape[1] == 1 and samples.shape[0] >= 256
    assert n_audio == 4
