"""Minimal from-spec WAV codec (RIFF/WAVE, PCM only).

The sandbox ships no audio libraries, but canonical PCM WAV is simple
enough to implement from the public RIFF format description, which makes
the audio path of datapipe/multimodal.py a REAL decode instead of a
declared stub: 8-bit unsigned and 16-bit signed little-endian PCM, mono or
multi-channel, chunk-walked (fmt / data located by id, unknown chunks
skipped per spec — so files with LIST/INFO metadata still decode).

`decode_wav` returns ((n_samples, n_channels) int16 array, sample_rate);
8-bit input is widened to int16 ((x - 128) << 8) — deterministic, no
floats. The encoder exists so tests and the synthetic media corpus can
produce genuine files that round-trip exactly.

Not supported (raises ValueError, never silently misdecodes): IEEE-float,
A-law/mu-law, ADPCM, extensible PCM with mismatched bit depth, 24/32-bit.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_EXTENSIBLE = 0xFFFE


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, ch) int16 -> canonical 44-byte-header PCM WAV."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.tobytes()  # interleaved frames: row-major is frame-major
    block = 2 * ch
    fmt = struct.pack("<HHIIHH", _PCM, ch, sample_rate, sample_rate * block, block, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:  # RIFF chunks are word-aligned
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def is_wav(payload: bytes) -> bool:
    return len(payload) >= 44 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> ((n_samples, n_channels) int16, sample_rate)."""
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    end = min(end, len(payload))
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            fmt = payload[pos + 8 : pos + 8 + size]
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, rate, _brate, block, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == _EXTENSIBLE and len(fmt) >= 26:
        # cbSize(2) + validBits(2) + mask(4) + subformat GUID: first 2 bytes
        # carry the real format tag
        tag = struct.unpack_from("<H", fmt, 24)[0]
    if tag != _PCM:
        raise ValueError(f"unsupported WAV format tag {tag}")
    if ch < 1 or bits not in (8, 16) or block != ch * (bits // 8):
        raise ValueError(f"unsupported WAV layout (ch={ch}, bits={bits}, block={block})")
    n = len(data) // block
    if bits == 8:
        raw = np.frombuffer(data, dtype=np.uint8, count=n * ch).reshape(n, ch)
        return ((raw.astype(np.int16) - 128) << 8), rate
    raw = np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch)
    return raw.astype(np.int16), rate
