"""Minimal from-spec Y4M (YUV4MPEG2) codec, 4:2:0 and mono.

The sandbox ships no video libraries, but YUV4MPEG2 is a deliberately
trivial public container — an ASCII stream header, then per-frame `FRAME`
markers followed by raw planar YCbCr — which makes the video path of
datapipe/multimodal.py a REAL decode instead of a declared stub.
Supported colorspaces: C420 family (C420, C420jpeg, C420mpeg2, C420paldv —
identical plane layout, differing only in chroma siting which a luma
consumer ignores) and Cmono. `decode_y4m_luma` returns the (n_frames, h, w)
uint8 luma planes plus (w, h, fps_num, fps_den); the encoder produces
canonical C420 files that round-trip the luma exactly.

Not supported (raises ValueError, never silently misdecodes): C422/C444,
interlacing other than progressive, frame-level parameter overrides.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def encode_y4m_gray(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n, h, w) uint8 luma -> C420 Y4M with neutral (128) chroma planes.
    Dimensions must be even (4:2:0 chroma is half-resolution)."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even dimensions")
    header = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420\n" % (w, h, fps[0], fps[1])
    chroma = b"\x80" * ((w // 2) * (h // 2) * 2)
    out = [header]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
        out.append(chroma)
    return b"".join(out)


def is_y4m(payload: bytes) -> bool:
    return len(payload) > len(_MAGIC) and payload[: len(_MAGIC)] == _MAGIC


def decode_y4m_luma(payload: bytes) -> tuple[np.ndarray, tuple[int, int, int, int]]:
    """Y4M bytes -> ((n_frames, h, w) uint8 luma, (w, h, fps_num, fps_den))."""
    if not is_y4m(payload):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = 0
    fps_num, fps_den = 25, 1
    cspace = b"C420"
    for tok in payload[len(_MAGIC) : nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps_num, fps_den = int(num), int(den)
        elif tok[:1] == b"C":
            cspace = tok
        elif tok[:1] == b"I" and tok not in (b"Ip",):
            raise ValueError(f"unsupported interlacing {tok!r}")
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    if cspace.startswith(b"C420"):
        frame_size = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
    elif cspace == b"Cmono":
        frame_size = w * h
    else:
        raise ValueError(f"unsupported colorspace {cspace!r}")
    buf = np.frombuffer(payload, dtype=np.uint8)
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME marker")
        pos = fnl + 1
        if pos + frame_size > len(payload):
            raise ValueError("truncated frame data")
        frames.append(buf[pos : pos + w * h].reshape(h, w))
        pos += frame_size
    if not frames:
        return np.zeros((0, h, w), dtype=np.uint8), (w, h, fps_num, fps_den)
    return np.stack(frames), (w, h, fps_num, fps_den)
