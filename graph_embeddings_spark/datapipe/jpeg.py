"""From-scratch baseline JPEG codec (pure numpy, no PIL/libjpeg).

Implements the ITU-T T.81 baseline sequential DCT process:

  encode_jpeg_gray8: 8-bit grayscale -> JFIF baseline JPEG. 8x8 blocks,
    level shift, orthonormal 2-D DCT-II, Annex-K luminance quantization
    scaled by the libjpeg-style quality knob, zigzag, DC-difference +
    AC run-length entropy coding with the Annex-K "typical" Huffman
    tables, 0xFF byte stuffing.
  decode_jpeg_gray: baseline JPEG -> (h, w) uint8 LUMA plane. Parses
    DQT/DHT/SOF0/DRI/SOS from the stream (no table assumptions), builds
    canonical Huffman decoders, entropy-decodes every component of the
    interleaved MCU stream (chroma blocks must be consumed to keep the
    bit position), but runs dequantize + IDCT only for component 0 —
    the image_features / resize paths consume intensity, and luma is
    stored at full resolution so no chroma upsampling is needed.

Scope (documented, checked, errors are loud): baseline sequential
(SOF0), single interleaved scan, 8-bit precision, restart markers
supported. Progressive (SOF2), arithmetic coding, hierarchical and
multi-scan files raise ValueError — they are different processes, not
a silently-wrong decode.

Used by datapipe/multimodal.py's image dispatch the same way bmp.py is:
`is_jpeg` sniffs the payload, the synthetic corpus emits genuine files
through the encoder, and tests check decode(encode(x)) error bounds
plus exact closed-form cases (constant blocks quantize losslessly).
Mirrors the reference's opaque-payload handling (it ships bytes to a
library; we ship bytes to a from-spec codec — the Spark plumbing is
identical either way).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# ITU-T T.81 Annex K.1 luminance quantization table (natural row order).
QTABLE_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

# Zigzag scan: ZIGZAG[k] = (row, col) of the k-th coefficient.
def _zigzag_order() -> np.ndarray:
    order = []
    for s in range(15):
        rng = range(s + 1)
        for i in rng if s % 2 else reversed(rng):
            r, c = i, s - i
            if r < 8 and c < 8:
                order.append(r * 8 + c)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()          # natural index of k-th zigzag element
UNZIGZAG = np.argsort(ZIGZAG)     # zigzag position of natural index

# Annex K.3 "typical" Huffman tables: (bits[1..16], values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 2-D DCT-II basis: X = D @ x @ D.T, x = D.T @ X @ D.
_K = np.arange(8)
_DCT = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * np.where(
    _K[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical Huffman assignment: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_table(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base quantization table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int64)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC value -> (category S, S-bit two's-like code per F.1.2.1)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def encode_jpeg_gray8(img: np.ndarray, quality: int = 90, restart_interval: int = 0) -> bytes:
    """8-bit grayscale (h, w) -> baseline JFIF JPEG bytes.

    Block math (DCT, quantization, zigzag) is vectorized over all blocks;
    the entropy loop is per-block Python, matching this module's use on
    small tiles inside Arrow-batched kernels. restart_interval > 0 emits
    a DRI segment and RSTn markers every N MCUs (one MCU = one block for
    grayscale), resetting the DC predictor — the error-resilience layout
    real encoders produce for large images."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2 or img.size == 0:
        raise ValueError("encode_jpeg_gray8 expects a non-empty (h, w) uint8 array")
    h, w = img.shape
    qt = _quality_table(QTABLE_LUMA, quality)

    # pad to 8x8 multiples by edge replication (standard practice)
    ph, pw = -h % 8, -w % 8
    padded = np.pad(img, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
    bh, bw = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)  # (bh, bw, 8, 8)
    coeffs = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
    quant = np.round(coeffs / qt).astype(np.int64)
    zz = quant.reshape(bh * bw, 64)[:, ZIGZAG]  # zigzag-ordered coefficients

    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)

    bw_ = _BitWriter()
    pred = 0
    for bi, blk in enumerate(zz):
        if restart_interval and bi and bi % restart_interval == 0:
            bw_.flush()
            bw_.out += struct.pack(">H", 0xFFD0 + (bi // restart_interval - 1) % 8)
            pred = 0
        s, extra = _magnitude(int(blk[0]) - pred)
        pred = int(blk[0])
        code, length = dc_codes[s]
        bw_.put(code, length)
        if s:
            bw_.put(extra, s)
        run = 0
        nz = np.flatnonzero(blk[1:])
        last = nz[-1] + 1 if nz.size else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                bw_.put(code, length)
                run -= 16
            s, extra = _magnitude(v)
            code, length = ac_codes[(run << 4) | s]
            bw_.put(code, length)
            bw_.put(extra, s)
            run = 0
        if last < 63:
            code, length = ac_codes[0x00]  # EOB
            bw_.put(code, length)
    bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xFFDB, bytes([0x00]) + bytes(qt.reshape(64)[ZIGZAG].astype(np.uint8)))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))  # SOF0
    out += seg(0xFFC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS: comp 1 uses DC0/AC0
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


def is_jpeg(payload: bytes) -> bool:
    return len(payload) > 3 and payload[0] == 0xFF and payload[1] == 0xD8 and payload[2] == 0xFF


class _HuffDecoder:
    """Canonical Huffman decoder: (min_code, max_code, first value index)
    per length — the T.81 F.2.2.3 DECODE procedure."""

    def __init__(self, bits: list[int], vals: bytes) -> None:
        self.vals = vals
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.val_ptr[length] = k
                self.min_code[length] = code
                code += n
                k += n
                self.max_code[length] = code - 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = br.bit()
        length = 1
        while code > self.max_code[length]:
            length += 1
            if length > 16:
                raise ValueError("corrupt JPEG: huffman code over 16 bits")
            code = (code << 1) | br.bit()
        return self.vals[self.val_ptr[length] + code - self.min_code[length]]


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("corrupt JPEG: bit stream ran out")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2  # stuffed literal 0xFF
                else:
                    # marker reached — per F.2.2.5 missing bits read as 0
                    # (padding past the segment; RST/EOI handled by caller)
                    return 0
            else:
                self.pos += 1
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = 0
        for _ in range(s):
            v = (v << 1) | self.bit()
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def align_to_marker(self) -> int:
        """Skip to the next marker (for RSTn); returns the marker byte."""
        self._n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = self.data[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        raise ValueError("corrupt JPEG: expected restart marker")


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w) uint8 luma plane.

    Every component of the interleaved scan is entropy-decoded (the bit
    stream can't be advanced otherwise); only component 0 is dequantized
    and inverse-transformed."""
    data = bytes(payload)
    if not is_jpeg(data):
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None  # (h, w, comps) where comps = [(cid, hs, vs, tq)]
    restart_interval = 0

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        end = pos + seglen
        if marker == 0xDB:  # DQT — possibly several tables per segment
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                o += 1
                if pq:  # 16-bit table
                    raw = np.frombuffer(seg[o : o + 128], dtype=">u2").astype(np.int64)
                    o += 128
                else:
                    raw = np.frombuffer(seg[o : o + 64], dtype=np.uint8).astype(np.int64)
                    o += 64
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = raw  # stream order is zigzag
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = seg[o + 17 : o + 17 + nv]
                (huff_ac if tc else huff_dc)[th] = _HuffDecoder(bits, vals)
                o += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline (extended seq.)
            prec, h, w, nf = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nf):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF marker 0xFF{marker:02X}); "
                "only baseline sequential is implemented"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            h, w, comps = frame
            ns = seg[0]
            if ns != len(comps):
                raise ValueError("multi-scan baseline JPEG not supported")
            scan = []  # per scan component: (comp index, dc table, ac table)
            for i in range(ns):
                cs, tda = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(k for k, c in enumerate(comps) if c[0] == cs)
                scan.append((ci, tda >> 4, tda & 0x0F))
            return _decode_scan(
                data, end, h, w, comps, scan, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        pos = end
    raise ValueError("corrupt JPEG: no scan data")


def _decode_scan(data, pos, h, w, comps, scan, qtables, huff_dc, huff_ac, restart):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    c0 = comps[0]
    # luma block grid (component 0): hs x vs blocks per MCU
    bw0, bh0 = mcux * c0[1], mcuy * c0[2]
    luma_zz = np.zeros((bh0 * bw0, 64), dtype=np.int64)

    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_index and mcu_index % restart == 0:
                m = br.align_to_marker()
                if not 0xD0 <= m <= 0xD7:
                    raise ValueError("corrupt JPEG: missing restart marker")
                preds = [0] * len(comps)
            for ci, tdc, tac in scan:
                _, hs, vs, _tq = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        blk = _decode_block(br, huff_dc[tdc], huff_ac[tac], preds, ci)
                        if ci == 0:
                            r, c = my * vs + by, mx * hs + bx
                            luma_zz[r * bw0 + c] = blk
            mcu_index += 1

    qt = qtables[c0[3]].reshape(64)
    coeffs = np.zeros((bh0 * bw0, 64), dtype=np.float64)
    coeffs[:, ZIGZAG] = luma_zz * qt[ZIGZAG]  # dequantize in natural order
    blocks = coeffs.reshape(bh0, bw0, 8, 8)
    pix = np.einsum("ji,abjk,kl->abil", _DCT, blocks, _DCT)  # inverse DCT
    img = pix.transpose(0, 2, 1, 3).reshape(bh0 * 8, bw0 * 8) + 128.0
    # component 0 spans ceil(h * vs/vmax) x ceil(w * hs/hmax) samples; for
    # the luma-at-full-resolution layouts (gray, 4:2:0, 4:4:4) that is (h, w)
    ch = -(-h * c0[2] // vmax)
    cw = -(-w * c0[1] // hmax)
    return np.clip(np.round(img[:ch, :cw]), 0, 255).astype(np.uint8)


def _decode_block(br, dc, ac, preds, ci):
    blk = np.zeros(64, dtype=np.int64)
    s = dc.decode(br)
    preds[ci] += br.receive_extend(s)
    blk[0] = preds[ci]
    k = 1
    while k < 64:
        rs = ac.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG: AC run past block end")
        blk[k] = br.receive_extend(s)
        k += 1
    return blk
