"""HDT binary codec tests (sources/hdt.py — JenaReader.java:28-31 parity).

The byte-level fixture in test_hand_assembled_fixture re-derives the HDT
layout independently of the writer (its own bit packing and section
assembly), so reader and writer cannot share a mirrored bug.
"""

import numpy as np
import pytest

from graph_embeddings_spark.sources.hdt import (
    CI_DICTIONARY,
    CI_GLOBAL,
    CI_HEADER,
    CI_TRIPLES,
    COOKIE,
    FMT_CONTAINER,
    FMT_DICT_FOUR,
    FMT_TRIPLES_BITMAP,
    _Buf,
    _pack_bits,
    _unpack_bits,
    crc8,
    crc16,
    crc32c,
    decode_hdt,
    encode_hdt,
    read_pfc,
    term_to_parts,
    vbyte,
    write_hdt,
    write_pfc,
)

TRIPLES = [
    ("http://ex/s", "http://ex/p", "hi", 2),
    ("http://ex/s", "http://ex/p", "http://ex/o", 0),
    ("http://ex/o", "http://ex/p", "mid", 2),  # ex/o: shared subject+object
    ("_:b0", "http://ex/q", "line\nbreak é", 2),
    ("http://ex/s", "http://ex/q", "_:b0", 1),
    ("http://ex/s", "http://ex/name", 'say "hi" twice', 2),
]


def test_vbyte_roundtrip():
    for v in (0, 1, 127, 128, 300, 2**20, 2**40 + 17):
        b = _Buf(vbyte(v))
        assert b.vbyte() == v
        assert b.pos == len(b.data)


def test_pack_bits_roundtrip():
    rng = np.random.default_rng(7)
    for numbits in (1, 7, 13, 33, 64):
        hi = 2**numbits if numbits < 64 else 2**63
        vals = rng.integers(0, hi, size=100, dtype=np.uint64)
        vals[0] = hi - 1  # force the top of the range
        data = _pack_bits(vals, numbits)
        assert len(data) == (100 * numbits + 7) // 8
        back = _unpack_bits(data, 100, numbits)
        assert (back == vals).all()


@pytest.mark.parametrize("n", [0, 1, 15, 16, 17, 40])
def test_pfc_roundtrip(n):
    strings = sorted(f"http://example.org/resource/{i:03d}".encode() for i in range(n))
    out = bytearray()
    write_pfc(out, strings, blocksize=16)
    assert read_pfc(_Buf(bytes(out))) == strings


def test_pfc_rejects_nul():
    with pytest.raises(ValueError, match="NUL"):
        write_pfc(bytearray(), [b"a\0b"])


def test_roundtrip_triples():
    data = encode_hdt(TRIPLES)
    assert sorted(decode_hdt(data)) == sorted(TRIPLES)


def test_roundtrip_duplicates_and_empty_literal():
    tr = [("http://a", "http://p", "", 2), ("http://a", "http://p", "", 2)]
    assert decode_hdt(encode_hdt(tr)) == tr


def test_roundtrip_small_blocksize():
    # blocksize 2 exercises front-coding across many blocks
    data = encode_hdt(TRIPLES, blocksize=2)
    assert sorted(decode_hdt(data)) == sorted(TRIPLES)


def test_term_to_parts_suffixed_literals():
    # third-party files carry datatype/lang suffixes; lexical form survives
    assert term_to_parts('"5"^^<http://www.w3.org/2001/XMLSchema#integer>') == ("5", 2)
    assert term_to_parts('"chat"@fr') == ("chat", 2)
    assert term_to_parts('"say "hi""') == ('say "hi"', 2)
    assert term_to_parts("_:b7") == ("_:b7", 1)
    assert term_to_parts("http://x") == ("http://x", 0)


# ------------------------------------------------ independent byte fixture

def _seq_bytes(values, numbits):
    """Independent SequenceLog64 assembly: LSB-first bit concatenation."""
    bitstream = []
    for v in values:
        bitstream += [(v >> k) & 1 for k in range(numbits)]
    data = bytearray((len(bitstream) + 7) // 8)
    for i, bit in enumerate(bitstream):
        data[i // 8] |= bit << (i % 8)
    header = bytes([1, numbits]) + vbyte(len(values))
    return header + bytes([crc8(header)]) + bytes(data) + crc32c(bytes(data)).to_bytes(4, "little")


def _bitmap_bytes(flags):
    data = bytearray((len(flags) + 7) // 8)
    for i, bit in enumerate(flags):
        data[i // 8] |= bit << (i % 8)
    header = bytes([1]) + vbyte(len(flags))
    return header + bytes([crc8(header)]) + bytes(data) + crc32c(bytes(data)).to_bytes(4, "little")


def _pfc_bytes(strings):
    # blocksize 16 with n <= 16: ONE block — head stored whole, rest front-coded
    packed = bytearray(strings[0] + b"\0")
    for prev, s in zip(strings, strings[1:]):
        k = 0
        while k < min(len(prev), len(s)) and prev[k] == s[k]:
            k += 1
        packed += vbyte(k) + s[k:] + b"\0"
    packed = bytes(packed)
    offsets = _seq_bytes([0, len(packed)], max(1, len(packed).bit_length()))
    header = bytes([2]) + vbyte(len(strings)) + vbyte(len(packed)) + vbyte(16)
    return header + bytes([crc8(header)]) + offsets + packed + crc32c(packed).to_bytes(4, "little")


def _ci_bytes(ci_type, fmt, props):
    body = COOKIE + bytes([ci_type]) + fmt.encode() + b"\0" + props.encode() + b"\0"
    return body + crc16(body).to_bytes(2, "little")


def test_hand_assembled_fixture():
    """3 triples over shared/subject-only/object-only dictionaries with a
    typed literal, assembled byte-by-byte from the documented layout."""
    header_nt = b"<file:///f> <http://p> \"x\" .\n"
    blob = (
        _ci_bytes(CI_GLOBAL, FMT_CONTAINER, "")
        + _ci_bytes(CI_HEADER, "ntriples", f"length={len(header_nt)};")
        + header_nt
        + _ci_bytes(CI_DICTIONARY, FMT_DICT_FOUR, "mapping=1;")
        + _pfc_bytes([b"http://ex/o"])  # shared
        + _pfc_bytes([b"http://ex/s"])  # subject-only
        + _pfc_bytes([b"http://ex/p"])  # predicates
        + _pfc_bytes(  # object-only, byte-sorted: '"5"^^...' < '"hi"'
            [b'"5"^^<http://www.w3.org/2001/XMLSchema#integer>', b'"hi"']
        )
        + _ci_bytes(CI_TRIPLES, FMT_TRIPLES_BITMAP, "order=1;numTriples=3;")
        # id triples sorted: (1,1,2) (2,1,1) (2,1,3)
        + _bitmap_bytes([1, 1])  # bitY: each subject has one predicate
        + _bitmap_bytes([1, 0, 1])  # bitZ: subject 2 has two objects under p
        + _seq_bytes([1, 1], 1)  # seqY
        + _seq_bytes([2, 1, 3], 2)  # seqZ
    )
    assert sorted(decode_hdt(blob)) == sorted(
        [
            ("http://ex/o", "http://ex/p", "5", 2),
            ("http://ex/s", "http://ex/p", "http://ex/o", 0),
            ("http://ex/s", "http://ex/p", "hi", 2),
        ]
    )


def test_crc_corruption_detected():
    data = bytearray(encode_hdt(TRIPLES))
    # flip a byte inside the packed dictionary text (a PFC block head —
    # front-coded followers are not stored contiguously)
    idx = data.index(b"http://ex/name") + 3
    data[idx] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_hdt(bytes(data))


def test_truncation_detected():
    data = encode_hdt(TRIPLES)
    with pytest.raises(ValueError):
        decode_hdt(data[: len(data) - 5])


def test_not_hdt_rejected():
    with pytest.raises(ValueError, match="cookie|truncated"):
        decode_hdt(b"PK\x03\x04 definitely a zip")


def test_read_rdf_hdt_dispatch(spark, tmp_path):
    from graph_embeddings_spark.sources.reader import read_rdf

    path = str(tmp_path / "g.hdt")
    write_hdt(TRIPLES, path)
    rows = read_rdf(spark, path).collect()
    got = sorted((r["subj"], r["pred"], r["obj"], r["obj_kind"]) for r in rows)
    assert got == sorted(TRIPLES)


def test_non_spo_order_rejected():
    """A structurally valid file whose triples section declares a non-SPO
    component order must fail loudly — decoding it as SPO would scramble
    subject/object roles with every CRC green. (The order check fires
    before the bitmaps are read, so the fixture stops at the triples CI.)"""
    blob = (
        _ci_bytes(CI_GLOBAL, FMT_CONTAINER, "")
        + _ci_bytes(CI_HEADER, "ntriples", "length=0;")
        + _ci_bytes(CI_DICTIONARY, FMT_DICT_FOUR, "mapping=1;")
        + _pfc_bytes([b"http://ex/o"])
        + _pfc_bytes([b"http://ex/s"])
        + _pfc_bytes([b"http://ex/p"])
        + _pfc_bytes([b'"hi"'])
        + _ci_bytes(CI_TRIPLES, FMT_TRIPLES_BITMAP, "order=4;numTriples=1;")
    )
    with pytest.raises(ValueError, match="order"):
        decode_hdt(blob)
