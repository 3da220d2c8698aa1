"""Format-dispatching RDF reader — the JenaReader.read analog
(util/read/JenaReader.java:21-42: Jena autodetects the serialization from
the file name; here the extension does, with an explicit override).

    read_rdf(spark, "data/graph.ttl")            # autodetect -> turtle
    read_rdf(spark, "data/", fmt="ntriples")     # explicit

All formats share the triples(subj, pred, obj, obj_kind) contract, so every
downstream stage (materialize, canonicalize, BCA, GloVe) is source-agnostic.
HDT (the reference's native binary path, HDTManager.loadHDT at
JenaReader.java:28-31) is read by the from-scratch codec in sources/hdt.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_EXT_TO_FMT = {
    ".nt": "ntriples",
    ".nq": "ntriples",  # graph term ignored by the lite parser contract
    ".ttl": "turtle",
    ".trig": "turtle",  # TriG = Turtle + graph blocks, same parser
    ".rdf": "rdfxml",
    ".owl": "rdfxml",
    ".xml": "rdfxml",
    ".hdt": "hdt",
}


def detect_format(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext in _EXT_TO_FMT:
        return _EXT_TO_FMT[ext]
    raise ValueError(
        f"cannot autodetect RDF format of {path!r}; pass fmt= one of "
        "ntriples/turtle/rdfxml/hdt"
    )


def read_rdf(spark, path: str, fmt: str | None = None) -> DataFrame:
    fmt = fmt or detect_format(path)
    if fmt == "ntriples":
        from .ntriples import read_ntriples

        return read_ntriples(spark, path)
    if fmt == "turtle":
        from .turtle import read_turtle

        return read_turtle(spark, path)
    if fmt == "rdfxml":
        from .rdfxml import read_rdfxml

        return read_rdfxml(spark, path)
    if fmt == "hdt":
        from .hdt import read_hdt

        return read_hdt(spark, path)
    raise ValueError(f"unknown RDF format {fmt!r}")
