"""Output filtering + TSV formats (EmbeddingTextWriter semantics F2/F3/S3)."""

from __future__ import annotations

from graph_embeddings_spark.config import BLANK, LITERAL, URI, OutputConfig
from graph_embeddings_spark.output import dict_tsv_lines, filter_embeddings, vectors_tsv_lines


def _emb(spark):
    rows = [
        (0, "http://a/x", URI, [0.5, -0.25]),
        (1, "http://b/y", URI, [1.0, 2.0]),
        (2, "_:b0", BLANK, [0.0, 0.1]),
        (3, "some literal", LITERAL, [0.25, 0.5]),
    ]
    return spark.createDataFrame(
        rows, "node_id long, label string, node_type tinyint, vec array<float>"
    )


def test_type_filter(spark):
    out = OutputConfig(uri=[], blank=None, literal=None)  # only URIs
    got = filter_embeddings(_emb(spark), out)
    assert {r["node_id"] for r in got.collect()} == {0, 1}


def test_prefix_filter_any_match(spark):
    """F3: keep keys matching ANY configured prefix; [] keeps all of type."""
    out = OutputConfig(uri=["http://a/"], literal=[])
    got = {r["node_id"] for r in filter_embeddings(_emb(spark), out).collect()}
    assert got == {0, 3}


def test_vectors_tsv_format(spark):
    """%11.6E floats, tab-joined (EmbeddingTextWriter.java:133-136)."""
    df = _emb(spark).filter("node_id = 0")
    line = vectors_tsv_lines(df).collect()[0]["line"]
    assert line == "5.000000E-01\t-2.500000E-01"


def test_dict_tsv_format(spark):
    df = _emb(spark).filter("node_id = 3")
    line = dict_tsv_lines(df).collect()[0]["line"]
    assert line == "some literal\tLITERAL"


def test_dict_tsv_strips_tabs(spark):
    df = spark.createDataFrame(
        [(9, "bad\tkey\nhere", URI, [0.0])],
        "node_id long, label string, node_type tinyint, vec array<float>",
    )
    line = dict_tsv_lines(df).collect()[0]["line"]
    assert "\n" not in line and line.count("\t") == 1
