"""Text extraction: byte-identical per url (BASELINE.json input_hint gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_embeddings_spark.corpus import render_page, web_pages_df
from graph_embeddings_spark.extract.text import extract_text, latest_pages, with_extracted_text


def test_extract_pure_function(world):
    for pid in range(120):
        _url, _ts, html, text, _lang = render_page(world, pid)
        assert extract_text(html) == text, f"byte parity failed for page {pid}"


def test_extract_handles_garbage():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"\xff\xfe\x00garbage") == ""
    assert extract_text(b"<html><body><div>no blocks</div></body></html>") == ""


def test_extract_strips_boilerplate_and_unescapes():
    html = (
        b"<html><head><title>T</title><script>var x=1;</script></head>"
        b"<body><nav><a href='/'>Home</a></nav><h1>A &amp; B</h1>"
        b"<p>one <b>two</b></p><footer>foot</footer></body></html>"
    )
    assert extract_text(html) == "A & B\none two"


def test_extract_udf_byte_parity(spark, world):
    pages = web_pages_df(spark, world, 150, partitions=3)
    got = with_extracted_text(pages)
    bad = got.filter(F.col("extracted_text") != F.col("text")).count()
    assert bad == 0


def test_latest_pages_dedup(spark, world):
    # first dup page under seed 42 is page_id 318; 400 pages guarantees dups
    pages = web_pages_df(spark, world, 400, partitions=4)
    total, dedup = pages.count(), latest_pages(pages).count()
    assert dedup < total  # some dup urls existed
    latest = latest_pages(pages)
    assert latest.groupBy("url").count().filter("count > 1").count() == 0
    # latest row kept, not the older variant
    joined = (
        pages.groupBy("url").agg(F.max("warc_ts").alias("mx")).join(latest, "url")
    )
    assert joined.filter(F.col("mx") != F.col("warc_ts")).count() == 0
