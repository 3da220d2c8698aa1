"""Deterministic HTML -> text extraction (trafilatura-equivalent contract).

New surface required by the graft (the reference pipeline starts at RDF —
JenaReader.java:21-42); the binding contract is BASELINE.json input_hint:
*byte-identical extracted text per url*, which only a fully deterministic
pure function can guarantee. Rules:

  1. decode UTF-8 strictly; undecodable bytes -> ''  (malformed pages);
  2. drop <script> <style> <nav> <header) <aside> <footer> <title> blocks;
  3. keep <h1>..</h1> and <p>..</p> block contents in document order;
  4. strip residual inline tags, HTML-unescape, strip() each block,
     drop empties;
  5. join blocks with '\n'.

Runs as an Arrow-batched pandas UDF (no per-row Python at the Spark layer) —
the hot loop is a compiled-regex scan per document, the idiom the reference's
single-threaded Jena parse maps to at 10^12-document scale.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_DROP_BLOCKS = re.compile(
    r"<(script|style|nav|header|aside|footer|title)\b[^>]*>.*?</\1>",
    re.IGNORECASE | re.DOTALL,
)
_KEEP_BLOCKS = re.compile(r"<(h1|p)\b[^>]*>(.*?)</\1>", re.IGNORECASE | re.DOTALL)
_INLINE_TAGS = re.compile(r"<[^>]+>")


def extract_text(html_bytes) -> str:
    """Pure function; the unit of the byte-parity golden test."""
    if html_bytes is None:
        return ""
    try:
        doc = bytes(html_bytes).decode("utf-8", errors="strict")
    except (UnicodeDecodeError, TypeError):
        return ""
    doc = _DROP_BLOCKS.sub("", doc)
    blocks = []
    for _tag, content in _KEEP_BLOCKS.findall(doc):
        content = _INLINE_TAGS.sub("", content)
        content = _html.unescape(content).strip()
        if content:
            blocks.append(content)
    return "\n".join(blocks)


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


def with_extracted_text(
    pages_df,
    html_col: str = "html",
    out_col: str = "extracted_text",
    min_parallelism: int | None = None,
):
    """pages(url, warc_ts, html, ...) -> + out_col string.

    min_parallelism (None -> defaultParallelism, 0 -> off) re-spreads the
    rows before the CPU-bound extraction UDF — AQE coalesces post-shuffle
    partitions by BYTES, which under-parallelizes Python-heavy stages
    (see extract.triples.extract_surface_triples)."""
    if min_parallelism is None:
        min_parallelism = pages_df.sparkSession.sparkContext.defaultParallelism
    if min_parallelism:
        pages_df = pages_df.repartition(min_parallelism)
    return pages_df.withColumn(out_col, extract_text_udf(F.col(html_col)))


def latest_pages(pages_df, target_partitions: int | None = None):
    """Keep the newest warc_ts row per url (FIXTURES.md §1 'latest wins').

    max_by avoids a window sort; ties broken deterministically by html bytes
    via the struct ordering on (warc_ts, html).

    target_partitions sets the dedup shuffle's OWN partition count via an
    explicit hash-repartition on url that the groupBy then reuses (Catalyst
    elides the second exchange) — the downstream CPU-bound extraction UDFs
    inherit this partitioning, so the whole extraction tier costs exactly
    ONE shuffle of the html corpus. Without it, AQE coalesces the tiny
    compressed shuffle down to 1-2 partitions and the Python stages
    serialize (see extract_surface_triples.min_parallelism).
    """
    if target_partitions:
        pages_df = pages_df.repartition(target_partitions, "url")
    return (
        pages_df.groupBy("url")
        .agg(F.max(F.struct("warc_ts", "html", "text", "lang")).alias("m"))
        .select("url", "m.warc_ts", "m.html", "m.text", "m.lang")
    )


def latest_texts(texted_df, target_partitions: int | None = None):
    """Latest-wins per url AFTER extraction (url, warc_ts, text, lang).

    Ordering the tier as extract -> dedup (instead of dedup -> extract)
    makes the tier's one shuffle move ~300 B of extracted text per page
    instead of multi-KB html — the shuffle, not the regex scan, is the
    extraction tier's wall-clock floor once the scan is trie-optimized.
    The ~1% duplicate pages are extracted twice (extraction is pure, so
    the result is identical); ties on warc_ts break deterministically by
    (text, lang)."""
    if target_partitions:
        texted_df = texted_df.repartition(target_partitions, "url")
    return (
        texted_df.groupBy("url")
        .agg(F.max(F.struct("warc_ts", "text", "lang")).alias("m"))
        .select("url", "m.warc_ts", "m.text", "m.lang")
    )
