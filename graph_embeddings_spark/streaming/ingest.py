"""Structured-Streaming ingestion: web pages arriving incrementally ->
streaming triple extraction -> append sink.

The reference is batch-only (the whole RDF file is materialized in heap,
util/read/JenaReader.java:33-35 — SURVEY.md §2.9). This module is the
Spark-native incremental path the 10^12-doc setting actually needs: a
Common-Crawl-style corpus lands in waves, and everything up to the graph
seam (text extraction, mention detection, triple extraction + linking) is
per-row/pure, so it streams trivially; the graph/BCA/GloVe stages stay
periodic batch jobs over the accumulated triples table (the classic
lambda split at the CoOccurrenceMatrix seam, SURVEY.md §3.2).

Late data: `warc_ts` watermarking + per-url latest-wins dedup is applied
DOWNSTREAM at the batch seam (latest_pages) — in-stream dropDuplicates
on url would need unbounded state at corpus scale; the append-only triples
table plus batch dedup is the scalable contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..corpus import WEB_PAGES_SCHEMA
from ..extract.text import extract_text_udf
from ..extract.triples import extract_surface_triples


def read_page_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Parquet-file stream of web pages (each dropped file = one wave)."""
    return (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def streaming_triples(
    pages_stream: DataFrame,
    aliases: list[str],
    watermark: str = "1 hour",
) -> DataFrame:
    """pages stream -> surface-triples stream.

    Stateless per-batch transforms only (extraction UDF + mapInPandas), so
    the stream needs no shuffle state; the watermark bounds any downstream
    stateful consumer a caller may attach."""
    texted = (
        pages_stream.withWatermark("warc_ts", watermark)
        .withColumn("text", extract_text_udf(F.col("html")))
        .select("url", "warc_ts", "text")
    )
    # min_parallelism=0: never repartition inside a stream (adds a shuffle
    # per micro-batch; micro-batches are already file-partitioned).
    # ts_col: every appended triple keeps its page's warc_ts — without it
    # the sink's rows from a re-crawl are indistinguishable from the
    # original's and the promised downstream latest-wins dedup is impossible
    return extract_surface_triples(texted, aliases, min_parallelism=0, ts_col="warc_ts")


def start_triples_sink(
    surface_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = False,
):
    """Append the surface-triple stream to parquet with exactly-once file
    semantics (the streaming checkpoint IS the lineage record for resume —
    north_rule's resumability at the ingestion tier).

    Schema migration note: sinks written before the warc_ts column was
    added hold 5-column files; resuming such a sink appends 6-column
    files into the same directory. Batch readers of a mixed directory
    must pass .option("mergeSchema", "true") (pre-upgrade rows then read
    warc_ts = NULL and are exempt from latest-wins dedup) or backfill the
    old files once."""
    writer = (
        surface_stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
