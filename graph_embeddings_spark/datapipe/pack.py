"""Sequence packing for pretraining: concat-and-chunk assignment.

GPT-style pretraining packs the corpus into fixed-size token windows by
concatenating all documents in some order and slicing every `capacity`
tokens (documents straddle window boundaries). The expensive part at
100 TB is ASSIGNING each document its position in that virtual stream —
which is one deterministic global ordering plus a prefix sum, both plain
SQL/window constructs (no sequential greedy loop, unlike first-fit bin
packing which cannot be expressed as a prefix scan).

`pack_assignments` emits, per document: its token count, its start offset
in the concatenated stream, and the first/last chunk indices it lands in.
The ordering key is the same two-stage multiplicative id-hash as
datapipe/sample.py — a seeded, engine-reproducible permutation, so the
DuckDB oracle reproduces the assignment bit-for-bit and re-runs at any
parallelism agree.

Scale note: the window over a single global ordering is ONE range
partition (Spark sorts by the hash key, then a running sum). For 10^12
docs use the standard two-pass distributed prefix sum (per-partition
totals -> driver cumsum of ~thousands of partials -> broadcast offsets);
this module keeps the one-window form, which Spark executes as a single
global sort — correct at any size, optimal up to the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .sample import _unit_hash
from .textstats import token_count_col


def pack_assignments(
    docs: DataFrame,
    capacity: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """-> (doc_id, n_tokens, start_offset, chunk_first, chunk_last).

    start_offset: position of the doc's first token in the concatenated
    stream (hash-permuted order). chunk_first/chunk_last: indices of the
    capacity-sized windows the doc's tokens fall into (a doc may straddle
    several). Zero-token docs occupy no stream space; they are assigned
    the chunk their offset points at (chunk_last = chunk_first)."""
    n_tok = token_count_col(F.col(text_col)).cast("long").alias("n_tokens")
    keyed = docs.select(F.col(id_col), n_tok, _unit_hash(F.col(id_col), seed).alias("_h"))
    w = Window.orderBy("_h", id_col)
    cum = keyed.withColumn("_end", F.sum("n_tokens").over(w))
    return cum.select(
        id_col,
        "n_tokens",
        (F.col("_end") - F.col("n_tokens")).alias("start_offset"),
        F.floor((F.col("_end") - F.col("n_tokens")) / capacity).alias("chunk_first"),
        F.floor(
            F.greatest(F.col("_end") - 1, F.col("_end") - F.col("n_tokens")) / capacity
        ).alias("chunk_last"),
    )
