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

Scale shape: the prefix sum is the standard TWO-PASS distributed scan,
not one global-sort window. Rows are bucketed into hash-RANGE partitions
(_pid = floor(h * P) — a pure function of the id, so both passes see
identical buckets with no repartitionByRange boundary sampling, which is
not stable across jobs); pass 1 sums each bucket's tokens (driver
collects ~thousands of partial totals, one long each), pass 2 runs the
running sum WITHIN each bucket — a parallel window, never a single
global sort — and adds the broadcast bucket offset. All chunk arithmetic
is integer (`div`), never float: floor(x/c) in float space loses
exactness past 2^53 tokens, which a 10^12-doc corpus crosses.
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
    num_partitions: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """-> (doc_id, n_tokens, start_offset, chunk_first, chunk_last).

    start_offset: position of the doc's first token in the concatenated
    stream (hash-permuted order). chunk_first/chunk_last: indices of the
    capacity-sized windows the doc's tokens fall into (a doc may straddle
    several). Zero-token docs occupy no stream space; they are assigned
    the chunk their offset points at (chunk_last = chunk_first).

    num_partitions: bucket count for the two-pass prefix sum (default:
    the session's shuffle partitions). The output is identical at ANY
    bucket count — global order is (hash, id); _pid = floor(hash * P) is
    monotone in hash, so bucket-0 rows all precede bucket-1 rows and the
    per-bucket running sums concatenate into the global prefix sum.
    Ties across the (hash, id) order never straddle buckets because equal
    hashes land in the same bucket by construction.

    EAGER: pass 1 (the per-bucket totals collect) runs when this function
    is CALLED, not when the result executes — broadcast offsets cannot be
    deferred. The keyed relation is persisted so pass 2 re-reads the SAME
    materialized rows pass 1 summed; without it, a nondeterministic
    upstream (rand-derived filters, files changing between construction
    and execution) could hand the two passes different rows and silently
    corrupt every offset.

    CACHE OWNERSHIP: the persisted relation belongs to the caller — pass
    cache_registry and unpersist its entries once the result is consumed.
    cache_registry=None leaves the block pinned until the keyed RDD is
    garbage-collected (Spark's ContextCleaner), which on a long-lived
    session with many distinct inputs accumulates executor memory; a
    RuntimeWarning flags the omission so library callers can't leak
    silently.
    """
    if cache_registry is None:
        import warnings

        warnings.warn(
            "pack_assignments persists an intermediate relation; pass "
            "cache_registry and unpersist after consuming the result "
            "(None leaves cleanup to the ContextCleaner)",
            RuntimeWarning,
            stacklevel=2,
        )
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    p = int(num_partitions)
    n_tok = token_count_col(F.col(text_col)).cast("long").alias("n_tokens")
    h = _unit_hash(F.col(id_col), seed)
    keyed = docs.select(
        F.col(id_col),
        n_tok,
        h.alias("_h"),
        F.least(F.floor(h * p), F.lit(p - 1)).cast("int").alias("_pid"),
    ).persist()
    if cache_registry is not None:
        cache_registry.append(keyed)

    # pass 1: one token total per bucket (driver-small: p longs), turned
    # into exclusive prefix offsets and broadcast back; this collect also
    # materializes the cache pass 2 reads
    totals = {
        r["_pid"]: r["_t"]
        for r in keyed.groupBy("_pid").agg(F.sum("n_tokens").alias("_t")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((int(pid), acc))
        acc += int(totals[pid])
    off_df = F.broadcast(spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long"))

    # pass 2: running sum WITHIN each bucket (parallel window — the
    # exchange hashes on _pid, every bucket is its own window group) plus
    # the bucket's broadcast offset
    w = Window.partitionBy("_pid").orderBy("_h", id_col)
    cum = (
        keyed.join(off_df, "_pid")
        .withColumn("_end", F.sum("n_tokens").over(w) + F.col("_off"))
    )
    start = F.col("_end") - F.col("n_tokens")
    return cum.select(
        id_col,
        "n_tokens",
        start.alias("start_offset"),
        F.col("_end").alias("_e"),
    ).selectExpr(
        id_col,
        "n_tokens",
        "start_offset",
        f"start_offset div {int(capacity)} AS chunk_first",
        f"greatest(_e - 1, start_offset) div {int(capacity)} AS chunk_last",
    )
