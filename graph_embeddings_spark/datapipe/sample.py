"""Deterministic stratified sampling for training-data curation.

A 100-TB corpus pipeline constantly needs "keep X% of language L / quality
bucket Q" to hit a target mixture. Spark's df.sample is seed-stable only
per partitioning (it samples per partition split), so it is NOT
reproducible across engines, cluster sizes, or re-partitioned reruns.
These operators hash the ROW ID instead: pure integer arithmetic
(Knuth multiplicative hashing), identical in any engine — the DuckDB
oracles reproduce the exact row selection bit-for-bit.

Both are one narrow scan + filter (fraction variant: zero shuffles,
fully pushdown-friendly) or one window (fixed-count variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Knuth's multiplicative constant (2^32 / phi)
_KNUTH = 2654435761
_M1 = 1 << 31  # inner modulus
_M2 = 2147483647  # 2^31 - 1 (prime) — different modulus makes the chain
# NON-affine: a single (id*K + seed) % m is affine in id, so changing the
# seed only shifts every hash by a constant and the induced ORDER barely
# moves; the mod-_M1 between the two multiplies breaks that. Products stay
# under 2^63 (no ANSI overflow): (2^31)·K < 5.7e18.


def _unit_hash(id_col, seed: int):
    """[0, 1) hash of an integer id — plain * and % so any SQL engine
    reproduces it exactly, and distinct seeds give genuinely different
    permutations. The id is reduced mod 2^31-1 BEFORE the multiply: the
    raw product overflows int64 (ANSI abort) once id exceeds ~3.47e9,
    well inside a 10^12-row corpus. Ids differing by a multiple of
    2^31-1 share a hash — unavoidable in a 31-bit output."""
    h0 = F.pmod(id_col.cast("long"), F.lit(_M2))
    h1 = F.pmod(h0 * F.lit(_KNUTH) + F.lit(seed), F.lit(_M1))
    return F.pmod(h1 * F.lit(_KNUTH), F.lit(_M2)) / F.lit(float(_M2))


def sample_stratified(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample: keep a row iff its id-hash falls below
    the stratum's fraction. Strata absent from `fractions` are dropped
    (explicit mixture contract). Zero shuffles — a plain filter that
    pushes through any downstream plan."""
    frac = None
    for k, v in sorted(fractions.items()):
        c = F.when(F.col(strata_col) == k, F.lit(float(v)))
        frac = c if frac is None else frac.when(F.col(strata_col) == k, F.lit(float(v)))
    frac = frac.otherwise(F.lit(0.0)) if frac is not None else F.lit(0.0)
    return df.filter(_unit_hash(F.col(id_col), seed) < frac)


def sample_n_per_stratum(
    df: DataFrame,
    n: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Exact-count deterministic sample: the n rows with the smallest
    id-hash per stratum (hash order = a seeded random-but-reproducible
    permutation). One shuffle on the stratum key. Hash collisions ARE
    possible (_unit_hash is 31-bit; ids differing by 2^31-1 collide) —
    determinism and oracle parity come from the (hash, id) orderBy
    tie-break, which both engines evaluate identically."""
    h = _unit_hash(F.col(id_col), seed).alias("_h")
    w = Window.partitionBy(strata_col).orderBy("_h", id_col)
    return (
        df.select("*", h)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_h", "_rk")
    )
