"""Deterministic synthetic co-occurrence for scaling evidence.

ONE shared generator: bench.py's glove_scale section and the
tools/*_probe.py scaling harnesses must measure the SAME workload for
BENCH/GLOVE_SCALING.md numbers to be comparable, so the corpus rule
lives here instead of being duplicated per caller.
"""
from __future__ import annotations

from pyspark.sql import DataFrame


def synthetic_cooc(spark, n_entries: int, vocab: int = 25_000, seed: int = 42) -> DataFrame:
    """Deterministic skewed co-occurrence: node ids drawn with quadratic
    density toward 0 (hub skew), x in [1, 5]. Pure column math — identical
    at any parallelism."""
    from pyspark.sql import functions as F

    e = spark.range(0, n_entries, numPartitions=64)

    def node(salt):
        u = F.pmod(F.xxhash64("id", F.lit(seed + salt)), F.lit(1 << 20)) / F.lit(float(1 << 20))
        return F.floor(u * u * vocab).cast("long")

    return e.select(
        node(1).alias("i"),
        (node(2) + vocab).alias("j"),
        (1.0 + F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(5)).cast("double")).alias("x"),
    )
