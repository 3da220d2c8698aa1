"""Collision-free shard labels: Spark-hash parity + bijection."""

import numpy as np
from pyspark.sql import functions as F

from graph_embeddings_spark.functions.partitioning import (
    collision_free_labels,
    murmur3_hash_long,
)


def test_murmur3_matches_spark_hash(spark):
    vals = list(range(-5, 200)) + [2**33 + 7, -(2**40) + 3, 2**62, -1, 12345678901234]
    df = spark.createDataFrame([(int(v),) for v in vals], "x long")
    want = {r["x"]: r["h"] for r in df.select("x", F.hash("x").alias("h")).collect()}
    mine = murmur3_hash_long(vals)
    assert all(want[v] == int(m) for v, m in zip(vals, mine))


def test_labels_are_partition_bijection():
    for n in (1, 2, 7, 16, 64, 256):
        labs = collision_free_labels(n)
        assert len(labs) == n and len(set(labs)) == n
        buckets = np.mod(murmur3_hash_long(np.array(labs)).astype(np.int64), n)
        assert buckets.tolist() == list(range(n))


def test_labels_route_to_own_partition(spark):
    n = 16
    labs = collision_free_labels(n)
    df = spark.createDataFrame([(int(v),) for v in labs], "lab long").repartition(n, "lab")
    got = {r["lab"]: r["p"] for r in df.select("lab", F.spark_partition_id().alias("p")).collect()}
    assert all(got[lab] == k for k, lab in enumerate(labs))


def test_element_at_labels_route_to_own_partition(spark):
    """The exact expression shape train_epoch uses: element_at over an
    array of LONG literals (a bare int literal array would hash as
    IntegerType and void the bijection — the regression this guards)."""
    n = 16
    labs = collision_free_labels(n)
    arr = F.array(*[F.lit(int(v)).cast("long") for v in labs])
    df = (
        spark.range(200)
        .select(F.element_at(arr, (F.col("id") % n).cast("int") + 1).alias("lab"))
        .repartition(n, "lab")
        .select("lab", F.spark_partition_id().alias("p"))
    )
    per_part = df.groupBy("p").agg(F.countDistinct("lab").alias("k")).collect()
    assert len(per_part) == n  # no empty partitions
    assert all(r["k"] == 1 for r in per_part)  # one shard key per partition
