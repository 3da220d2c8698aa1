"""Graph materialization: triples -> (nodes, edges) with the reference's
identity and dictionary semantics (SURVEY.md §2 F1/A1/A2/J2 mappings).

Reference semantics preserved exactly:
  * F1 predicate-weight filter: triples whose predicate is not in the weights
    map are dropped (Rdf2GrphConverter.java:84-90,116-118; weights are
    effectively mandatory — :96 NPEs without them).
  * A1 vertex identity: URIs/blanks dedup globally on label; literals dedup
    PER (predicate, label) — the same lexical literal under two predicates is
    two distinct vertices (Rdf2GrphConverter.java:197-217,202-213).
  * ids are consecutive ints assigned deterministically (sorted by
    (node_type, label, pred_ctx)) rather than first-seen order — the
    reference's encounter order is single-thread nondeterministic across
    inputs anyway, and a stable global order is what makes runs reproducible
    and resumable at cluster scale (north_rule).
  * A2 edge-type dictionary: predicate -> int 1..N, id 0 reserved for
    similarity edges (Rdf2GrphConverter.java:236-239,158-173).
  * J2 similarity edges: each accepted pair adds TWO directed edges with
    weight=similarity and etype=0 (Rdf2GrphConverter.java:158-173).

Scale notes: the node dictionary is built with a groupBy + row_number over a
global sort — an explicit, deliberate exchange (SURVEY.md §4.4). The
weights/edge-type dictionaries are tiny and broadcast. Edge id resolution is
two joins against the node dictionary; at 10^12-triple scale those joins
shuffle on (label) / (pred,label), the natural keys, and AQE handles skewed
labels (hub entities) — plus an optional salt knob on the dictionary join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import BLANK, LITERAL, URI

# obj_kind values in the triples DF (NodeInfo.java:8-34 encoding)
OBJ_URI, OBJ_BLANK, OBJ_LITERAL = 0, 1, 2


def filter_by_predicate_weights(triples: DataFrame, weights: dict[str, float]) -> DataFrame:
    """F1 — keep only weighted predicates, attach the weight column.

    Broadcast join rather than isin() so the weight value rides along and the
    plan stays a single broadcast hash join at any dictionary size.
    """
    spark = triples.sparkSession
    wdf = spark.createDataFrame(list(weights.items()), "pred string, weight float")
    return triples.join(F.broadcast(wdf), "pred", "inner")


def node_kind_expr():
    """Map triples.obj_kind (entity/literal strings or 0/1/2 ints) to node_type."""
    c = F.col("obj_kind").cast("string")
    return (
        F.when(c.isin("literal", str(OBJ_LITERAL)), F.lit(LITERAL))
        .when(c.isin("blank", str(OBJ_BLANK)), F.lit(BLANK))
        .otherwise(F.lit(URI))
        .cast("tinyint")
    )


def assign_consecutive_ids(
    df: DataFrame, order_cols: list, id_col: str = "node_id",
    cache_registry: list | None = None,
) -> DataFrame:
    """Deterministic consecutive ids [0, n) in global sort order WITHOUT a
    single-task global window: range-partition on the sort key (parallel
    sort), number within each partition, then add per-partition offsets
    (one tiny driver-side cumulative sum). The ids are a pure function of
    the global sort order — range boundaries only choose split points, so
    the result is identical at any parallelism (the resumability/stability
    contract of SURVEY.md §4.4)."""
    import pandas as pd
    from pyspark.sql.types import LongType, IntegerType, StructField, StructType

    ranged = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("_pid", IntegerType()), StructField("_rn", LongType())]
    )

    def number(pdf_iter):
        # one mapInPandas invocation == one partition; batches arrive in
        # partition order, so a running counter numbers the partition
        # without any extra exchange
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        for pdf in pdf_iter:
            pdf = pdf.copy()
            pdf["_pid"] = pid
            pdf["_rn"] = pd.RangeIndex(n + 1, n + 1 + len(pdf)).astype("int64")
            n += len(pdf)
            yield pdf

    # persisted: consumed twice (per-partition counts, then the id join);
    # callers that checkpoint the result pass cache_registry to unpersist it
    local = ranged.mapInPandas(number, out_schema).persist()
    if cache_registry is not None:
        cache_registry.append(local)
    counts = {r["_pid"]: r["c"] for r in local.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    odf = F.broadcast(
        spark.createDataFrame([(p, o) for p, o in offsets.items()], "_pid int, _off long")
    )
    return (
        local.join(odf, "_pid")
        .withColumn(id_col, F.col("_off") + F.col("_rn") - 1)
        .drop("_pid", "_rn", "_off")
    )


def build_nodes(triples: DataFrame, cache_registry: list | None = None) -> DataFrame:
    """A1 — nodes(node_id long, label string, node_type tinyint, pred_ctx string).

    pred_ctx is NULL for URI/blank nodes (global identity) and the predicate
    for literal nodes (per-predicate identity, Rdf2GrphConverter.java:202-213).
    Ids are consecutive in (node_type, label, pred_ctx) order via the
    parallel range-sort assigner (no single-task global window).
    """
    subjects = triples.select(
        F.col("subj").alias("label"),
        F.when(F.col("subj").startswith("_:"), F.lit(BLANK)).otherwise(F.lit(URI)).cast("tinyint").alias("node_type"),
        F.lit(None).cast("string").alias("pred_ctx"),
    )
    objs = triples.withColumn("node_type", node_kind_expr()).select(
        F.col("obj").alias("label"),
        "node_type",
        F.when(F.col("node_type") == LITERAL, F.col("pred")).otherwise(F.lit(None)).alias("pred_ctx"),
    )
    distinct_nodes = subjects.unionByName(objs).distinct()
    return assign_consecutive_ids(
        distinct_nodes,
        [F.col("node_type"), F.col("label"), F.col("pred_ctx").asc_nulls_first()],
        cache_registry=cache_registry,
    )


def build_edge_types(triples: DataFrame) -> DataFrame:
    """A2 — etypes(pred string, etype int); 1-based, 0 reserved for similarity."""
    w = Window.orderBy("pred")
    return triples.select("pred").distinct().withColumn("etype", F.row_number().over(w))


def build_edges(
    triples_weighted: DataFrame, nodes: DataFrame, etypes: DataFrame
) -> DataFrame:
    """edges(src long, dst long, etype int, weight float).

    Two node-dictionary joins: subjects on (label), objects on (label) for
    entities and (label, pred_ctx) for literals — one join with a null-safe
    pred_ctx condition expresses both.
    """
    t = triples_weighted.withColumn("obj_type", node_kind_expr()).withColumn(
        "obj_pred_ctx", F.when(F.col("obj_type") == LITERAL, F.col("pred"))
    )
    src_nodes = nodes.filter(F.col("node_type") != LITERAL).select(
        F.col("label").alias("subj"), F.col("node_id").alias("src")
    )
    dst_nodes = nodes.select(
        F.col("label").alias("obj"),
        F.col("node_type").alias("obj_type"),
        F.col("pred_ctx").alias("obj_pred_ctx"),
        F.col("node_id").alias("dst"),
    )
    return (
        t.join(src_nodes, "subj", "inner")
        .join(
            dst_nodes,
            (t.obj == dst_nodes.obj)
            & (t.obj_type == dst_nodes.obj_type)
            & (t.obj_pred_ctx.eqNullSafe(dst_nodes.obj_pred_ctx)),
            "inner",
        )
        .join(F.broadcast(etypes), "pred", "inner")
        .select("src", "dst", "etype", F.col("weight").cast("float").alias("weight"))
    )


def similarity_edges(pairs: DataFrame) -> DataFrame:
    """J2 — pairs(a long, b long, sim double) -> both directions, etype 0
    (Rdf2GrphConverter.java:158-173)."""
    fwd = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"), F.col("sim"))
    rev = pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"), F.col("sim"))
    return fwd.unionByName(rev).select(
        "src", "dst", F.lit(0).alias("etype"), F.col("sim").cast("float").alias("weight")
    )


def materialize_graph(
    triples: DataFrame, weights: dict[str, float], cache_registry: list | None = None
):
    """Full stage: returns (nodes, edges, etypes). triples needs columns
    (subj, pred, obj, obj_kind)."""
    weighted = filter_by_predicate_weights(triples, weights)
    nodes = build_nodes(weighted, cache_registry=cache_registry)
    etypes = build_edge_types(weighted)
    edges = build_edges(weighted, nodes, etypes)
    return nodes, edges, etypes
