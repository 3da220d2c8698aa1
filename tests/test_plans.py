"""Physical-plan assertions: the optimizations we claim must appear in
`explain` output — broadcast joins on dictionary joins, parquet filter
pushdown + column pruning, whole-stage codegen on column-math operators,
and no Python evaluation nodes in JVM-only paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_predicate_weight_filter_broadcasts(spark):
    from graph_embeddings_spark.graph.materialize import filter_by_predicate_weights

    triples = spark.createDataFrame(
        [("s", "works_at", "o", 0)] * 10, "subj string, pred string, obj string, obj_kind int"
    )
    out = filter_by_predicate_weights(triples, {"works_at": 1.0})
    assert "BroadcastHashJoin" in _plan(out)


def test_parquet_pushdown_and_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
    rs = plan.split("ReadSchema")[1][:200]
    assert "l_extendedprice" not in rs  # pruned to the 2 selected columns


def test_textstats_stays_jvm_side(spark):
    """lang/quality/token operators must contain no Python eval nodes."""
    from graph_embeddings_spark.datapipe.textstats import lang_scores, quality_features

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for op in (lang_scores, quality_features):
        plan = _plan(op(docs))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # executedPlan().toString() marks whole-stage-codegen stages with *(n)
        assert "*(" in plan or "WholeStageCodegen" in plan


def test_minhash_signatures_jvm_side(spark):
    from graph_embeddings_spark.functions.lsh import char_shingles_col, minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sig = minhash_signatures(
        docs.select(F.col("doc_id"), char_shingles_col(F.col("text")).alias("sh")),
        "doc_id", F.col("sh"), num_hashes=8,
    )
    plan = _plan(sig)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_alias_resolution_broadcasts(spark, world):
    from graph_embeddings_spark.corpus import alias_dict_df
    from graph_embeddings_spark.extract.mentions import link_mentions

    mentions = spark.createDataFrame([("u", "alice")], "url string, surface string")
    out = link_mentions(mentions, alias_dict_df(spark, world))
    assert "BroadcastHashJoin" in _plan(out)


def test_extract_embeddings_no_python(spark):
    from graph_embeddings_spark.glove.train import extract_embeddings, init_params_df

    nodes = spark.range(10).select(F.col("id").alias("node_id"))
    params = init_params_df(nodes, 4, 42, "adagrad")
    # the (focus+context)/2 extraction itself is pure zip_with — the only
    # Python in the plan is the init generator upstream
    emb = extract_embeddings(params)
    plan = _optimized(emb)
    assert "zip_with" in plan or "ZipWith" in plan

def test_bca_loop_round_exchange_budget(spark):
    """One loop round = frontier⋈adjacency + single node-keyed merge. The
    adjacency is pre-partitioned on the join key and the merge repartitions
    on node (which satisfies the groupBy's clustering), so a round's plan
    must contain EXACTLY 1 new shuffle exchange; more means the per-round
    cost would compound at 100-TB scale. Uses the engine's own expand_round
    so the asserted plan cannot drift from the shipping one."""
    from graph_embeddings_spark.bca.cooc import build_adjacency, expand_round

    edges = spark.createDataFrame(
        [(0, 1, 1, 1.0), (1, 2, 1, 2.0), (2, 0, 1, 1.0)],
        "src long, dst long, etype int, weight double",
    )
    # persisted like the engine does: InMemoryTableScan keeps the
    # repartition('node') partitioning, so the round join must not
    # re-exchange the adjacency side
    adj = build_adjacency(edges, "both").persist()
    adj.count()
    wet = spark.createDataFrame(
        [(0, 0, 1.0), (1, 1, 1.0)], "root long, node long, paint double"
    ).localCheckpoint(eager=True)
    moved = expand_round(wet.filter(F.col("paint") >= 1e-3), adj, 0.1, 1e-3)
    # Count SHUFFLE exchanges executed per round: truncate at the cached
    # adjacency (its displayed build plan already ran once, not per round)
    # and ignore BroadcastExchange (broadcasting a small side is the win).
    plan = _plan(moved).split("InMemoryRelation")[0]
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
