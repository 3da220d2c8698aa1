"""End-to-end pipeline on the synthetic corpus: triple P/R gate, graph
identity rules, BCA metadata, training cost decrease, embedding metrics,
resume-from-checkpoint (the north_rule acceptance set)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_embeddings_spark.config import LITERAL, OptConfig, OutputConfig, PipelineConfig
from graph_embeddings_spark.corpus import (
    alias_dict_df,
    expected_triples_df,
    web_pages_df,
)
from graph_embeddings_spark.extract.triples import precision_recall
from graph_embeddings_spark.metrics import (
    cosine_neighbor_rank,
    link_prediction_auc,
    mean_reciprocal_rank,
)
from graph_embeddings_spark.pipeline import run_pipeline

N_PAGES = 300


@pytest.fixture(scope="module")
def pipe(spark, world, tmp_path_factory):
    pages = web_pages_df(spark, world, N_PAGES, partitions=4)
    aliases = sorted(world.alias_map)
    cfg = PipelineConfig(
        dim=16, seed=42,
        opt=OptConfig(method="adagrad", tolerance=0.0, maxiter=12),
        output=OutputConfig(uri=[], blank=[], literal=[]),
    )
    work = str(tmp_path_factory.mktemp("pipe"))
    res = run_pipeline(
        spark, pages, alias_dict_df(spark, world), aliases, cfg,
        work_dir=work, train=True, n_shards=4, batch=256,
    )
    return res, work, cfg


def test_triple_pr_gate(spark, world, pipe):
    res, _, _ = pipe
    expected = expected_triples_df(spark, world, N_PAGES, partitions=4)
    p, r = precision_recall(res.triples, expected)
    assert p >= 0.95, f"precision {p}"
    assert r >= 0.95, f"recall {r}"


def test_graph_identity_rules(pipe):
    res, _, _ = pipe
    # literal nodes carry pred_ctx; same literal under two predicates = two nodes
    lits = res.nodes.filter(F.col("node_type") == LITERAL)
    assert lits.filter(F.col("pred_ctx").isNull()).count() == 0
    dup = (
        lits.groupBy("label").agg(F.countDistinct("pred_ctx").alias("k")).filter("k > 1")
    )
    # years appear under founded_year only; dates under born_on only — but a
    # year literal can also be. . . check at least ids are unique
    assert res.nodes.groupBy("node_id").count().filter("count > 1").count() == 0
    n = res.nodes.count()
    mx = res.nodes.agg(F.max("node_id")).collect()[0][0]
    assert mx == n - 1  # consecutive ids


def test_edges_reference_node_ids(pipe):
    res, _, _ = pipe
    ids = res.nodes.select("node_id")
    bad_src = res.edges.join(ids.withColumnRenamed("node_id", "src"), "src", "left_anti")
    assert bad_src.count() == 0
    assert res.edges.filter("etype < 1").count() == 0  # no similarity groups configured


def test_cooc_properties(pipe):
    res, _, _ = pipe
    assert res.cooc.co_count == res.cooc.cooc.count()
    assert res.cooc.max_x > 0
    # root entries present in NONE mode; per-root retained mass <= 1 per pass
    # (two merged passes in directed mode; undirected default = single pass)
    sums = res.cooc.cooc.groupBy("i").agg(F.sum("x").alias("s"))
    assert sums.filter(F.col("s") > 1.0 + 1e-6).count() == 0


def test_training_cost_decreases(pipe):
    res, _, _ = pipe
    assert len(res.cost_history) >= 3
    assert res.cost_history[-1] < res.cost_history[0]


def test_embedding_quality(pipe):
    """Metric-based acceptance (north_star): related pairs (top co-occurring
    non-root entries) rank far above random; link AUC > 0.6."""
    res, _, _ = pipe
    emb = res.embeddings.select("node_id", "vec")
    vocab = emb.count()
    top = (
        res.cooc.cooc.filter("i != j")
        .orderBy(F.desc("x"))
        .limit(20)
        .select(F.col("i").alias("a"), F.col("j").alias("b"))
    )
    ranked = cosine_neighbor_rank(emb, top)
    mrr = mean_reciprocal_rank(ranked)
    # random MRR ~ H(n)/n; demand a big margin over that
    assert mrr > 0.2, f"mrr {mrr} vocab {vocab}"  # random ≈ H(n)/n ≈ 0.02
    auc = link_prediction_auc(emb, res.edges.select("src", "dst"), neg_per_pos=1)
    assert auc > 0.6, f"auc {auc}"


def test_link_prediction_auc_raises_when_no_negatives(spark):
    """On a COMPLETE graph every sampled negative is a true edge or
    self-pair, so the negative class is empty after the anti-join — the
    metric must fail loudly (AUC undefined), not return a silent 0.0 that
    reads as worst-possible embeddings."""
    import pytest

    from graph_embeddings_spark.metrics import link_prediction_auc

    ids = [0, 1, 2]
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in ids], "node_id long, vec array<float>"
    )
    edges = spark.createDataFrame(
        [(a, b) for a in ids for b in ids], "src long, dst long"
    )
    with pytest.raises(ValueError, match="no negatives"):
        link_prediction_auc(emb, edges, neg_per_pos=1)


def test_resume_from_checkpoint(spark, world, pipe):
    """Re-running with resume=True must reuse checkpoints (same node ids)
    without recomputing stages."""
    res, work, cfg = pipe
    pages = web_pages_df(spark, world, N_PAGES, partitions=4)
    aliases = sorted(world.alias_map)
    res2 = run_pipeline(
        spark, pages, alias_dict_df(spark, world), aliases, cfg,
        work_dir=work, resume=True, train=False,
    )
    a = {(r["label"], r["node_id"]) for r in res.nodes.collect()}
    b = {(r["label"], r["node_id"]) for r in res2.nodes.collect()}
    assert a == b


def test_lineage_rows_written(pipe):
    import os

    _, work, _ = pipe
    for stage in ("extract", "triples", "nodes", "edges", "cooc"):
        assert os.path.exists(os.path.join(work, stage, "_DONE"))
        assert os.path.isdir(os.path.join(work, stage, "_lineage"))
