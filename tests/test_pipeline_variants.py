"""Pipeline variants: canonicalization enabled, PGloVe cost, Adam/AMSGrad,
directed BCA + normalization through the full stack."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_embeddings_spark.config import (
    BcaConfig,
    OptConfig,
    OutputConfig,
    PipelineConfig,
    SimilarityGroup,
)
from graph_embeddings_spark.corpus import alias_dict_df, web_pages_df
from graph_embeddings_spark.pipeline import run_pipeline


def _cfg(**kw):
    base = dict(
        dim=8,
        seed=42,
        opt=OptConfig(method="adagrad", tolerance=0.0, maxiter=2),
        output=OutputConfig(uri=[], blank=[], literal=[]),
    )
    base.update(kw)
    return PipelineConfig(**base)


def test_pipeline_with_similarity_groups(spark, world):
    """Canonicalization stage wired end-to-end: type-0 bidirectional edges
    appear for near-identical literal objects (years under founded_year)."""
    pages = web_pages_df(spark, world, 150, partitions=4)
    cfg = _cfg(
        similarity=[
            SimilarityGroup(
                source_predicate="founded_year",
                target_predicate="founded_year",
                method="numeric",
                threshold=0.5,  # |a-b| <= 3 at smooth 0.5
                smooth=0.5,
            )
        ]
    )
    res = run_pipeline(
        spark, pages, alias_dict_df(spark, world), sorted(world.alias_map),
        cfg, train=False,
    )
    sim_edges = res.edges.filter(F.col("etype") == 0)
    n = sim_edges.count()
    assert n > 0 and n % 2 == 0  # bidirectional pairs
    # every similarity edge connects two literal year nodes
    lit_ids = {r["node_id"] for r in res.nodes.filter("node_type = 2").collect()}
    for r in sim_edges.collect():
        assert r["src"] in lit_ids and r["dst"] in lit_ids
        assert 0 < r["weight"] <= 1.0


@pytest.mark.parametrize("method,cost", [("adam", "glove"), ("amsgrad", "pglove")])
def test_pipeline_optimizer_variants(spark, world, method, cost):
    pages = web_pages_df(spark, world, 100, partitions=4)
    cfg = _cfg(
        method=cost,
        opt=OptConfig(method=method, tolerance=0.0, maxiter=2),
        # PGloVe needs Xij in (0,1): unity normalization (the reference pairs
        # pglove with BCA probabilities the same way)
        bca=BcaConfig(alpha=0.1, epsilon=1e-3, directed=False, normalize="unity"),
    )
    res = run_pipeline(
        spark, pages, alias_dict_df(spark, world), sorted(world.alias_map),
        cfg, train=True, n_shards=2, batch=256,
    )
    assert len(res.cost_history) == 2
    assert res.embeddings.count() == res.nodes.count()
    vec = res.embeddings.select("vec").head()["vec"]
    assert len(vec) == 8 and all(v == v for v in vec)  # no NaNs


def test_pipeline_directed_counts_normalization(spark, world):
    pages = web_pages_df(spark, world, 100, partitions=4)
    cfg = _cfg(bca=BcaConfig(alpha=0.1, epsilon=1e-3, directed=True, normalize="counts"))
    res = run_pipeline(
        spark, pages, alias_dict_df(spark, world), sorted(world.alias_map),
        cfg, train=False,
    )
    # counts mode: values scaled into [1, 1000], root entries dropped
    stats = res.cooc.cooc.agg(
        F.min("x").alias("mn"), F.max("x").alias("mx"),
        F.sum(F.when(F.col("i") == F.col("j"), 1).otherwise(0)).alias("roots"),
    ).collect()[0]
    assert stats["mn"] >= 1.0 - 1e-9
    assert stats["mx"] <= 1000.0 + 1e-6
    assert stats["roots"] == 0


def test_resume_after_convergence_is_noop(spark, world, tmp_path):
    """A run whose training hit the tolerance break must NOT retrain (and
    must not rewrite the export) when resumed — the convergence marker is
    as final as maxiter."""
    import os

    work = str(tmp_path / "work")
    pages = web_pages_df(spark, world, 60, partitions=2)
    cfg = _cfg(opt=OptConfig(method="adagrad", tolerance=1e9, maxiter=8))
    res1 = run_pipeline(
        spark, pages, alias_dict_df(spark, world), sorted(world.alias_map),
        cfg, work_dir=work, resume=True, train=True, n_shards=2, batch=256,
    )
    assert 0 < len(res1.cost_history) < 8  # tolerance break fired early
    export_done = os.path.join(work, "export", "_DONE")
    assert os.path.exists(export_done)
    stamp = os.path.getmtime(export_done)

    res2 = run_pipeline(
        spark, pages, alias_dict_df(spark, world), sorted(world.alias_map),
        cfg, work_dir=work, resume=True, train=True, n_shards=2, batch=256,
    )
    assert res2.cost_history == []  # zero new epochs
    assert os.path.getmtime(export_done) == stamp  # export untouched
    a = {r["node_id"]: list(r["vec"]) for r in res1.embeddings.collect()}
    b = {r["node_id"]: list(r["vec"]) for r in res2.embeddings.collect()}
    assert a == b
