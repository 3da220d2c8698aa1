"""PCA over embeddings: numpy-oracle parity, variance selection,
partitioning determinism (glove/pca.py — the reference's declared-but-
unimplemented `pca: variance:` surface, Main.java:43-44)."""

from __future__ import annotations

import numpy as np
import pytest

from graph_embeddings_spark.glove.pca import apply_pca, fit_pca, pca_reduce


def _emb(spark, n=60, d=6, seed=9, partitions=4):
    rng = np.random.default_rng(seed)
    # anisotropic data: 2 strong directions, 4 weak
    basis = rng.normal(size=(d, d))
    scales = np.array([10.0, 5.0, 0.5, 0.3, 0.2, 0.1])
    mat = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(size=d)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "node_id long, vec array<float>").repartition(partitions),
        mat.astype(np.float32).astype(np.float64),
    )


def test_fit_matches_numpy_oracle(spark):
    emb, mat = _emb(spark)
    comp, mean, ratio = fit_pca(emb, variance=0.9)
    assert np.allclose(mean, mat.mean(axis=0), atol=1e-6)
    cov = np.cov(mat, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    want_ratio = evals / evals.sum()
    k = comp.shape[1]
    assert np.allclose(ratio, want_ratio[:k], atol=1e-6)
    # the captured subspace reconstructs >= 90% of the variance
    assert ratio.sum() >= 0.9
    # components are orthonormal
    assert np.allclose(comp.T @ comp, np.eye(k), atol=1e-8)


def test_variance_threshold_selects_k(spark):
    emb, _ = _emb(spark)
    c_small, _, _ = fit_pca(emb, variance=0.5)
    c_big, _, _ = fit_pca(emb, variance=0.999)
    assert c_small.shape[1] < c_big.shape[1] <= 6


def test_projection_and_determinism(spark):
    emb, mat = _emb(spark)
    out = pca_reduce(emb, variance=0.9)
    rows = {r["node_id"]: np.array(r["vec"]) for r in out.collect()}
    k = len(next(iter(rows.values())))
    assert out.columns == ["node_id", "vec"] and k < 6
    # numpy oracle projection (same sign convention)
    comp, mean, _ = fit_pca(emb, variance=0.9)
    want = (mat - mean) @ comp
    for i, v in rows.items():
        assert np.allclose(v, want[i], atol=1e-4)
    # partitioning must not change anything
    emb2, _ = _emb(spark, partitions=9)
    rows2 = {r["node_id"]: np.array(r["vec"]) for r in pca_reduce(emb2, 0.9).collect()}
    for i in rows:
        assert np.allclose(rows[i], rows2[i], atol=1e-5)


def test_empty_raises(spark):
    emb, _ = _emb(spark)
    with pytest.raises(Exception):
        fit_pca(emb.filter("node_id < 0"), 0.9)


def test_pipeline_with_pca_and_header(spark, tmp_path):
    """End-to-end: RDF graph -> trained embeddings reduced by PCA; the TSV
    header records the variance (EmbeddingTextWriter would print it when
    usingPca, Main.java:43-44 left the actual reduction TODO)."""
    from graph_embeddings_spark.config import (
        OptConfig, OutputConfig, PcaConfig, PipelineConfig,
    )
    from graph_embeddings_spark.output import config_header_lines
    from graph_embeddings_spark.pipeline import run_graph_pipeline

    rows = []
    for i in range(10):
        rows.append((f"e{i}", "knows", f"e{(i + 1) % 10}", 0))
    triples = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_kind int"
    )
    cfg = PipelineConfig(
        dim=8, opt=OptConfig(maxiter=2, tolerance=0.0),
        output=OutputConfig(uri=[], blank=[], literal=[]),
        pca=PcaConfig(variance=0.8),
    )
    res = run_graph_pipeline(
        spark, triples, cfg, work_dir=str(tmp_path / "wd"), n_shards=2, batch=64,
    )
    dims = {len(r["vec"]) for r in res.embeddings.collect()}
    assert len(dims) == 1 and dims.pop() < 8  # reduced below training dim
    assert "# PCA Minimum Variance: 0.8" in config_header_lines(cfg)
