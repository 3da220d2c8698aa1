"""PCA dimensionality reduction over the trained embeddings.

The reference DECLARES this surface (`pca: variance:` in every shipped
config, printed in the TSV header) but never implemented it — Main.java:43-44
is a TODO and `usingPca()` only toggles the header line. This module makes
the declared config real, Spark-first:

  1. moment aggregation — ONE distributed pass over embeddings(node_id,
     vec array<float>): per-partition partial (count, sum, sum of outer
     products) via mapInPandas (numpy `x.T @ x` per Arrow batch), combined
     on the driver. d <= a few hundred, so the d x d Gram matrix is
     driver-small by construction (300^2 doubles = 720 KB) while the row
     count is unbounded — the classic tall-skinny covariance pattern.
  2. eigendecomposition of the covariance on the driver (numpy eigh),
     components sorted by descending eigenvalue; keep the smallest k whose
     explained-variance ratio reaches `variance`.
  3. projection — a broadcast (d x k) matrix applied per Arrow batch
     (numpy matmul), emitting vec'(k) rows. No shuffle anywhere: pass 1 is
     an aggregate, pass 3 is a narrow map.

Determinism: eigh is deterministic for a fixed matrix; component SIGN is
normalized (largest-|loading| coordinate made positive) so results are
identical across runs/partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _moments(emb: DataFrame, vec_col: str):
    """One pass -> (n, sum_vec d, gram d x d) via partial aggregation."""
    import numpy as np
    import pandas as pd

    def partial(batches):
        n = 0
        s = None
        g = None
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += mat.shape[0]
            s = mat.sum(axis=0) if s is None else s + mat.sum(axis=0)
            gg = mat.T @ mat
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
            )

    parts = emb.select(vec_col).mapInPandas(
        partial, "n long, s array<double>, g array<double>"
    ).collect()
    if not parts:
        raise ValueError("PCA over an empty embedding table")
    import numpy as np

    n = sum(r["n"] for r in parts)
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    d = len(s)
    g = np.sum([np.array(r["g"]).reshape(d, d) for r in parts], axis=0)
    return n, s, g


def fit_pca(emb: DataFrame, variance: float, vec_col: str = "vec"):
    """-> (components (d x k), mean (d,), explained (k,)) keeping the
    smallest k with cumulative explained-variance >= `variance`."""
    import numpy as np

    n, s, g = _moments(emb, vec_col)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = np.maximum(evals[order], 0.0), evecs[:, order]
    total = evals.sum() or 1.0
    ratio = np.cumsum(evals) / total
    k = int(np.searchsorted(ratio, variance) + 1)
    k = min(k, len(evals))
    comp = evecs[:, :k]
    # sign normalization: make each component's largest-|loading| entry
    # positive — eigh's sign is arbitrary, this pins it deterministically
    flips = np.sign(comp[np.abs(comp).argmax(axis=0), np.arange(k)])
    flips[flips == 0] = 1.0
    comp = comp * flips
    return comp, mean, evals[:k] / total


def apply_pca(emb: DataFrame, components, mean, vec_col: str = "vec") -> DataFrame:
    """Project to the principal subspace: vec' = (vec - mean) @ components.
    Broadcast matrices + per-batch numpy matmul; schema preserved with
    vec_col replaced by the k-dim array."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(
        (np.asarray(components, dtype=np.float64), np.asarray(mean, dtype=np.float64))
    )
    other_cols = [c for c in emb.columns if c != vec_col]
    out_fields = []
    for f in emb.schema.fields:
        if f.name == vec_col:
            out_fields.append(f"{vec_col} array<float>")
        else:
            out_fields.append(f"{f.name} {f.dataType.simpleString()}")
    schema = ", ".join(out_fields)

    def project(batches):
        comp, mu = bc.value
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = (mat - mu) @ comp
            out = pdf[other_cols].copy() if other_cols else pd.DataFrame(index=pdf.index)
            out[vec_col] = [row.astype(np.float32) for row in proj]
            yield out[[f.split(" ")[0] for f in out_fields]]

    return emb.mapInPandas(project, schema)


def pca_reduce(emb: DataFrame, variance: float, vec_col: str = "vec") -> DataFrame:
    """Fit + project in the caller-facing one-call form (Main.java:43-44's
    declared-but-missing `dim reduction` step)."""
    comp, mean, _ = fit_pca(emb, variance, vec_col)
    return apply_pca(emb, comp, mean, vec_col)
