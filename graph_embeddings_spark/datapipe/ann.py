"""Approximate nearest-neighbor search over an embedding column.

embeddings(vec_id long, embedding array<float>, label int). Two paths:

  brute_topk     exact cosine top-k: probe × corpus crossJoin + per-probe
                 window rank. Baseline and oracle-checkable; the probe side
                 must be small (bounded crossJoin).
  lsh_topk       random-hyperplane sign-band buckets (deterministic seeded
                 planes via splitmix-style hashing — no stored model), probe
                 joins only its bucket ∪ adjacent-band buckets, exact rerank
                 inside. The 10^12-row path: corpus passes once through the
                 bucketer; per-probe work is bucket-sized, never corpus-sized.

Exact rescoring is Arrow-batched (`cosine_rescore`: one numpy einsum per
batch); the interpreted column form (`cosine_col`) is kept only as its
parity oracle — the same playbook as simhash_col -> simhash_df.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y), F.lit(0.0), lambda s, z: s + z)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, z: s + z.cast("double") * z))


def cosine_col(a, b):
    """REFERENCE FORM ONLY: ~3·dim interpreted HOF evaluations per row —
    the anti-pattern this repo measured at ~16 µs/element. Kept as the
    parity oracle for `cosine_rescore` (tested identical to 1e-12);
    every shipping path uses the Arrow-batched rescore."""
    return _dot(a, b) / (_norm(a) * _norm(b) + F.lit(1e-12))


def cosine_rescore(df: DataFrame, a_col: str, b_col: str, out_col: str = "cos") -> DataFrame:
    """df + out_col (double): exact cosine between two array<float> columns
    via ONE Arrow-batched numpy pass (stack both sides, one einsum + two
    vectorized norms per batch) instead of ~3·dim interpreted lambda
    evaluations per row. Same float64 math and the same +1e-12 denominator
    guard as `cosine_col` (differs only in summation order; parity-tested).
    Shared by brute_topk / lsh_topk / ivf_topk and
    dedup.cosine_dedup_pairs — the single exact-rescore kernel."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])
    cols = [f.name for f in out_schema.fields]

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                pdf[out_col] = pd.Series([], dtype="float64")
                yield pdf[cols]
                continue
            av = pdf[a_col].to_numpy()
            bv = pdf[b_col].to_numpy()
            # null-semantics parity with cosine_col: a NULL array or a
            # length mismatch yields cos NULL (zip_with+aggregate do the
            # same) instead of crashing np.stack on the whole batch
            lens = np.fromiter(
                (
                    len(x) if x is not None and y is not None and len(x) == len(y) else -1
                    for x, y in zip(av, bv)
                ),
                dtype=np.int64,
                count=n,
            )
            out = np.full(n, np.nan)
            for d in np.unique(lens[lens >= 0]):
                m = lens == d
                a = np.stack(av[m]).astype(np.float64)
                b = np.stack(bv[m]).astype(np.float64)
                dots = np.einsum("ij,ij->i", a, b)
                na = np.linalg.norm(a, axis=1)
                nb = np.linalg.norm(b, axis=1)
                out[m] = dots / (na * nb + 1e-12)
            # NaN (invalid rows, NULL elements, or non-finite input
            # elements — an inf element makes dot AND norm infinite, so
            # the cosine is inf/inf = NaN in this kernel and in
            # cosine_col's float math alike) -> SQL NULL: Spark sorts NaN
            # ABOVE every double, so a NaN cos would WIN a desc-rank
            # window. The gate is exactly np.isnan, not isfinite: a
            # +/-inf cosine VALUE is unreachable (the +1e-12 denominator
            # guard bounds every finite dot), so isnan states the intent
            # precisely instead of silently widening it.
            nan = np.isnan(out)
            if not nan.any():
                pdf[out_col] = out  # fast path: one rectangular batch
            else:
                pdf[out_col] = pd.Series(
                    [None if isnan else float(v) for v, isnan in zip(out, nan)],
                    index=pdf.index, dtype=object,
                )
            yield pdf[cols]

    return df.mapInPandas(gen, out_schema)


def brute_topk(corpus: DataFrame, probes: DataFrame, k: int = 10) -> DataFrame:
    """-> (probe_id, vec_id, cos, rank<=k); exact."""
    c = corpus.select(F.col("vec_id"), F.col("embedding").alias("_cv"))
    p = probes.select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("_pv"))
    pairs = p.crossJoin(c).filter(F.col("probe_id") != F.col("vec_id"))
    scored = cosine_rescore(pairs, "_pv", "_cv").select("probe_id", "vec_id", "cos")
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), "vec_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _check_plane_seed(seed: int) -> None:
    """Bit-parity between the column form and hyperplane_matrix holds only
    for int32 seeds: F.lit(seed) outside int32 becomes a LongType literal
    (8-byte xxh64 path) while the numpy side hashes 4 bytes. Fail loudly
    instead of silently assigning different buckets per path."""
    if not -(1 << 31) <= seed < (1 << 31):
        raise ValueError(f"hyperplane seed must fit in int32, got {seed}")


def hyperplane_signs(vec, n_planes: int, dim: int, seed: int = 42):
    """Sign bits of dot(vec, plane_p) for seeded pseudo-random planes.
    plane_p[d] = (hash(seed, p, d) / 2^63) in [-1, 1).

    REFERENCE FORM ONLY: per plane this is dim interpreted transform/
    zip_with/aggregate evaluations — at dim 300 × 8 planes ~2,400
    interpreted ops per row. Kept as the parity oracle for
    `hyperplane_matrix`/`with_hyperplane_sig` (same hash recipe, tested
    identical); every shipping path uses the Arrow-batched matmul."""
    _check_plane_seed(seed)
    bits = []
    for p in range(n_planes):
        comps = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (F.xxhash64(F.lit(seed), F.lit(p), d).cast("double") / F.lit(float(2**63))),
        )
        dot = F.aggregate(
            F.zip_with(vec, comps, lambda v, c: v.cast("double") * c),
            F.lit(0.0), lambda s, z: s + z,
        )
        bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)).alias(f"_b{p}"))
    bucket = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        bucket = bucket + b.cast("long") * (2**i)
    return bucket


def hyperplane_matrix(n_planes: int, dim: int, seed: int = 42):
    """(n_planes, dim) float64 plane matrix — the EXACT values the column
    form computes: plane[p, d] = signed64(xxh64_int_chain(42; seed, p, d))
    / 2^63, generated with the numpy XXH64 4-byte path (functions/xxh64.py,
    JVM-parity-tested). Deterministic, k×dim driver-small, broadcastable."""
    import numpy as np

    from ..functions.xxh64 import xxh64_int_np

    _check_plane_seed(seed)
    p = np.repeat(np.arange(n_planes, dtype=np.uint64), dim)
    d = np.tile(np.arange(dim, dtype=np.uint64), n_planes)
    h = xxh64_int_np(np.uint64(seed & 0xFFFFFFFF), np.uint64(42))
    h = xxh64_int_np(p, h)
    h = xxh64_int_np(d, h)
    return (h.view(np.int64).astype(np.float64) / float(2**63)).reshape(n_planes, dim)


def with_hyperplane_sig(
    df: DataFrame, vec_col: str, n_planes: int, dim: int, seed: int = 42,
    out_col: str = "_sig",
) -> DataFrame:
    """df + out_col (long): hyperplane sign buckets via ONE Arrow-batched
    matmul per batch (`mat @ planes.T >= 0` — the same pattern ivf_assign
    uses) instead of n_planes × dim interpreted HOF ops per row. The seeded
    plane matrix is broadcast; bucket assignment matches the reference
    column form bit-for-bit (same planes, same >= 0 rule; dots differ only
    by float summation order, parity-tested)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    planes = hyperplane_matrix(n_planes, dim, seed)
    bc = df.sparkSession.sparkContext.broadcast(planes)
    weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
    out_schema = StructType(df.schema.fields + [StructField(out_col, LongType())])
    cols = [f.name for f in out_schema.fields]

    def gen(batches):
        pl = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = pd.Series([], dtype="int64")
            else:
                mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                sig = ((mat @ pl.T >= 0).astype(np.int64) * weights).sum(axis=1)
                pdf[out_col] = sig
            yield pdf[cols]

    return df.mapInPandas(gen, out_schema)


def _normalize_rows(mat):
    import numpy as np

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def ivf_train_centroids(
    corpus: DataFrame, n_centroids: int, iters: int = 3, seed: int = 42
):
    """Spherical k-means centroids for IVF partitioning.

    Init: deterministic sample (smallest xxhash64(seed, vec_id) — identical
    at any parallelism). Each Lloyd iteration is one distributed pass: an
    Arrow-batched assign UDF (numpy matmul vs the broadcast centroid matrix,
    never per-row Python) + groupBy(cluster).posexplode mean. Centroids are
    k×dim — driver-small by construction (k ≈ √n at scale), the same
    contract as every IVF implementation."""
    import numpy as np

    init = (
        corpus.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.lit(seed), F.col("vec_id")))
        .limit(n_centroids)
        .toPandas()
    )
    if len(init) == 0:
        raise ValueError("ivf_train_centroids: empty corpus")
    cents = _normalize_rows(np.stack(init["embedding"].to_numpy()).astype(np.float64))
    for _ in range(iters):
        # spherical k-means: the Lloyd update averages the UNIT-normalized
        # members (assignment is by cosine, so averaging raw embeddings
        # would let high-norm outliers drag the centroids); ivf_assign
        # emits each row's norm so the mean runs on v/norm JVM-side
        assigned = ivf_assign(corpus, cents, with_norm=True)
        upd = (
            assigned.select("cluster", "_norm", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("v") / F.col("_norm")).alias("c"))
            .toPandas()
        )
        new = cents.copy()
        for cl, grp in upd.groupby("cluster"):
            new[int(cl)] = grp.sort_values("pos")["c"].to_numpy()
        cents = _normalize_rows(new)
    return cents


def ivf_assign(corpus: DataFrame, centroids, with_norm: bool = False) -> DataFrame:
    """corpus + centroid matrix -> (vec_id, embedding, cluster[, _norm]):
    one Arrow-batched pass, numpy matmul per batch (cosine argmax).
    with_norm additionally emits each row's L2 norm (zero-norm rows get
    1.0, matching _normalize_rows) for the spherical Lloyd update."""
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))
    schema = "vec_id long, embedding array<float>, cluster int" + (
        ", _norm double" if with_norm else ""
    )

    def assign(batches):
        cents = bc.value  # (k, dim), rows unit-norm
        for pdf in batches:
            if len(pdf) == 0:  # empty Arrow batch: nothing to stack
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            cl = np.argmax((mat / norms[:, None]) @ cents.T, axis=1).astype("int32")
            out = {"vec_id": pdf["vec_id"], "embedding": pdf["embedding"], "cluster": cl}
            if with_norm:
                out["_norm"] = norms
            yield pd.DataFrame(out)

    return corpus.select("vec_id", "embedding").mapInPandas(assign, schema)


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    seed: int = 42,
) -> DataFrame:
    """-> (probe_id, vec_id, cos, rank<=k): the IVF scale path — corpus
    bucketed once by nearest centroid, each probe scans only its `nprobe`
    closest inverted lists (exact cosine rerank inside). Per-probe work is
    (nprobe/n_centroids) of the corpus instead of all of it; at 10^12 rows
    the assignment is one pass and the probe join is cluster-partitioned."""
    import numpy as np
    import pandas as pd

    cents = ivf_train_centroids(corpus, n_centroids, iters, seed)
    assigned = ivf_assign(corpus, cents)
    # the corpus may hold fewer rows than n_centroids (init sample shrinks)
    # and callers may over-ask: clamp instead of a mid-job reshape crash
    nprobe = min(nprobe, len(cents))

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(cents)

    def probe_assign(batches):
        c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _normalize_rows(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
            order = np.argsort(-(mat @ c.T), axis=1)[:, :nprobe].astype("int32")
            out = pdf.loc[pdf.index.repeat(nprobe)].reset_index(drop=True)
            out = out.rename(columns={"vec_id": "probe_id", "embedding": "_pv"})
            out["cluster"] = order.reshape(-1)
            yield out[["probe_id", "_pv", "cluster"]]

    p = probes.select("vec_id", "embedding").mapInPandas(
        probe_assign, "probe_id long, _pv array<float>, cluster int"
    )
    cands = (
        p.join(assigned.withColumnRenamed("embedding", "_cv"), "cluster")
        .filter(F.col("probe_id") != F.col("vec_id"))
        .select("probe_id", "vec_id", "_pv", "_cv")
    )
    scored = cosine_rescore(cands, "_pv", "_cv").select("probe_id", "vec_id", "cos")
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), "vec_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    bands: int = 2,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """-> (probe_id, vec_id, cos, rank<=k) searching only same-bucket
    candidates per band (multi-band OR improves recall). Approximate: rank
    is within the candidate set."""
    if n_planes % bands:  # same guard as cosine_dedup_pairs — a remainder
        raise ValueError(  # would silently ignore the top planes
            f"bands ({bands}) must divide n_planes ({n_planes})"
        )
    width = n_planes // bands

    def _banded(df, id_name, vec_name):
        # single Arrow pass computes the signs once per row (matmul vs the
        # broadcast plane matrix), then one explode fans out the bands
        from ..functions.lsh import packed_sig_bands

        sig = with_hyperplane_sig(
            df.select(id_name, vec_name), vec_name, n_planes, dim, seed
        )
        return packed_sig_bands(sig, "_sig", bands, width, [id_name, vec_name])

    cb = _banded(corpus.select("vec_id", F.col("embedding").alias("_cv")), "vec_id", "_cv")
    pb = _banded(
        probes.select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("_pv")),
        "probe_id", "_pv",
    )
    cands = (
        pb.join(cb, ["band", "bucket"])
        .filter(F.col("probe_id") != F.col("vec_id"))
        .select("probe_id", "vec_id", "_pv", "_cv")
    )
    # multi-band duplicates are scored (cheap, Arrow-batched) and THEN
    # deduped with a groupBy-max on id-sized rows, so the dedup exchange
    # never ships the dim-sized vector pairs (duplicates score identically,
    # so max = any); previously a vector-carrying .distinct() moved
    # ~2·dim·4 bytes per candidate through the shuffle
    scored = (
        cosine_rescore(cands, "_pv", "_cv")
        .groupBy("probe_id", "vec_id")
        .agg(F.max("cos").alias("cos"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), "vec_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
