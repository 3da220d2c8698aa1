"""End-to-end pipeline driver: web pages -> KG -> co-occurrence -> embeddings.

The Spark analog of Main.runProgram (Main.java:29-78), re-architected per
BASELINE.json north_rule: every stage writes a parquet/Iceberg checkpoint
with per-partition lineage rows, so any run resumes from the last completed
stage (and training resumes mid-epoch via glove.train's per-epoch params
checkpoints). Stage seams match the reference's:

    load     (JenaReader)        -> dedup'd pages          [graft: web table]
    extract  (graft surface)     -> text per url
    triples  (graft surface)     -> triples(subj,pred,obj,obj_kind)
    convert  (Rdf2GrphConverter) -> nodes/edges/etypes
    compare  (CompareJob loop)   -> similarity type-0 edges
    bca      (BookmarkColoring)  -> cooc(i,j,x) + max
    optimize (Optimizer)         -> params -> embeddings
    write    (EmbeddingTextWriter) -> filtered parquet/TSV

Checkpoint layout under `work_dir`:
    <stage>/data/        parquet of the stage output
    <stage>/_lineage/    (stage, partition_id, rows) rows + _DONE marker
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import PipelineConfig
from .corpus import PHRASE_TO_PRED  # closed predicate vocabulary
from .bca.cooc import CoocResult, bca_cooccurrence
from .extract.text import latest_texts, with_extracted_text
from .extract.triples import extract_surface_triples, link_triples
from .glove.train import (
    converged_epoch, extract_embeddings, find_completed_epochs, optimize, resume_params,
)
from .graph.canonicalize import all_similarity_pairs
from .graph.materialize import materialize_graph, similarity_edges
from .output import filter_embeddings, write_tsv


def _stage_paths(work_dir: str, stage: str) -> tuple[str, str, str]:
    base = os.path.join(work_dir, stage)
    return os.path.join(base, "data"), os.path.join(base, "_lineage"), os.path.join(base, "_DONE")


def checkpoint_stage(df: DataFrame, work_dir: str, stage: str) -> DataFrame:
    """Write stage output + per-partition lineage (north_rule), return the
    re-read DF (truncates lineage, makes the stage resumable)."""
    spark = df.sparkSession
    data, lineage, done = _stage_paths(work_dir, stage)
    df.write.mode("overwrite").parquet(data)
    out = spark.read.parquet(data)
    out.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count("*").alias("rows")
    ).withColumn("stage", F.lit(stage)).write.mode("overwrite").parquet(lineage)
    with open(done, "w") as f:
        f.write("ok\n")
    return out


def stage_done(work_dir: str, stage: str) -> bool:
    _, _, done = _stage_paths(work_dir, stage)
    return os.path.exists(done)


def load_stage(spark: SparkSession, work_dir: str, stage: str) -> DataFrame:
    data, _, _ = _stage_paths(work_dir, stage)
    return spark.read.parquet(data)


def _resumable(spark, work_dir, stage, build_fn, resume: bool, caches: list | None = None):
    """caches: DataFrames persisted by build_fn's internals; once the stage
    is checkpointed (durable), they are unpersisted — without this, every
    stage's intermediate caches survive the whole run."""
    if resume and work_dir and stage_done(work_dir, stage):
        return load_stage(spark, work_dir, stage)
    df = build_fn()
    if work_dir:
        out = checkpoint_stage(df, work_dir, stage)
        for c in caches or ():
            c.unpersist()
        return out
    return df


@dataclass
class PipelineResult:
    triples: DataFrame
    nodes: DataFrame
    edges: DataFrame
    cooc: CoocResult | None
    embeddings: DataFrame | None
    cost_history: list[float]


def default_weights() -> dict[str, float]:
    """All template predicates at weight 1.0 (the graft corpus's closed
    vocabulary; the reference requires an explicit weights map — F1)."""
    return {pred: 1.0 for pred, _ in PHRASE_TO_PRED.values()}


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    alias_df: DataFrame,
    aliases: list[str],
    config: PipelineConfig,
    *,
    work_dir: str | None = None,
    resume: bool = True,
    train: bool = True,
    n_shards: int | None = None,
    batch: int = 4096,
) -> PipelineResult:
    config.check()
    weights = config.weights or default_weights()

    # -- load + extract (graft surface; byte parity gated elsewhere) --------
    def build_pages():
        # extract FIRST, dedup after: the tier's one shuffle then carries
        # ~300B of text per page instead of multi-KB html — the shuffle is
        # the tier's floor once the scan is trie-optimized (latest_texts);
        # min_parallelism guards the CPU-bound UDF from byte-coalescing
        target = spark.sparkContext.defaultParallelism * 2
        texted = with_extracted_text(pages, min_parallelism=target).select(
            "url", "warc_ts", "lang", F.col("extracted_text").alias("text")
        )
        return latest_texts(texted, target_partitions=target)

    pages_ck = _resumable(spark, work_dir, "extract", build_pages, resume)

    # -- triples ------------------------------------------------------------
    def build_triples():
        surface = extract_surface_triples(pages_ck, aliases, text_col="text")
        linked = link_triples(surface, alias_df)
        return linked.select(
            "subj", "pred", "obj",
            F.when(F.col("kind") == "literal", F.lit(2)).otherwise(F.lit(0)).alias("obj_kind"),
            "url",
        )

    triples = _resumable(spark, work_dir, "triples", build_triples, resume)

    return run_graph_pipeline(
        spark, triples, config,
        work_dir=work_dir, resume=resume, train=train,
        n_shards=n_shards, batch=batch, weights=weights,
    )


def run_graph_pipeline(
    spark: SparkSession,
    triples: DataFrame,
    config: PipelineConfig,
    *,
    work_dir: str | None = None,
    resume: bool = True,
    train: bool = True,
    n_shards: int | None = None,
    batch: int = 4096,
    weights: dict[str, float] | None = None,
) -> PipelineResult:
    """The reference's own entry shape (Main.runProgram, Main.java:29-78):
    RDF triples in -> graph -> similarity edges -> BCA -> GloVe -> filtered
    embeddings. `run_pipeline` (web pages in) delegates here after its
    extraction tier; a reference user pointing at a .ttl file enters here
    directly (cli --rdf-input / config `graph:`).

    weights: predicate -> weight (F1). The reference requires an explicit
    map (NPEs without one, Rdf2GrphConverter.java:96); absent one we weight
    every observed predicate 1.0 — graceful where upstream crashes, and the
    predicate dictionary is <= 127 entries by contract (A2)."""
    config.check()
    _weights_memo = {"w": weights if weights is not None else (config.weights or None)}

    def get_weights() -> dict[str, float]:
        # lazy: the predicate scan only runs if a stage actually BUILDS
        # (fully-resumed runs load every stage from checkpoint and never
        # need the map — don't pay a full triples pass for it)
        if _weights_memo["w"] is None:
            _weights_memo["w"] = {
                r["pred"]: 1.0 for r in triples.select("pred").distinct().collect()
            }
        return _weights_memo["w"]

    # -- graph materialization (F1/A1/A2) -----------------------------------
    node_caches: list = []

    def build_nodes_fn():
        nodes, edges, _ = materialize_graph(triples, get_weights(), cache_registry=node_caches)
        return nodes

    nodes = _resumable(spark, work_dir, "nodes", build_nodes_fn, resume, caches=node_caches)

    def build_edges_fn():
        # rebuild against the checkpointed node dictionary for id stability
        from .graph.materialize import build_edge_types, build_edges, filter_by_predicate_weights

        weighted = filter_by_predicate_weights(triples, get_weights())
        etypes = build_edge_types(weighted)
        return build_edges(weighted, nodes, etypes)

    edges = _resumable(spark, work_dir, "edges", build_edges_fn, resume)

    # -- canonicalization (J1/J2) -------------------------------------------
    if config.similarity:
        def build_sim():
            pairs = all_similarity_pairs(nodes, config.similarity)
            return similarity_edges(pairs) if pairs is not None else edges.limit(0)

        sim_edges = _resumable(spark, work_dir, "sim_edges", build_sim, resume)
        all_edges = edges.unionByName(sim_edges)
    else:
        all_edges = edges

    # -- BCA co-occurrence ---------------------------------------------------
    cooc_caches: list = []

    def build_cooc():
        res = bca_cooccurrence(
            nodes, all_edges,
            alpha=config.bca.alpha, epsilon=config.bca.epsilon,
            directed=config.bca.directed, normalize=config.bca.normalize,
        )
        cooc_caches.append(res.cooc)  # persisted inside bca_cooccurrence
        return res.cooc

    cooc_df = _resumable(spark, work_dir, "cooc", build_cooc, resume, caches=cooc_caches)
    # co_count/max_x/vocab are one full aggregate pass each — checkpoint
    # them next to the cooc stage so a fully-resumed run loads three
    # numbers instead of re-scanning a potentially billions-row table
    meta_path = os.path.join(work_dir, "cooc", "_meta.json") if work_dir else None
    meta = None
    if resume and meta_path and os.path.exists(meta_path) and stage_done(work_dir, "cooc"):
        with open(meta_path) as f:
            meta = json.load(f)
    if meta is None:
        agg = cooc_df.agg(F.count("*").alias("n"), F.max("x").alias("mx")).collect()[0]
        meta = {
            "co_count": int(agg["n"]),
            "max_x": float(agg["mx"]) if agg["mx"] is not None else 0.0,
            "vocab_size": nodes.count(),
        }
        if meta_path:
            with open(meta_path, "w") as f:
                json.dump(meta, f)
    cooc = CoocResult(
        cooc=cooc_df, vocab_size=meta["vocab_size"], co_count=meta["co_count"],
        max_x=meta["max_x"],
    )

    embeddings = None
    history: list[float] = []
    if train:
        ckpt = os.path.join(work_dir, "params") if work_dir else None
        # mid-run training resume (north_rule): pick up from the last
        # COMPLETE per-epoch params checkpoint (parquet _SUCCESS marker)
        start_params, start_epoch = None, 0
        if resume and ckpt is not None:
            done_epochs = find_completed_epochs(ckpt)
            conv = converged_epoch(ckpt)
            finished = done_epochs and (
                max(done_epochs) + 1 >= config.opt.maxiter
                # the prior run's tolerance break is as final as maxiter:
                # resuming past it would retrain and CHANGE the embeddings
                or (conv is not None and conv <= max(done_epochs))
            )
            if finished:
                start_epoch = config.opt.maxiter
                start_params = resume_params(spark, ckpt, max(done_epochs))
            elif done_epochs:
                start_epoch = max(done_epochs) + 1
                start_params = resume_params(spark, ckpt, max(done_epochs))
        res = optimize(
            cooc.cooc, nodes,
            dim=config.dim, co_count=cooc.co_count, max_x=cooc.max_x,
            cost=config.method, method=config.opt.method,
            maxiter=config.opt.maxiter, tolerance=config.opt.tolerance,
            seed=config.seed, n_shards=n_shards, batch=batch,
            checkpoint_dir=ckpt, start_params=start_params, start_epoch=start_epoch,
        )
        history = res.cost_history
        trained_now = len(history) > 0  # history holds NEW epochs only
        if not trained_now and resume and work_dir and stage_done(work_dir, "embeddings"):
            # fully-resumed run: no epoch executed, so the checkpointed
            # embeddings are current — skip the join + PCA refit
            embeddings = load_stage(spark, work_dir, "embeddings")
        else:
            vecs = extract_embeddings(res.params)
            if config.pca is not None:
                # the reference declares pca.variance in every shipped config
                # but left the reduction TODO (Main.java:43-44) — real here
                from .glove.pca import pca_reduce

                vecs = pca_reduce(vecs, config.pca.variance)
            embeddings = vecs.join(nodes, "node_id").select(
                "node_id", "label", "node_type", "vec"
            )
            embeddings = _resumable(spark, work_dir, "embeddings", lambda: embeddings, False)
        if work_dir:
            export_dir = os.path.join(work_dir, "export")
            export_done = os.path.join(export_dir, "_DONE")
            # two global sorts: only re-export when something trained or the
            # prior export never finished
            if trained_now or not resume or not os.path.exists(export_done):
                filtered = filter_embeddings(embeddings, config.output)
                write_tsv(filtered, export_dir, config.output.name, config=config)
                with open(export_done, "w") as f:
                    f.write("ok\n")

    return PipelineResult(
        triples=triples, nodes=nodes, edges=all_edges, cooc=cooc,
        embeddings=embeddings, cost_history=history,
    )
