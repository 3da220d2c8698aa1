"""CLI entry (spark-submit surface) + streaming ingestion + YAML config."""

from __future__ import annotations

import json
import textwrap

import pytest
from pyspark.sql import functions as F


def test_load_config_yaml(tmp_path):
    from graph_embeddings_spark.config import load_config

    cfg_file = tmp_path / "c.yml"
    cfg_file.write_text(textwrap.dedent("""
        graph: pages.parquet
        method: pglove
        dim: 64
        seed: 7
        weights:
          works_at: 1.0
          born_in: 0.5
        similarity:
          - sourcePredicate: p:name
            method: ngram-jaccard
            threshold: 0.7
            ngram: 2
        bca:
          alpha: 0.2
          epsilon: 0.001
          directed: true
          normalize: unity
        opt:
          method: amsgrad
          tolerance: 1.0e-6
          maxiter: 10
        output:
          name: emb
          uri: ["http://"]
          literal: []
    """))
    cfg = load_config(str(cfg_file))
    assert cfg.method == "pglove" and cfg.dim == 64 and cfg.seed == 7
    assert cfg.weights == {"works_at": 1.0, "born_in": 0.5}
    g = cfg.similarity[0]
    assert g.method == "ngram_jaccard" and g.ngram == 2 and g.target_predicate == "p:name"
    assert cfg.bca.directed and cfg.bca.normalize == "unity" and cfg.bca.alpha == 0.2
    assert cfg.opt.method == "amsgrad" and cfg.opt.maxiter == 10
    assert cfg.output.enabled_types() == [0, 2]


def test_config_check_rejects_bad():
    from graph_embeddings_spark.config import OptConfig, OutputConfig, PipelineConfig

    with pytest.raises(ValueError):
        PipelineConfig(dim=0, output=OutputConfig(uri=[])).check()
    with pytest.raises(ValueError):
        PipelineConfig(method="word2vec", output=OutputConfig(uri=[])).check()
    with pytest.raises(ValueError):
        PipelineConfig(opt=OptConfig(method="sgd"), output=OutputConfig(uri=[])).check()
    with pytest.raises(ValueError):
        PipelineConfig().check()  # no output group enabled


def test_cli_synthetic_run(tmp_path, capsys, spark):
    from graph_embeddings_spark.cli import main

    rc = main([
        "--synthetic-pages", "60",
        "--work-dir", str(tmp_path / "run"),
        "--no-train",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["triples"] > 0 and out["nodes"] > 0 and out["cooc_entries"] > 0
    assert out["epochs"] == 0


def test_streaming_triples_end_to_end(tmp_path, spark, world):
    """Two file waves through the stream == batch extraction of both waves."""
    from graph_embeddings_spark.corpus import web_pages_df
    from graph_embeddings_spark.extract.triples import extract_surface_triples
    from graph_embeddings_spark.streaming.ingest import (
        read_page_stream,
        start_triples_sink,
        streaming_triples,
    )

    src = tmp_path / "waves"
    out = tmp_path / "triples"
    ckpt = tmp_path / "ckpt"
    pages = web_pages_df(spark, world, 80, partitions=2).filter(F.col("lang") == "en")
    wave1 = pages.filter(F.col("url").contains("/page/1"))
    wave2 = pages.filter(~F.col("url").contains("/page/1"))
    wave1.write.parquet(str(src / "w1"))
    wave2.write.parquet(str(src / "w2"))
    # streaming source reads the directory of parquet part-files
    flat = spark.read.parquet(str(src / "w1"), str(src / "w2"))
    flat.write.mode("overwrite").parquet(str(src / "all"))

    aliases = sorted(world.alias_map)
    stream = read_page_stream(spark, str(src / "all"), max_files_per_trigger=1)
    q = start_triples_sink(
        streaming_triples(stream, aliases), str(out), str(ckpt), trigger_once=True
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(out)).select("url", "subj_surface", "pred", "obj_surface")
    want = extract_surface_triples(
        pages.withColumn("text", F.col("text")), aliases, min_parallelism=0
    ).select("url", "subj_surface", "pred", "obj_surface")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0

    # resume contract: restarting with the same checkpoint adds nothing
    q2 = start_triples_sink(
        streaming_triples(read_page_stream(spark, str(src / "all")), aliases),
        str(out), str(ckpt), trigger_once=True,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(out)).count() == want.count()


def test_cli_rdf_input_end_to_end(tmp_path, capsys, spark):
    """The reference's own workflow (Main.java:29-78): a Turtle file + YAML
    config straight to trained embeddings + TSV export, via the CLI."""
    from graph_embeddings_spark.cli import main

    ttl = tmp_path / "graph.ttl"
    lines = ["@prefix ex: <http://example.org/> ."]
    for i in range(12):
        lines.append(f"ex:p{i} ex:knows ex:p{(i + 1) % 12} .")
        lines.append(f'ex:p{i} ex:name "person {i}" .')
    ttl.write_text("\n".join(lines) + "\n")
    cfg = tmp_path / "run.config.yml"
    cfg.write_text(
        f"graph: {ttl}\n"
        "dim: 4\n"
        "opt:\n  method: adagrad\n  maxiter: 2\n  tolerance: 0.0\n"
        "bca:\n  alpha: 0.3\n  epsilon: 0.001\n"
        "output:\n  uri: []\n  literal: []\n"
    )
    rc = main(["--config", str(cfg), "--work-dir", str(tmp_path / "wd")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["triples"] == 24
    assert out["nodes"] == 24  # 12 URIs + 12 per-predicate literals
    assert out["epochs"] == 2 and out["embeddings"] == 24
    import glob

    vec_parts = glob.glob(str(tmp_path / "wd" / "export" / "*.vectors.tsv" / "part-*"))
    assert vec_parts, "TSV export written"


def test_load_config_reference_shipped_schema(tmp_path):
    """The reference's SHIPPED dblp.config.yml spelling (predicate:,
    method: token, bca reverse/predicates keys, pca block) must load
    verbatim — upstream's own strict bean binding rejects these stale
    keys; we accept them (Configuration.java has no setPredicate and no
    TOKEN enum member)."""
    from graph_embeddings_spark.config import load_config

    p = tmp_path / "dblp.config.yml"
    p.write_text(
        "graph: data/DBLP/dblp-2015-2017.ttl\n"
        "method: pglove\n"
        "dim: 300\n"
        "weights:\n"
        "  http://xmlns.com/foaf/0.1/name: 1\n"
        "similarity:\n"
        "  - predicate: http://xmlns.com/foaf/0.1/name\n"
        "    method: jarowinkler\n"
        "    threshold: 0.95\n"
        "  - predicate: http://purl.org/dc/elements/1.1/title\n"
        "    method: token\n"
        "    threshold: 0.5\n"
        "bca:\n"
        "  alpha: 1e-1\n"
        "  epsilon: 1e-3\n"
        "  reverse: true\n"
        "  directed: true\n"
        "  predicates: true\n"
        "opt:\n"
        "  method: adagrad\n"
        "  tolerance: 1e-4\n"
        "  maxiter: 1000\n"
        "pca:\n"
        "  variance: 0.95\n"
        "output:\n"
        "  uri: [ http://dblp.l3s.de/d2r/resource/authors/ ]\n"
    )
    cfg = load_config(str(p))
    assert cfg.method == "pglove" and cfg.dim == 300
    assert cfg.similarity[0].source_predicate == "http://xmlns.com/foaf/0.1/name"
    assert cfg.similarity[0].target_predicate == cfg.similarity[0].source_predicate
    assert cfg.similarity[0].method == "jarowinkler"
    assert cfg.similarity[1].method == "token_jaccard"
    assert cfg.bca.directed is True
    assert cfg.output.uri == ["http://dblp.l3s.de/d2r/resource/authors/"]
    assert cfg.pca is not None and cfg.pca.variance == 0.95


def test_load_config_pca_defaults(tmp_path):
    """A declared pca block without variance uses the 0.95 default; an
    empty/null block still ENABLES the reduction; a similarity group
    without a predicate is rejected at load time."""
    import pytest

    from graph_embeddings_spark.config import load_config

    base = "graph: g.ttl\ndim: 4\noutput:\n  uri: []\n"
    p1 = tmp_path / "a.yml"
    p1.write_text(base + "pca:\n  enabled: true\n")
    assert load_config(str(p1)).pca.variance == 0.95
    p2 = tmp_path / "b.yml"
    p2.write_text(base + "pca:\n")
    assert load_config(str(p2)).pca is not None
    p3 = tmp_path / "c.yml"
    p3.write_text(base + "similarity:\n  - method: token_jaccard\n    threshold: 0.6\n")
    with pytest.raises(ValueError, match="sourcePredicate"):
        load_config(str(p3))


def test_load_config_pca_explicit_optout(tmp_path):
    """Explicit falsy pca values DISABLE the reduction: `pca: false`,
    `pca: 0`, and `pca: {enabled: false}` — only mapping/null/truthy
    scalars enable it (a declared-but-falsy block used to enable)."""
    from graph_embeddings_spark.config import load_config

    base = "graph: g.ttl\ndim: 4\noutput:\n  uri: []\n"
    for i, (snippet, want_enabled) in enumerate(
        [
            ("pca: false\n", False),
            ("pca: 0\n", False),
            ("pca:\n  enabled: false\n", False),
            ("pca:\n  enabled: 0\n", False),  # int-0 spelling, same convention
            ("pca:\n  enabled: true\n", True),
            ("pca:\n  enabled:\n", True),  # null enabled = not an opt-out
            ("pca: true\n", True),
            ("pca:\n", True),
            ("pca: {}\n", True),
            ("", False),
        ]
    ):
        p = tmp_path / f"pca{i}.yml"
        p.write_text(base + snippet)
        got = load_config(str(p)).pca
        assert (got is not None) == want_enabled, (snippet, got)
