"""spark-submit entry point (north_rule: "run via spark-submit --py-files").

Usage on a cluster (master/memory come from spark-submit):

    zip -r geslib.zip graph_embeddings_spark
    spark-submit --py-files geslib.zip -m graph_embeddings_spark.cli \\
        --config config.yml --input /path/to/web_pages --work-dir /path/out

    # sandbox smoke (synthetic corpus, local master from session.get_spark):
    python -m graph_embeddings_spark.cli --synthetic-pages 500 \\
        --work-dir /tmp/kg_run

The config YAML is the reference's schema (util/config/Configuration.java
fields; see config.load_config). --input points at a table of web pages
(url, warc_ts, html, text, lang) in parquet or Iceberg (any format
spark.read supports via --input-format).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="graph_embeddings_spark")
    p.add_argument("--config", help="reference-schema YAML config")
    p.add_argument("--input", help="web-pages table path (url, warc_ts, html, text, lang)")
    p.add_argument("--input-format", default="parquet", help="parquet|iceberg|...")
    p.add_argument("--rdf-input", help="RDF graph file/dir (the reference's own input "
                   "shape, Main.java:29-78): skips the web-extraction tier and runs "
                   "materialize -> similarity -> BCA -> GloVe. Defaults to the "
                   "config's `graph:` path when a config is given and no --input.")
    p.add_argument("--rdf-format", default=None, help="ntriples|turtle|rdfxml "
                   "(default: autodetect from extension)")
    p.add_argument("--alias-dict", help="alias table path (alias, entity_id, prior); "
                                        "defaults to the synthetic world's dictionary")
    p.add_argument("--work-dir", required=True, help="checkpoint/output directory")
    p.add_argument("--synthetic-pages", type=int, default=0,
                   help="generate N synthetic pages instead of reading --input")
    p.add_argument("--no-train", action="store_true", help="stop after co-occurrence")
    p.add_argument("--no-resume", action="store_true", help="ignore existing checkpoints")
    p.add_argument("--n-shards", type=int, default=None)
    p.add_argument("--batch", type=int, default=4096)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    from .config import OutputConfig, PipelineConfig, load_config
    from .corpus import alias_dict_df, build_world, web_pages_df
    from .pipeline import run_pipeline
    from .session import get_spark

    # under spark-submit an active session exists; standalone we build one
    spark = SparkSession.getActiveSession() or get_spark("graph-embeddings-spark")

    if args.config:
        cfg = load_config(args.config)
    else:
        cfg = PipelineConfig(output=OutputConfig(uri=[], blank=[], literal=[]))

    rdf_path = args.rdf_input or (
        cfg.graph if (args.config and cfg.graph and not args.input and not args.synthetic_pages) else None
    )
    if rdf_path:
        # the reference's own workflow: RDF file -> embeddings
        from .pipeline import run_graph_pipeline
        from .sources.reader import read_rdf

        triples = read_rdf(spark, rdf_path, fmt=args.rdf_format)
        res = run_graph_pipeline(
            spark, triples, cfg,
            work_dir=args.work_dir, resume=not args.no_resume,
            train=not args.no_train, n_shards=args.n_shards, batch=args.batch,
        )
    else:
        world = build_world(cfg.seed, 120)
        if args.synthetic_pages:
            pages = web_pages_df(spark, world, args.synthetic_pages)
        elif args.input:
            pages = spark.read.format(args.input_format).load(args.input)
        else:
            print("error: need --input, --rdf-input or --synthetic-pages", file=sys.stderr)
            return 2

        if args.alias_dict:
            alias_df = spark.read.parquet(args.alias_dict)
        else:
            alias_df = alias_dict_df(spark, world)
        aliases = [r["alias"] for r in alias_df.select("alias").distinct().collect()]

        res = run_pipeline(
            spark, pages, alias_df, aliases, cfg,
            work_dir=args.work_dir, resume=not args.no_resume,
            train=not args.no_train, n_shards=args.n_shards, batch=args.batch,
        )
    summary = {
        "triples": res.triples.count(),
        "nodes": res.nodes.count(),
        "edges": res.edges.count(),
        "cooc_entries": res.cooc.co_count if res.cooc else None,
        "epochs": len(res.cost_history),
        "final_cost": res.cost_history[-1] if res.cost_history else None,
        "embeddings": res.embeddings.count() if res.embeddings is not None else None,
        "work_dir": args.work_dir,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
