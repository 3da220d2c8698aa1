"""graph_embeddings_spark — a from-scratch PySpark-native KG-construction + GloVe engine.

Re-expresses the capabilities of the reference (Phaken/graph-embeddings, a single-JVM
Java RDF->embedding tool; see SURVEY.md) as composable DataFrame stages:

    web_pages (url, warc_ts, html, text, lang)
      -> extract.text      : deterministic HTML -> text (pandas UDF, byte-exact)
      -> extract.mentions  : broadcast alias-dict mention detection + entity linking
      -> extract.triples   : OpenIE-style (subj, pred, obj) extraction
      -> graph.materialize : predicate-weight filter, vertex identity, edge dictionary
      -> graph.canonicalize: MinHash-LSH similarity join (reference's all-pairs compare)
      -> graph.bca         : iterative paint-propagation co-occurrence (BCA)
      -> glove.train       : GloVe/PGloVe + AdaGrad/Adam/AMSGrad over cooc shards
      -> io.writer         : filtered embedding export (parquet + TSV parity)

Plus training-data-pipeline operators (textops/: dedup, ANN, quality scoring) and
streaming ingest (streaming/).
"""

__version__ = "0.1.0"
