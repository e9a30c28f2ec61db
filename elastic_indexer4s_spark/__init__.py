"""elastic_indexer4s_spark — a PySpark-native full-text index build + BM25
query engine with the capabilities of yannick-cw/elastic-indexer4s.

The reference (Scala/Akka, /root/reference) streams typed documents into an
Elasticsearch bulk sink and manages index lifecycle (threshold-gated alias
switch, retention GC).  This engine internalizes what the reference delegates
to Elasticsearch — tokenization, inverted-index construction, BM25 top-k
search — as first-class Spark dataflow, and re-expresses the lifecycle
operators over Parquet index "generations".

Layout:
  functions/   tokenizers (vectorized), varint/FOR posting codec, text stats
  operators/   doc-id assignment, index build, BM25 query, dedup, similarity
  plans/       lifecycle: catalog, alias switching, retention GC, stage railway
  sources/     corpus readers (parquet; iceberg behind import-try)
  streaming/   throughput meter, incremental (foreachBatch) index build
"""

__version__ = "0.1.0"
