"""Bisect the postings-stage pipeline: time each sub-plan separately at one
parallelism level (fresh JVM per invocation).

Usage: python scripts/diag_postings.py <cpus> [rep]
Sub-plans (noop writes force full materialization, no output cost):
  A1 tokenize+explode           (scan stage only)
  A2 docs_tok                   (+ doc-id window exchange)
  B  term_frequencies           (+ tf hash agg)
  C  repartition+sort+encode    (+ shard exchange, sort, mapInPandas codec)
  D  C + parquet write          (real output)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elastic_indexer4s_spark import driver_contract as dc  # noqa: E402
from elastic_indexer4s_spark.config import IndexConfig, tuned_builder  # noqa: E402
from elastic_indexer4s_spark.functions.tokenizer import tokens_expr  # noqa: E402
from elastic_indexer4s_spark.operators.build import (  # noqa: E402
    build_postings_stream, term_frequencies, tokenized_docs,
)

CPUS = int(sys.argv[1])
REP = int(sys.argv[2]) if len(sys.argv) > 2 else 60
CORPUS = os.path.join(tempfile.gettempdir(), f"ei4s_diag_corpus_{REP}")

spark = tuned_builder(f"local[{CPUS}]", f"ei4s-diagp-{CPUS}",
                      shuffle_partitions=max(CPUS * 2, 32)).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
cfg = IndexConfig(num_shards=32)
corpus = dc.corpus_shaped(spark.read.parquet(CORPUS))


def t(label, df, fmt="noop", path=None):
    t0 = time.monotonic()
    w = df.write.mode("overwrite").format(fmt)
    if path:
        shutil.rmtree(path, ignore_errors=True)
        w.save(path)
    else:
        w.save()
    print(f"  {label:<42} {time.monotonic() - t0:7.2f}s", flush=True)


print(f"local[{CPUS}] rep={REP}")
raw = corpus.withColumn("tokens", tokens_expr(F.col("content"), cfg.tokenizer))
t("A1 tokenize (scan only)",
  raw.select(F.size("tokens").alias("dl")))
t("A1b tokenize+explode (scan only)",
  raw.select(F.explode("tokens").alias("term")))
docs_tok = tokenized_docs(corpus, cfg)
t("A2 docs_tok (+id window exchange)", docs_tok.drop("tokens"))
tf = term_frequencies(docs_tok)
t("B  tf agg (explode+hashagg)", tf)
enc = build_postings_stream(tf, cfg)
t("C  B + shard exchange+sort+encode", enc)
t("D  C + parquet write", enc,
  fmt="parquet", path=os.path.join(tempfile.gettempdir(), "ei4s_diag_post"))
spark.stop()
