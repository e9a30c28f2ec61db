"""spark-submit entry point for the index build (north rule: "the whole
pipeline runs via spark-submit --py-files on multi-executor clusters").

Run through scripts/spark_submit_build.py, which zips the engine package and
invokes:

    spark-submit --master local[N] --py-files ei4s.zip \
        scripts/submit_job.py --sf-dir ... --replicate R --shards S

On a real cluster the same command line takes ``--master yarn``/``k8s://...``
— nothing in the job is local-mode-specific: the engine package arrives on
every executor's PYTHONPATH via --py-files, the corpus is read from shared
storage, and the output generation directory must be on shared storage.

The corpus is the driver-generated `documents` table replicated with shifted
doc ids (deterministic, no external data), same shape as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=8)
    ap.add_argument("--doc-mult", type=int, default=8)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--out", default="")
    ap.add_argument("--keep", action="store_true",
                    help="keep the generation dir (default: clean up)")
    args = ap.parse_args()

    # imports resolved from the --py-files zip (or the repo when run locally)
    from pyspark.sql import SparkSession, functions as F
    from elastic_indexer4s_spark import driver_contract as dc
    from elastic_indexer4s_spark.config import IndexConfig
    from elastic_indexer4s_spark.operators.build import build_index
    from elastic_indexer4s_spark.results import RunResult

    spark = SparkSession.builder.appName("ei4s-submit-build").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    n_base = docs.count()
    reps = spark.range(args.replicate).select(F.col("id").alias("rep"))
    big = (docs.crossJoin(reps)
           .select((F.col("doc_id") + F.col("rep") * F.lit(n_base))
                   .alias("doc_id"),
                   F.concat_ws(" ", *([F.col("text")] * args.doc_mult))
                   .alias("text"),
                   "lang", "source", "n_chars")
           .repartition(64))
    corpus = dc.corpus_shaped(big)

    gen = args.out or os.path.join(tempfile.gettempdir(), "ei4s_submit_gen")
    shutil.rmtree(gen, ignore_errors=True)
    t0 = time.monotonic()
    res = build_index(spark, corpus, IndexConfig(num_shards=args.shards), gen)
    build_sec = time.monotonic() - t0
    if not isinstance(res, RunResult):
        print(f"BUILD FAILED: {res}", file=sys.stderr)
        sys.exit(2)

    n_docs = n_base * args.replicate
    print("RESULT " + json.dumps({
        "master": spark.sparkContext.master,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 2),
        "files_per_sec": round(n_docs / build_sec, 1),
        "stages": [str(s) for s in res.succeeded_stages],
    }))
    if not args.keep:
        shutil.rmtree(gen, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
