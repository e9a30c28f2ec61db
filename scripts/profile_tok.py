"""Focused probe: tokenize-stage cost at local[N], with knobs.
Usage: python scripts/profile_tok.py <cpus> <rep> <persist:0|1> <heap_gb> [mult]
Prints GC time and executor CPU time from the JVM.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F

cpus, rep, do_persist, heap = (int(sys.argv[1]), int(sys.argv[2]),
                               int(sys.argv[3]), int(sys.argv[4]))
mult = int(sys.argv[5]) if len(sys.argv) > 5 else 8
SF_DIR = "/root/testdata/sf0.1"

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 32)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.driver.memory", f"{heap}g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from elastic_indexer4s_spark import driver_contract as dc
from elastic_indexer4s_spark.config import IndexConfig
from elastic_indexer4s_spark.operators import build as B


def gc_millis():
    jvm = spark.sparkContext._jvm
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
n_base = docs.count()
reps = spark.range(rep).select(F.col("id").alias("rep"))
big = (docs.crossJoin(reps)
       .select((F.col("doc_id") + F.col("rep") * F.lit(n_base)).alias("doc_id"),
               F.concat_ws(" ", *([F.col("text")] * mult)).alias("text"),
               "lang", "source", "n_chars")
       .repartition(64))
corpus = dc.corpus_shaped(big)
cfg = IndexConfig(num_shards=32)

docs_tok = B.tokenized_docs(corpus, cfg)
if do_persist:
    docs_tok = docs_tok.persist()
g0 = gc_millis(); t = time.monotonic()
n = docs_tok.count()
wall = time.monotonic() - t; g1 = gc_millis()
print("TOK " + json.dumps({"cpus": cpus, "persist": do_persist, "heap": heap,
                           "n": n, "wall": round(wall, 2),
                           "gc_sec": round((g1 - g0) / 1000, 2)}))
spark.stop()
