"""Full-build profiler: end-to-end build_index wall time at local[N].
Usage: python scripts/profile_build.py <cpus> <replicate> [doc_mult]
"""
import json, os, shutil, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import SparkSession, functions as F
import evparse

cpus = int(sys.argv[1]); rep = int(sys.argv[2])
mult = int(sys.argv[3]) if len(sys.argv) > 3 else 8
shards = int(sys.argv[4]) if len(sys.argv) > 4 else 32
SF_DIR = "/root/testdata/sf0.1"
evdir = tempfile.mkdtemp(prefix="evb_")

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .appName(f"profb-{cpus}")
         .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 32)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.driver.memory", "24g")
         .config("spark.eventLog.enabled", "true")
         .config("spark.eventLog.compress", "false")
         .config("spark.eventLog.dir", evdir)
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from elastic_indexer4s_spark import driver_contract as dc
from elastic_indexer4s_spark.config import IndexConfig
from elastic_indexer4s_spark.operators.build import build_index

docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
n_base = docs.count()
reps = spark.range(rep).select(F.col("id").alias("rep"))
big = (docs.crossJoin(reps)
       .select((F.col("doc_id") + F.col("rep") * F.lit(n_base)).alias("doc_id"),
               F.concat_ws(" ", *([F.col("text")] * mult)).alias("text"),
               "lang", "source", "n_chars")
       .repartition(64))
corpus = dc.corpus_shaped(big)
cfg = IndexConfig(num_shards=shards)
gen = os.path.join(tempfile.gettempdir(), f"profb_{cpus}")
shutil.rmtree(gen, ignore_errors=True)

t = time.monotonic()
res = build_index(spark, corpus, cfg, gen)
total = time.monotonic() - t
n_docs = n_base * rep
print("BUILD " + json.dumps({"cpus": cpus, "rep": rep, "mult": mult,
                             "shards": shards,
                             "n_docs": n_docs, "total": round(total, 2),
                             "files_per_sec": round(n_docs / total, 1),
                             "stages": [str(s) for s in res.succeeded_stages]}))
shutil.rmtree(gen, ignore_errors=True)
spark.stop()
evparse.print_stages(evparse.stage_metrics(evdir))
shutil.rmtree(evdir, ignore_errors=True)
