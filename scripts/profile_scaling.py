"""One-off profiler: time each build stage at a given local[N].
Usage: python scripts/profile_scaling.py <cpus> <replicate> [doc_mult]
"""
import json, os, shutil, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F

cpus = int(sys.argv[1]); rep = int(sys.argv[2])
mult = int(sys.argv[3]) if len(sys.argv) > 3 else 8
SF_DIR = "/root/testdata/sf0.1"

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .appName(f"prof-{cpus}")
         .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 32)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.driver.memory", "24g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from elastic_indexer4s_spark import driver_contract as dc
from elastic_indexer4s_spark.config import IndexConfig
from elastic_indexer4s_spark.operators import build as B

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
gen = os.path.join(tempfile.gettempdir(), f"prof_{cpus}")
shutil.rmtree(gen, ignore_errors=True)
os.makedirs(gen, exist_ok=True)

stages = {}
t = time.monotonic()
docs_tok = B.tokenized_docs(corpus, cfg).persist()
docs_tok.count()
stages["tokenize_persist"] = round(time.monotonic() - t, 2)

t = time.monotonic()
(docs_tok.select(*B.DOCLEN_COLS).repartition(cfg.num_shards, "shard")
 .write.mode("overwrite").partitionBy("shard")
 .parquet(os.path.join(gen, "doclen")))
stages["doclen"] = round(time.monotonic() - t, 2)

t = time.monotonic()
tf_df = B.term_frequencies(docs_tok)
postings = B.build_postings_stream(tf_df, cfg)
(postings.write.mode("overwrite").partitionBy("shard")
 .parquet(os.path.join(gen, "postings")))
stages["postings"] = round(time.monotonic() - t, 2)

t = time.monotonic()
p = spark.read.parquet(os.path.join(gen, "postings"))
(p.groupBy("term").agg(F.sum("df").alias("df")).coalesce(1)
 .write.mode("overwrite").parquet(os.path.join(gen, "dictionary")))
stages["dictionary"] = round(time.monotonic() - t, 2)

total = sum(stages.values())
print("PROFILE " + json.dumps({"cpus": cpus, "rep": rep, "mult": mult,
                               "n_docs": n_base * rep,
                               "stages": stages, "total": total,
                               "files_per_sec": round(n_base * rep / total, 1)}))
shutil.rmtree(gen, ignore_errors=True)
spark.stop()
