"""Interleaved A/B: EI4S_TOK_DEDUP=0 vs 1 build throughput, fresh JVM per
run (host-noise discipline: interleave and take best-of-N per arm)."""
import json
import os
import subprocess
import sys
import time

RUNS = int(os.environ.get("AB_RUNS", "3"))
REPL = os.environ.get("AB_REPLICATE", "40")

CHILD = r"""
import sys, os, time, shutil, tempfile
sys.path.insert(0, "/root/repo")
from elastic_indexer4s_spark.config import tuned_builder, IndexConfig
from elastic_indexer4s_spark.operators.build import build_index
from elastic_indexer4s_spark.results import RunResult
from elastic_indexer4s_spark import driver_contract as dc
from pyspark.sql import functions as F
spark = tuned_builder("local[32]", "ab", shuffle_partitions=32).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
sfd = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
docs = spark.read.parquet(os.path.join(sfd, "documents.parquet"))
n_base = docs.count()
REPL = int(os.environ["AB_REPLICATE"])
reps = spark.range(REPL).select(F.col("id").alias("rep"))
big = (docs.crossJoin(reps)
       .select((F.col("doc_id") + F.col("rep") * F.lit(n_base)).alias("doc_id"),
               "text", "lang", "source", "n_chars").repartition(64))
corpus_path = os.path.join(tempfile.gettempdir(), "ei4s_ab_corpus")
if not os.path.exists(corpus_path + "/_SUCCESS"):
    dc.corpus_shaped(big).write.mode("overwrite").parquet(corpus_path)
corpus = spark.read.parquet(corpus_path)
gen = os.path.join(tempfile.gettempdir(), "ei4s_ab_gen")
shutil.rmtree(gen, ignore_errors=True)
cfg = IndexConfig(num_shards=32, block_size=128)
t0 = time.monotonic()
res = build_index(spark, corpus, cfg, gen)
dt = time.monotonic() - t0
assert isinstance(res, RunResult), str(res)
print(f"AB_RESULT {dt:.3f} {n_base * REPL}")
"""


def run(flag: str) -> float:
    env = dict(os.environ, EI4S_TOK_DEDUP=flag, AB_REPLICATE=REPL)
    out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                         capture_output=True, text=True, timeout=600)
    for line in out.stdout.splitlines():
        if line.startswith("AB_RESULT"):
            _, dt, nd = line.split()
            return float(dt), int(nd)
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


a, b = [], []
nd = 0
for i in range(RUNS):
    dt, nd = run("0"); a.append(dt)
    dt, nd = run("1"); b.append(dt)
    print(f"round {i}: A={a[-1]:.2f}s B={b[-1]:.2f}s", flush=True)
ba, bb = min(a), min(b)
print(json.dumps({"replicate": int(REPL), "docs": nd,
                  "A_best_sec": ba, "B_best_sec": bb,
                  "A_files_per_sec": round(nd / ba, 1),
                  "B_files_per_sec": round(nd / bb, 1),
                  "speedup_B_over_A": round(ba / bb, 3)}))
