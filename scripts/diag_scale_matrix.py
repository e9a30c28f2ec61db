"""Scaling-inflation matrix: which build component inflates CPU with threads?

Pre-materializes the amplified corpus to parquet ONCE (untimed), then runs
isolated variants at several local[N] levels, each in a fresh taskset-pinned
JVM, printing wall seconds:

  tok      parquet scan -> tokens_expr -> sum(size(tokens))       (no shuffle)
  sha      parquet scan -> sha2(content) -> agg                   (no shuffle)
  full     tokenized_docs() (sha+tok+doc-id exchange) -> agg      (1 shuffle)
  harness  same as `full` but input = crossJoin+concat_ws harness (current bench)

Usage: python scripts/diag_scale_matrix.py [rep] [mult] [cpus...]
"""
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(sys.argv[1]) if len(sys.argv) > 1 else 60
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 8
CPUS = [int(c) for c in sys.argv[3:]] or [2, 8, 32]
CORPUS = os.path.join(tempfile.gettempdir(), f"ei4s_matrix_corpus_{REP}_{MULT}")

PREP = r'''
import os, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from elastic_indexer4s_spark import driver_contract as dc
spark = (SparkSession.builder.master("local[32]")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "24g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(os.path.join({sf_dir!r}, "documents.parquet"))
n_base = docs.count()
reps = spark.range({rep}).select(F.col("id").alias("rep"))
big = (docs.crossJoin(reps)
       .select((F.col("doc_id") + F.col("rep") * F.lit(n_base)).alias("doc_id"),
               F.concat_ws(" ", *([F.col("text")] * {mult})).alias("text"),
               "lang", "source", "n_chars")
       .repartition(64))
dc.corpus_shaped(big).write.mode("overwrite").parquet({corpus!r})
spark.stop()
'''

RUN = r'''
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from elastic_indexer4s_spark import driver_contract as dc
from elastic_indexer4s_spark.config import IndexConfig, tuned_builder
from elastic_indexer4s_spark.functions.tokenizer import tokens_expr
from elastic_indexer4s_spark.operators import build as B
cpus, variant = int(sys.argv[1]), sys.argv[2]
spark = tuned_builder(f"local[{{cpus}}]", f"mx-{{cpus}}-{{variant}}",
                      shuffle_partitions=max(cpus * 2, 32)).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
cfg = IndexConfig(num_shards=32)

def corpus_parquet():
    return spark.read.parquet({corpus!r})

def corpus_harness():
    docs = spark.read.parquet(os.path.join({sf_dir!r}, "documents.parquet"))
    n_base = docs.count()
    reps = spark.range({rep}).select(F.col("id").alias("rep"))
    big = (docs.crossJoin(reps)
           .select((F.col("doc_id") + F.col("rep") * F.lit(n_base)).alias("doc_id"),
                   F.concat_ws(" ", *([F.col("text")] * {mult})).alias("text"),
                   "lang", "source", "n_chars")
           .repartition(64))
    return dc.corpus_shaped(big)

def act_tok(df):
    return df.select(tokens_expr(F.col("content"), cfg.tokenizer).alias("t")) \
             .select(F.sum(F.size("t"))).collect()

def act_sha(df):
    return df.select(F.sha2(F.col("content"), 256).alias("s")) \
             .select(F.sum(F.length("s"))).collect()

def act_full(df):
    dt = B.tokenized_docs(df, cfg)
    return dt.select(F.sum("dl"), F.count("sha256")).collect()

plans = {{
    "tok": (corpus_parquet, act_tok),
    "sha": (corpus_parquet, act_sha),
    "full": (corpus_parquet, act_full),
    "harness": (corpus_harness, act_full),
}}
src, act = plans[variant]
df = src()
t0 = time.monotonic()
act(df)
wall = time.monotonic() - t0
print("RES " + json.dumps({{"cpus": cpus, "variant": variant,
                            "wall": round(wall, 2)}}))
spark.stop()
'''


def sh(code: str, argv: list[str], cpus: int | None = None) -> str:
    script = os.path.join(tempfile.gettempdir(), "ei4s_matrix_run.py")
    with open(script, "w") as f:
        f.write(code)
    cmd = [sys.executable, script] + argv
    if cpus:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RES "):
            return line[4:]
    if "RES" not in out.stdout:
        sys.stderr.write(out.stdout[-1500:] + out.stderr[-1500:])
    return ""


def main() -> None:
    fmt = dict(repo=REPO, sf_dir=SF_DIR, rep=REP, mult=MULT, corpus=CORPUS)
    if not os.path.exists(CORPUS):
        print("materializing corpus ...", file=sys.stderr)
        subprocess.run([sys.executable, "-c", PREP.format(**fmt)],
                       check=True, timeout=1800)
    results = []
    for variant in ("tok", "sha", "full", "harness"):
        walls = {}
        for cpus in CPUS:
            r = sh(RUN.format(**fmt), [str(cpus), variant], cpus=cpus)
            if r:
                d = json.loads(r)
                walls[cpus] = d["wall"]
                print(f"  {variant} local[{cpus}]: {d['wall']}s",
                      file=sys.stderr)
        effs = {}
        for lo, hi in zip(CPUS, CPUS[1:]):
            if lo in walls and hi in walls:
                effs[f"{lo}->{hi}"] = round(
                    (walls[lo] / walls[hi]) / (hi / lo), 3)
        results.append({"variant": variant, "walls": walls, "eff": effs})
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
