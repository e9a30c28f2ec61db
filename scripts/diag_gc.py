"""GC-config experiment: the hot sub-plan (tokenize+explode+tf-agg noop) at
local[32] under different collector configs, interleaved, fresh JVM each.

Usage: python scripts/diag_gc.py [rounds]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.path.join(tempfile.gettempdir(), "ei4s_diag_corpus_60")

CONFIGS = {
    "parallel-24g": ("24g", "-XX:+UseParallelGC"),
    "parallel-24g-pretouch": ("24g", "-XX:+UseParallelGC -Xms24g -XX:+AlwaysPreTouch"),
    "g1-24g-pinned": ("24g", "-XX:+UseG1GC -Xms24g"),
    "parallel-8g-pinned": ("8g", "-XX:+UseParallelGC -Xms8g"),
}

RUN_SRC = r'''
import os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from elastic_indexer4s_spark import driver_contract as dc
from elastic_indexer4s_spark.config import IndexConfig
from elastic_indexer4s_spark.functions.tokenizer import tokens_expr
from elastic_indexer4s_spark.operators.build import term_frequencies, tokenized_docs

mem, opts = sys.argv[1], sys.argv[2]
spark = (SparkSession.builder.master("local[32]").appName("gc-exp")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.driver.memory", mem)
         .config("spark.driver.extraJavaOptions", opts)
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
corpus = dc.corpus_shaped(spark.read.parquet({corpus!r}))
cfg = IndexConfig(num_shards=32)
tf = term_frequencies(tokenized_docs(corpus, cfg))

def gc_ms():
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))

for it in range(2):
    g0, t0 = gc_ms(), time.monotonic()
    tf.write.mode("overwrite").format("noop").save()
    print(f"RUN {{it}} wall={{time.monotonic()-t0:.1f}}s gc={{(gc_ms()-g0)/1000:.1f}}s",
          flush=True)
spark.stop()
'''


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    script = os.path.join(tempfile.gettempdir(), "ei4s_gc_run.py")
    with open(script, "w") as f:
        f.write(RUN_SRC.format(repo=REPO, corpus=CORPUS))
    for rnd in range(rounds):
        for name, (mem, opts) in CONFIGS.items():
            out = subprocess.run([sys.executable, script, mem, opts],
                                 capture_output=True, text=True, timeout=900,
                                 cwd=REPO)
            runs = [l for l in out.stdout.splitlines() if l.startswith("RUN")]
            print(f"round{rnd} {name:<24} " + " | ".join(runs), flush=True)
            if not runs:
                print(out.stderr[-1500:])


if __name__ == "__main__":
    main()
