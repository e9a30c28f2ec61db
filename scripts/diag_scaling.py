"""Stage-level scaling diagnosis: pre-materialize the replicated corpus to
parquet ONCE (untimed input prep), then run build_index at each requested
parallelism in a fresh JVM, printing per-stage wall times + CPU utilization
sampled from /proc/stat.

Usage: python scripts/diag_scaling.py [rep] [cpus ...]   (default: 60 2 8 32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DOC_MULT = int(os.environ.get("SCALE_DOC_MULT", "8"))

PREP_SRC = r'''
import os, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from elastic_indexer4s_spark.config import tuned_builder
spark = tuned_builder("local[32]", "ei4s-prep", shuffle_partitions=64).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(os.path.join({sf_dir!r}, "documents.parquet"))
n_base = docs.count()
rep = {rep}
reps = spark.range(rep).select(F.col("id").alias("rep"))
mult = {doc_mult}
big = (docs.repartition(64)   # shuffle the SMALL rows, then multiply
       .crossJoin(F.broadcast(reps))
       .select((F.col("doc_id") + F.col("rep") * F.lit(n_base)).alias("doc_id"),
               F.concat_ws(" ", *([F.col("text")] * mult)).alias("text"),
               "lang", "source", "n_chars"))
big.write.mode("overwrite").parquet({corpus!r})
print("PREP", n_base * rep)
spark.stop()
'''

RUN_SRC = r'''
import json, os, shutil, sys, tempfile, threading, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from elastic_indexer4s_spark import driver_contract as dc
from elastic_indexer4s_spark.config import IndexConfig, tuned_builder
from elastic_indexer4s_spark.operators.build import build_index
from elastic_indexer4s_spark.results import RunResult

cpus = int(sys.argv[1])
spark = tuned_builder(f"local[{{cpus}}]", f"ei4s-diag-{{cpus}}",
                      shuffle_partitions=max(cpus * 2, 32)).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

samples = []
def cpu_sampler(stop):
    prev = None
    while not stop.is_set():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = list(map(int, parts))
        if prev is not None:
            dt = sum(vals) - sum(prev)
            idle = (vals[3] + vals[4]) - (prev[3] + prev[4])
            iow = vals[4] - prev[4]
            if dt > 0:
                samples.append((1.0 - idle / dt, iow / dt))
        prev = vals
        stop.wait(2.0)

corpus_df = dc.corpus_shaped(spark.read.parquet({corpus!r}))
gen = os.path.join(tempfile.gettempdir(), f"ei4s_diag_{{cpus}}")
shutil.rmtree(gen, ignore_errors=True)
stop = threading.Event()
th = threading.Thread(target=cpu_sampler, args=(stop,), daemon=True)
th.start()
t0 = time.monotonic()
res = build_index(spark, corpus_df, IndexConfig(num_shards=32), gen)
sec = time.monotonic() - t0
stop.set(); th.join()
assert isinstance(res, RunResult), str(res)
busy = sum(s[0] for s in samples) / max(len(samples), 1)
iow = sum(s[1] for s in samples) / max(len(samples), 1)
stages = [str(s) for s in res.succeeded_stages]
n_docs = {n_docs}
shutil.rmtree(gen, ignore_errors=True)
print("RESULT " + json.dumps({{
    "cpus": cpus, "build_sec": round(sec, 2),
    "files_per_sec": round(n_docs / sec, 1),
    "cpu_busy": round(busy, 3), "iowait": round(iow, 3),
    "stages": stages}}))
spark.stop()
'''


def main() -> None:
    args = sys.argv[1:]
    rep = int(args[0]) if args else 60
    cpu_list = [int(c) for c in args[1:]] or [2, 8, 32]
    corpus = os.path.join(tempfile.gettempdir(), f"ei4s_diag_corpus_{rep}")
    script = os.path.join(tempfile.gettempdir(), "ei4s_diag_run.py")

    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        with open(script, "w") as f:
            f.write(PREP_SRC.format(repo=REPO, sf_dir=SF_DIR, rep=rep,
                                    doc_mult=DOC_MULT, corpus=corpus))
        out = subprocess.run([sys.executable, script], capture_output=True,
                             text=True, timeout=1800)
        print(out.stdout.strip(), file=sys.stderr)
        if "PREP" not in out.stdout:
            print(out.stderr[-3000:], file=sys.stderr)
            sys.exit(1)
    import pyarrow.parquet as pq
    n_docs = pq.read_metadata_summary = None
    import pyarrow.dataset as ds
    n_docs = ds.dataset(corpus, format="parquet").count_rows()

    for cpus in cpu_list:
        with open(script, "w") as f:
            f.write(RUN_SRC.format(repo=REPO, corpus=corpus, n_docs=n_docs))
        # taskset pins the WHOLE JVM (task threads, GC, JIT, python workers)
        # to exactly `cpus` cores — without it a local[2] JVM still gets ~23
        # parallel-GC threads and full compiler parallelism from the 32-core
        # host, inflating low-N throughput and corrupting the N-vs-4N ratio.
        out = subprocess.run(["taskset", "-c", f"0-{cpus - 1}",
                              sys.executable, script, str(cpus)],
                             capture_output=True, text=True, timeout=1800)
        got = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not got:
            print(f"cpus={cpus} FAILED\n{out.stdout[-2000:]}\n"
                  f"{out.stderr[-2000:]}")
            continue
        r = json.loads(got[0][len("RESULT "):])
        print(f"\n== local[{cpus}]: {r['build_sec']}s, "
              f"{r['files_per_sec']} files/s, cpu_busy={r['cpu_busy']}, "
              f"iowait={r['iowait']}")
        for s in r["stages"]:
            print(f"   {s}")


if __name__ == "__main__":
    main()
