"""Scaling-efficiency evidence for the north rule: the same index-build job
at N and 4N parallelism, same input, fresh JVM per run.

This sandbox is a shared-host VM: a pure-CPU probe (32 spin workers) shows
the box itself delivers only ~2.9x going 8->32 threads (hardware ceiling
~0.73), while 2->8 threads scales perfectly (1.0).  So the clean software
measurement is local[2] vs local[8]; local[8] vs local[32] is reported too,
alongside the measured hardware ceiling, so the reader can separate engine
scaling from host contention.

Prints one JSON line and rewrites the scaling section of BENCH.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PAIRS = [(2, 8, 60), (8, 32, 160)]  # (N, 4N, replicate)
# testdata docs are ~300 chars; real source files are KBs. DOC_MULT
# concatenates the text with itself so per-doc CPU work is realistic and the
# measurement is compute-bound (the 100 TB regime) rather than dominated by
# the ~15 s serial floor of a local Spark job chain.
DOC_MULT = int(os.environ.get("SCALE_DOC_MULT", "8"))
SHARDS = 32

RUN_SRC = r'''
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from elastic_indexer4s_spark import driver_contract as dc
from elastic_indexer4s_spark.config import IndexConfig
from elastic_indexer4s_spark.operators.build import build_index
from elastic_indexer4s_spark.results import RunResult

from elastic_indexer4s_spark.config import tuned_builder
cpus, rep = int(sys.argv[1]), int(sys.argv[2])
spark = tuned_builder(f"local[{{cpus}}]", f"ei4s-scale-{{cpus}}",
                      shuffle_partitions=max(cpus * 2, 32)).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(os.path.join({sf_dir!r}, "documents.parquet"))
n_base = docs.count()
reps = spark.range(rep).select(F.col("id").alias("rep"))
mult = {doc_mult}
big = (docs.crossJoin(reps)
       .select((F.col("doc_id") + F.col("rep") * F.lit(n_base)).alias("doc_id"),
               F.concat_ws(" ", *([F.col("text")] * mult)).alias("text"),
               "lang", "source", "n_chars")
       .repartition(64))
corpus = dc.corpus_shaped(big)
gen = os.path.join(tempfile.gettempdir(), f"ei4s_scale_{{cpus}}")
shutil.rmtree(gen, ignore_errors=True)
t0 = time.monotonic()
res = build_index(spark, corpus, IndexConfig(num_shards={shards}), gen)
build_sec = time.monotonic() - t0
assert isinstance(res, RunResult), str(res)
n_docs = n_base * rep
shutil.rmtree(gen, ignore_errors=True)
print("RESULT " + json.dumps({{
    "cpus": cpus, "build_sec": round(build_sec, 2),
    "files_per_sec": round(n_docs / build_sec, 1), "n_docs": n_docs}}))
spark.stop()
'''


def _spin(_):
    t_end = time.monotonic() + 3.0
    c = 0
    x = 0
    while time.monotonic() < t_end:
        for i in range(100000):
            x += i * i
        c += 1
    return c


def cpu_ceiling(n_lo: int, n_hi: int) -> float:
    """Best-of-2 pure-CPU aggregate throughput ratio (n_lo vs n_hi spin
    workers) — the host's attainable scaling, independent of Spark.  Each
    measurement is pinned to exactly that many cores, matching how the
    engine runs are pinned."""
    work = _spin
    best = {}
    all_cpus = os.sched_getaffinity(0)
    for workers in (n_lo, n_hi, n_lo, n_hi):
        os.sched_setaffinity(0, set(range(workers)))
        try:
            with mp.Pool(workers) as p:
                total = sum(p.map(work, range(workers)))
        finally:
            os.sched_setaffinity(0, all_cpus)
        best[workers] = max(best.get(workers, 0), total)
    return best[n_hi] / best[n_lo] / (n_hi / n_lo)


def run_once(cpus: int, rep: int) -> dict:
    src = RUN_SRC.format(repo=REPO, sf_dir=SF_DIR, shards=SHARDS,
                         doc_mult=DOC_MULT)
    script = os.path.join(tempfile.gettempdir(), "ei4s_scale_run.py")
    with open(script, "w") as f:
        f.write(src)
    # Pin the whole process tree (JVM task/GC/JIT threads + python workers)
    # to exactly `cpus` cores: a local[N] JVM otherwise still sizes its GC
    # and compiler thread pools to the 32-core host, giving low-N runs free
    # parallelism a real N-core executor would not have.
    out = subprocess.run(["taskset", "-c", f"0-{cpus - 1}",
                          sys.executable, script, str(cpus), str(rep)],
                         capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run cpus={cpus} failed:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-2000:]}")


def main() -> None:
    pair_results = []
    for n_lo, n_hi, rep in PAIRS:
        ceiling = cpu_ceiling(n_lo, n_hi)
        best: dict[int, dict] = {}
        for cpus in (n_lo, n_hi, n_lo, n_hi):  # interleave, best-of-2
            r = run_once(cpus, rep)
            print(f"  local[{cpus}] rep={rep}: {r}", file=sys.stderr)
            if cpus not in best or r["files_per_sec"] > best[cpus]["files_per_sec"]:
                best[cpus] = r
        lo, hi = best[n_lo], best[n_hi]
        eff = (hi["files_per_sec"] / lo["files_per_sec"]) / (n_hi / n_lo)
        pair_results.append({
            "n": n_lo, "n4": n_hi, "replicate": rep,
            "hw_ceiling": round(ceiling, 3),
            "lo": lo, "hi": hi,
            "efficiency": round(eff, 3),
            "efficiency_vs_ceiling": round(eff / ceiling, 3),
        })

    headline = pair_results[0]
    print(json.dumps({
        "metric": "scaling_efficiency_build",
        "value": headline["efficiency"],
        "unit": "ratio",
        "pairs": pair_results,
        "sf": SF_DIR,
    }))

    lines = ["", "## Scaling run (N vs 4N executor threads, same input, "
             "fresh JVM per run)", "",
             "Pure-CPU spin probe first measures what the shared-host VM "
             "itself can deliver (`hw ceiling`); engine efficiency is then "
             "reported raw and relative to that ceiling. Docs are the sf "
             f"text concatenated x{DOC_MULT} (~2.4 KB/doc — realistic "
             "source-file size, keeps the run compute-bound like the "
             "production regime).", "",
             "| pair | docs | N files/s | 4N files/s | efficiency | "
             "hw ceiling | eff/ceiling |", "|---|---|---|---|---|---|---|"]
    for p in pair_results:
        lines.append(
            f"| local[{p['n']}] -> local[{p['n4']}] | {p['lo']['n_docs']} | "
            f"{p['lo']['files_per_sec']} | {p['hi']['files_per_sec']} | "
            f"**{p['efficiency']}** | {p['hw_ceiling']} | "
            f"{p['efficiency_vs_ceiling']} |")
    lines.append("")
    bench_md = os.path.join(REPO, "BENCH.md")
    with open(bench_md) as f:
        prev = f.read()
    # replace any previous scaling section (everything from its header on)
    cut = prev.find("\n## Scaling run")
    if cut != -1:
        prev = prev[:cut]
    with open(bench_md, "w") as f:
        f.write(prev + "\n".join(lines))


if __name__ == "__main__":
    main()
