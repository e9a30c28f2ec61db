"""Per-stage build timing over a PRE-MATERIALIZED corpus parquet.

Usage: REPS=2 python scripts/diag_build_stages.py <corpus_parquet> <cpus...>
Each cpus level runs REPS times, interleaved, in fresh taskset-pinned JVMs
(best-of filtering for the shared-host VM's bursty interference); prints
every run's stage log plus the best wall per level.
"""
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = sys.argv[1]
CPUS = [int(c) for c in sys.argv[2:]] or [2, 8]
REPS = int(os.environ.get("REPS", "1"))

RUN = r'''
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from elastic_indexer4s_spark.config import IndexConfig, tuned_builder
from elastic_indexer4s_spark.operators.build import build_index
from elastic_indexer4s_spark.results import RunResult
cpus = int(sys.argv[1])
spark = tuned_builder(f"local[{{cpus}}]", f"bstage-{{cpus}}",
                      shuffle_partitions=max(cpus * 2, 32)).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
corpus = spark.read.parquet({corpus!r})
gen = os.path.join(tempfile.gettempdir(), f"bstage_{{cpus}}")
shutil.rmtree(gen, ignore_errors=True)
t0 = time.monotonic()
res = build_index(spark, corpus,
                  IndexConfig(num_shards=int(os.environ.get("EI4S_SHARDS", "32"))),
                  gen)
wall = time.monotonic() - t0
assert isinstance(res, RunResult), str(res)
n = corpus.count()
shutil.rmtree(gen, ignore_errors=True)
print("RES " + json.dumps({{"cpus": cpus, "wall": round(wall, 2),
    "files_per_sec": round(n / wall, 1),
    "stages": [str(s) for s in res.succeeded_stages]}}))
spark.stop()
'''


def main() -> None:
    script = os.path.join(tempfile.gettempdir(), "ei4s_bstage_run.py")
    with open(script, "w") as f:
        f.write(RUN.format(repo=REPO, corpus=CORPUS))
    best: dict[int, float] = {}
    for _ in range(REPS):
        for cpus in CPUS:
            out = subprocess.run(
                ["taskset", "-c", f"0-{cpus - 1}", sys.executable, script,
                 str(cpus)], capture_output=True, text=True, timeout=1800)
            got = [l for l in out.stdout.splitlines() if l.startswith("RES ")]
            if got:
                d = json.loads(got[0][4:])
                print(f"local[{cpus}]: wall={d['wall']}s "
                      f"({d['files_per_sec']} files/s)")
                for s in d["stages"]:
                    print(f"   {s}")
                best[cpus] = min(best.get(cpus, 1e9), d["wall"])
            else:
                print(out.stdout[-1500:] + out.stderr[-1500:])
    print("BEST " + json.dumps(best))
    for lo, hi in zip(CPUS, CPUS[1:]):
        if lo in best and hi in best:
            print(f"eff {lo}->{hi}: "
                  f"{(best[lo] / best[hi]) / (hi / lo):.3f}")


if __name__ == "__main__":
    main()
