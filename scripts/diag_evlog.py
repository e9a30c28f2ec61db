"""Full build at local[N] with event logging; parse per-stage task metrics.

Usage: python scripts/diag_evlog.py <cpus> [rep]
Requires the pre-materialized corpus from diag_scaling.py.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elastic_indexer4s_spark import driver_contract as dc  # noqa: E402
from elastic_indexer4s_spark.config import IndexConfig, tuned_builder  # noqa: E402
from elastic_indexer4s_spark.operators.build import build_index  # noqa: E402
from elastic_indexer4s_spark.results import RunResult  # noqa: E402
from evparse import print_stages, stage_metrics  # noqa: E402

CPUS = int(sys.argv[1])
MEM = os.environ.get("EI4S_MEM", "24g")
REP = int(sys.argv[2]) if len(sys.argv) > 2 else 60
CORPUS = os.path.join(tempfile.gettempdir(), f"ei4s_diag_corpus_{REP}")
EVDIR = os.path.join(tempfile.gettempdir(), f"ei4s_ev_{CPUS}")
shutil.rmtree(EVDIR, ignore_errors=True)
os.makedirs(EVDIR, exist_ok=True)

spark = (tuned_builder(f"local[{CPUS}]", f"ei4s-ev-{CPUS}",
                       shuffle_partitions=max(CPUS * 2, 32), driver_mem=MEM)
         .config("spark.eventLog.enabled", "true")
         .config("spark.eventLog.dir", EVDIR)
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

raw = spark.read.parquet(CORPUS)
corpus = raw if "content" in raw.columns else dc.corpus_shaped(raw)
gen = os.path.join(tempfile.gettempdir(), f"ei4s_ev_gen_{CPUS}")
shutil.rmtree(gen, ignore_errors=True)
t0 = time.monotonic()
res = build_index(spark, corpus, IndexConfig(num_shards=32), gen)
sec = time.monotonic() - t0
assert isinstance(res, RunResult), str(res)
for s in res.succeeded_stages:
    print(f"   {s}")
print(f"TOTAL {sec:.1f}s at local[{CPUS}]")
spark.stop()
shutil.rmtree(gen, ignore_errors=True)

print_stages(stage_metrics(EVDIR))
