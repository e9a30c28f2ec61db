"""Round-5 re-measure of the round-4 bench outliers (VERDICT r4 wrong #1):
dedup_minhash_lsh (2.155 -> 3.923 s, 1.82x, outside the noise band) plus
dedup_simhash / fingerprint (smaller jumps).  Item-22 discipline: fresh
local[32] JVM, sf0.1, queries alternated 5x, per-run wall times printed.
Also times dedup_exact (round-5 agg+join rework) as an A/B check."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"

from elastic_indexer4s_spark import driver_contract as dc
from elastic_indexer4s_spark.config import tuned_builder

spark = tuned_builder("local[32]", "r5-remeasure", shuffle_partitions=32).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

NAMES = ["dedup_minhash_lsh", "dedup_simhash", "fingerprint", "dedup_exact"]
runs = {n: [] for n in NAMES}
for rep in range(5):
    for n in NAMES:
        t0 = time.monotonic()
        dc.QUERIES[n](spark, SF_DIR).count()
        runs[n].append(round(time.monotonic() - t0, 3))
print(json.dumps(runs))
spark.stop()
