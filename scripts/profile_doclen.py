"""Doclen-stage probe with event-log metric breakdown.
Usage: python scripts/profile_doclen.py <cpus> <rep> [mult]
"""
import glob, gzip, json, os, shutil, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F

cpus = int(sys.argv[1]); rep = int(sys.argv[2])
mult = int(sys.argv[3]) if len(sys.argv) > 3 else 8
SF_DIR = "/root/testdata/sf0.1"
evdir = tempfile.mkdtemp(prefix="ev_")

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .appName(f"doclen-{cpus}")
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
gen = os.path.join(tempfile.gettempdir(), f"profd_{cpus}")
shutil.rmtree(gen, ignore_errors=True)

docs_tok = B.tokenized_docs(corpus, cfg)
t = time.monotonic()
(docs_tok.select(*B.DOCLEN_COLS)
 .write.mode("overwrite").partitionBy("shard")
 .parquet(os.path.join(gen, "doclen")))
wall = time.monotonic() - t
spark.stop()

# parse event log
stages = {}
paths = [p for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
         if os.path.isfile(p) and "appstatus" not in os.path.basename(p)]
for path in paths:
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        for line in f:
            ev = json.loads(line)
            if ev.get("Event") != "SparkListenerTaskEnd":
                continue
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            s = stages.setdefault(sid, {"tasks": 0, "run": 0, "cpu": 0, "gc": 0,
                                        "memspill": 0, "diskspill": 0,
                                        "ser": 0, "deser": 0,
                                        "shwrite_t": 0, "shfetch_t": 0,
                                        "input": 0, "shw": 0, "shr": 0})
            s["tasks"] += 1
            s["run"] += m.get("Executor Run Time", 0)
            s["cpu"] += m.get("Executor CPU Time", 0) // 1_000_000
            s["gc"] += m.get("JVM GC Time", 0)
            s["memspill"] += m.get("Memory Bytes Spilled", 0)
            s["diskspill"] += m.get("Disk Bytes Spilled", 0)
            s["ser"] += m.get("Result Serialization Time", 0)
            s["deser"] += m.get("Executor Deserialize Time", 0)
            sw = m.get("Shuffle Write Metrics") or {}
            s["shwrite_t"] += sw.get("Shuffle Write Time", 0) // 1_000_000
            s["shw"] += sw.get("Shuffle Bytes Written", 0)
            sr = m.get("Shuffle Read Metrics") or {}
            s["shfetch_t"] += sr.get("Fetch Wait Time", 0)
            s["shr"] += (sr.get("Local Bytes Read", 0)
                         + sr.get("Remote Bytes Read", 0))
            inp = m.get("Input Metrics") or {}
            s["input"] += inp.get("Bytes Read", 0)

print(f"DOCLEN cpus={cpus} wall={wall:.1f}s")
for sid in sorted(stages):
    s = stages[sid]
    print(f"  stage {sid}: tasks={s['tasks']} run={s['run']/1000:.0f}s "
          f"cpu={s['cpu']/1000:.0f}s gc={s['gc']/1000:.0f}s "
          f"spill_mem={s['memspill']>>20}MB spill_disk={s['diskspill']>>20}MB "
          f"shw={s['shw']>>20}MB shwt={s['shwrite_t']/1000:.0f}s "
          f"shr={s['shr']>>20}MB fetchwait={s['shfetch_t']/1000:.0f}s "
          f"input={s['input']>>20}MB")
shutil.rmtree(gen, ignore_errors=True)
shutil.rmtree(evdir, ignore_errors=True)
