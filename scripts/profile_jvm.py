"""Minimal single-JVM scaling probe: pure Catalyst expression work, no
shuffle, no Python, no disk writes. Separates Spark/JVM thread scaling from
the engine's plan shape.
Usage: python scripts/profile_jvm.py <cpus> [rows] [gc]
"""
import json, sys, time

from pyspark.sql import SparkSession, functions as F

cpus = int(sys.argv[1])
rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
gc = sys.argv[3] if len(sys.argv) > 3 else ""

b = (SparkSession.builder.master(f"local[{cpus}]")
     .appName(f"jvmprobe-{cpus}")
     .config("spark.sql.shuffle.partitions", "64")
     .config("spark.ui.enabled", "false")
     .config("spark.ui.showConsoleProgress", "false")
     .config("spark.driver.memory", "24g"))
if gc:
    b = b.config("spark.driver.extraJavaOptions", gc)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

payload = "x" * 2000

# sha2 over a 2KB string per row
df = (spark.range(0, rows, 1, 256)
      .select(F.sha2(F.concat(F.lit(payload), F.col("id").cast("string")),
                     256).alias("h")))
t = time.monotonic()
df.agg(F.max("h")).collect()
sha_sec = time.monotonic() - t

# regexp_extract_all token grammar over a 2KB code-ish string per row
code = "def fooBar_baz(qux): return HTMLParser2 + snake_case_name " * 30
df2 = (spark.range(0, rows, 1, 256)
       .select(F.regexp_extract_all(
           F.concat(F.lit(code), F.col("id").cast("string")),
           F.lit(r"[A-Z]+[0-9][a-z0-9]*|[A-Z]+(?![a-z0-9])|[A-Z][a-z0-9]*|[a-z0-9]+"),
           0).alias("t")))
t = time.monotonic()
df2.select(F.sum(F.size("t"))).collect()
re_sec = time.monotonic() - t

print("JVM " + json.dumps({"cpus": cpus, "rows": rows, "gc": gc,
                           "sha_sec": round(sha_sec, 2),
                           "regex_sec": round(re_sec, 2)}))
spark.stop()
