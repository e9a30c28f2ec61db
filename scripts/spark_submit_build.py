"""Launch the index build via `spark-submit --py-files` (north rule evidence).

Packages ``elastic_indexer4s_spark`` into a zip, then execs:

    spark-submit --master local[CPUS] --py-files <zip> \
        [tuned --conf flags] scripts/submit_job.py [job args...]

so the engine runs exactly the way it would on a real multi-executor cluster:
code distributed via --py-files, all engine-required configuration expressed
as ordinary spark-submit ``--conf`` flags (on a cluster the same flags go in
spark-defaults.conf / the submit command, with ``spark.executor.
extraJavaOptions`` carrying the GC flags to executors).

Usage:  python scripts/spark_submit_build.py [--cpus 32] [job args...]
Prints the job's RESULT json line.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_pyfiles_zip(dest_dir: str) -> str:
    """Zip the engine package for --py-files distribution."""
    pkg = os.path.join(REPO, "elastic_indexer4s_spark")
    zpath = os.path.join(dest_dir, "ei4s.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def find_spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark
    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    raise FileNotFoundError("spark-submit not found")


def tuned_submit_conf(cpus: int) -> list[str]:
    """The engine's recommended conf as spark-submit flags — the CLI twin of
    config.tuned_builder (see that docstring for the measured rationale:
    ParallelGC + pinned heap + off-heap execution memory + Arrow)."""
    offheap = max(4, cpus)
    driver_mem = "24g"
    java = f"-XX:+UseParallelGC -Xms{driver_mem}"
    return [
        "--driver-memory", driver_mem,
        "--conf", f"spark.driver.extraJavaOptions={java}",
        "--conf", "spark.executor.extraJavaOptions=-XX:+UseParallelGC",
        "--conf", f"spark.sql.shuffle.partitions={max(cpus * 2, 32)}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.memory.offHeap.enabled=true",
        "--conf", f"spark.memory.offHeap.size={offheap}g",
        "--conf", "spark.executorEnv.MALLOC_MMAP_MAX_=0",
        "--conf", "spark.executorEnv.MALLOC_TRIM_THRESHOLD_=-1",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args, job_args = ap.parse_known_args()

    tmp = tempfile.mkdtemp(prefix="ei4s_submit_")
    try:
        zpath = make_pyfiles_zip(tmp)
        cmd = [find_spark_submit(),
               "--master", f"local[{args.cpus}]",
               "--py-files", zpath,
               *tuned_submit_conf(args.cpus),
               os.path.join(REPO, "scripts", "submit_job.py"),
               *job_args]
        env = dict(os.environ,
                   MALLOC_MMAP_MAX_="0", MALLOC_TRIM_THRESHOLD_="-1")
        print("+ " + " ".join(cmd), file=sys.stderr)
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                              timeout=1800)
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line)
                return
        sys.stderr.write(proc.stdout[-3000:] + "\n" + proc.stderr[-3000:])
        sys.exit(proc.returncode or 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
