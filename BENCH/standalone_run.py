"""Pseudo-cluster scaling evidence (north-rule N -> 4N proxy).

The sandbox has one 32-core box, so a real two-cluster-size comparison
is impossible; the closest honest proxy is Spark STANDALONE mode on
this box with fixed-size executors and a varying executor COUNT:

    1 worker  x 8 cores  (cluster size N)
vs  4 workers x 8 cores  (cluster size 4N)

Same job (full index build over the same generated corpus), same
executor shape, real executor JVM processes with real shuffle
fetches between them — this separates executor-process scaling from
local-mode thread scaling, and both levels hit the same host memory-
bandwidth ceiling, which a real multi-node cluster would not share
(see BENCH/BASELINE.md "membw envelope").

Isolation rules reused from bench.py's scaling_phase (measured in
round 1): subprocess per Spark run, taskset pinning (worker i gets
cores 8i..8i+7; the 1-worker level gets cores 0-7), interleaved
levels, min-of-reps.

Usage:  PYTHONPATH=/root/repo python BENCH/standalone_run.py
Prints one JSON line; record the table in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

import pyspark

SPARK_PKG = os.path.dirname(pyspark.__file__)
SPARK_CLASS = os.path.join(SPARK_PKG, "bin", "spark-class")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "1200000"))
REPS = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2"))
MASTER_URL = "spark://127.0.0.1:7077"


def env_for(extra: dict | None = None) -> dict:
    e = {
        **os.environ,
        "PYTHONPATH": REPO,
        "SPARK_HOME": SPARK_PKG,
        # keep standalone daemons quiet + off the UI ports
        "SPARK_MASTER_HOST": "127.0.0.1",
        "SPARK_NO_DAEMONIZE": "1",
    }
    if extra:
        e.update(extra)
    return e


def start(cmd: list[str], extra_env: dict | None = None) -> subprocess.Popen:
    return subprocess.Popen(
        cmd, env=env_for(extra_env),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        preexec_fn=os.setsid,
    )


def stop(p: subprocess.Popen) -> None:
    try:
        os.killpg(os.getpgid(p.pid), signal.SIGTERM)
    except Exception:
        pass


def gen_corpus(tmp: str) -> str:
    path = os.path.join(tmp, "docs")
    script = (
        "import sys\n"
        "from pyspark.sql import functions as F\n"
        "from search_ingest_spark.session import get_spark\n"
        "from search_ingest_spark.corpus import generate_pages\n"
        "spark = get_spark('gen', master='local[32]', shuffle_partitions=32)\n"
        f"pages = generate_pages(spark, {N_DOCS}, seed=11, partitions=256)\n"
        "latest = (pages.groupBy('url')\n"
        "    .agg(F.max_by(F.struct('warc_ts','text'),'warc_ts').alias('s'))\n"
        "    .select('url', F.col('s.text').alias('text')))\n"
        "docs = latest.withColumn('doc_id', F.regexp_extract('url', r'(\\d+)$', 1)"
        ".cast('long')).select('doc_id','text')\n"
        f"docs.repartition(128).write.mode('overwrite').parquet({path!r})\n"
        "print(docs.count())\n"
    )
    out = subprocess.run([sys.executable, "-c", script], env=env_for(),
                         capture_output=True, text=True, timeout=1200)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return path


BUILD_SCRIPT = r"""
import json, sys, time
master, docs_path, idx_path, dps, cores_max = (
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5]))
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(master).appName(f"sa{cores_max}")
    .config("spark.executor.cores", "8")
    .config("spark.executor.memory", "18g")
    .config("spark.cores.max", str(cores_max))
    .config("spark.sql.shuffle.partitions", str(cores_max))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "12g")
    .config("spark.local.dir", "/dev/shm/sa_spark_local")
    .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")
    .getOrCreate())
# wait until the requested executors actually register (JVM map
# includes the driver entry, hence the +1)
want = cores_max // 8
for _ in range(240):
    try:
        n = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
    except Exception:
        n = want
    if n >= want:
        break
    time.sleep(0.5)
# warm the python worker processes on every executor
def _noop(it):
    yield from it
spark.range(cores_max * 4, numPartitions=cores_max * 4).mapInPandas(
    _noop, "id long").count()
from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index.build import build_index
t0 = time.time()
build_index(spark, spark.read.parquet(docs_path), Catalog(spark, idx_path),
            mode="standard", docs_per_shard=dps, resume=True)
print(json.dumps({"wall": time.time() - t0}))
"""


def run_build(tmp: str, corpus: str, cores_max: int, rep: int,
              dps: int) -> float:
    idx = os.path.join(tmp, f"idx_sa{cores_max}_{rep}")
    script = os.path.join(tmp, "sa_build.py")
    with open(script, "w") as fh:
        fh.write(BUILD_SCRIPT)
    out = subprocess.run(
        [sys.executable, script, MASTER_URL, corpus, idx, str(dps),
         str(cores_max)],
        env=env_for(), capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-3000:])
    return json.loads(out.stdout.strip().splitlines()[-1])["wall"]


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="sa_bench_", dir="/dev/shm")
    os.makedirs("/dev/shm/sa_spark_local", exist_ok=True)
    corpus = gen_corpus(tmp)
    dps = max(256, N_DOCS // 128)

    master = start([SPARK_CLASS, "org.apache.spark.deploy.master.Master",
                    "--host", "127.0.0.1", "--port", "7077",
                    "--webui-port", "0"])
    time.sleep(5)
    workers = []
    try:
        for i in range(4):
            cmd = [SPARK_CLASS, "org.apache.spark.deploy.worker.Worker",
                   MASTER_URL, "--cores", "8", "--memory", "20g",
                   "--webui-port", "0",
                   "--work-dir", os.path.join(tmp, f"wk{i}")]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", f"{8*i}-{8*i+7}"] + cmd
            workers.append(start(cmd))
        time.sleep(8)

        walls: dict[int, list[float]] = {8: [], 32: []}
        for rep in range(REPS):  # interleaved
            walls[8].append(run_build(tmp, corpus, 8, rep, dps))
            walls[32].append(run_build(tmp, corpus, 32, rep, dps))
        out = {"metric": "standalone_scaling", "n_docs": N_DOCS,
               "executor_shape": "8 cores / 18g", "reps": REPS}
        for cm in (8, 32):
            best = min(walls[cm])
            out[f"exec{cm//8}x8_sec"] = round(best, 2)
            out[f"exec{cm//8}x8_walls"] = [round(w, 2) for w in walls[cm]]
            out[f"exec{cm//8}x8_docs_per_sec"] = round(N_DOCS / best, 1)
        ratio = out["exec4x8_docs_per_sec"] / out["exec1x8_docs_per_sec"]
        out["speedup_1to4_workers"] = round(ratio, 3)
        out["scaling_efficiency"] = round(ratio / 4.0, 3)
        print(json.dumps(out))
    finally:
        for w in workers:
            stop(w)
        stop(master)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
