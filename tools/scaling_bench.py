"""Two-cluster-size scaling evidence (north rule: throughput at N vs 4N
executors, efficiency >= 0.8).

The sandbox is ONE machine, so cluster sizes are emulated two ways and both
are reported:

A. **Executor proxy (primary)** — an "executor" is a separate 8-core-pinned
   JVM (own heap, own python workers), like a real cluster node:
     * T_N   : 1 executor processes the full corpus
     * T_4N  : 4 executors on disjoint CPU sets process 4 hash-shards
               concurrently; wall time = max over executors
     * T_iso : 1 executor processes one shard ALONE — isolates the
               shared-DRAM/SMT penalty of co-locating 4 executors on one
               box, which real separate nodes would not pay.
   raw efficiency      = T_N / (4 * T_4N)
   isolated-node proj. = T_N / (4 * T_iso)   (the cluster-realistic number)

B. **local[8] vs local[32] (secondary)** — same job, one JVM, task-slot
   counts 8 vs 32, process pinned to that many CPUs. Penalized by a single
   shared heap at 32 threads; reported for completeness.

All runs: warmed (JIT + python workers), min of k timed repetitions (robust
to host CPU steal), identical materialized parquet input, scan splits sized
so the scan parallelizes (a ~100 MB corpus bin-packs into ~5 default splits,
which would serialize both sides).

Workload: the full extraction pipeline (derive -> OCR route -> stub ->
re-stitch -> assemble -> structure UDF).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPLICATE = int(os.environ.get("SCALING_REPLICATE", "256"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TMP = tempfile.gettempdir()

_PREP = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from text_extraction_system_spark.session import get_spark
out, sf_dir, replicate = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(master="local[32]", shuffle_partitions=32)
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
from text_extraction_system_spark import synth
big = synth.replicate_corpus(docs, replicate, 128)
big.write.mode("overwrite").parquet(out)
big2 = spark.read.parquet(out).withColumn("part", F.pmod(F.xxhash64("doc_id"), F.lit(4)))
for p in range(4):
    big2.where(F.col("part") == p).drop("part").repartition(32) \
        .write.mode("overwrite").parquet(f"{out}_shard{p}")
print(spark.read.parquet(out).count())
spark.stop()
"""

_EXEC = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
cpu_lo, cpu_hi, inp, reps = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
os.sched_setaffinity(0, set(range(cpu_lo, cpu_hi)))
from text_extraction_system_spark.session import get_spark
from text_extraction_system_spark import pipeline
cores = cpu_hi - cpu_lo
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores,
                  extra_conf={"spark.sql.files.maxPartitionBytes": str(1 << 20),
                              "spark.sql.files.openCostInBytes": "0",
                              "spark.driver.memory": "8g" if cores <= 8 else "24g"})
res = pipeline.extract_from_documents(spark.read.parquet(inp))
res.write.format("noop").mode("overwrite").save()
best = 1e9
for _ in range(reps):
    t0 = time.time(); res.write.format("noop").mode("overwrite").save()
    best = min(best, time.time() - t0)
print(json.dumps({"sec": round(best, 2)}))
spark.stop()
"""


def _sec(stdout: str) -> float:
    lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"executor produced no result JSON; stdout: {stdout[-500:]!r}")
    return json.loads(lines[-1])["sec"]


def _run(args: list[str], snippet: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", snippet, *args], capture_output=True, text=True, timeout=2400
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench subprocess failed (rc={proc.returncode}, args={args}):\n"
            + proc.stderr[-2000:]
        )
    return proc.stdout


def main() -> None:
    corpus = os.path.join(TMP, "scaling_corpus")
    n_docs = int(_run([corpus, SF_DIR, str(REPLICATE)], _PREP).strip().splitlines()[-1])

    # A. executor proxy
    t_n = _sec(_run(["0", "8", corpus, "2"], _EXEC))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _EXEC, str(p * 8), str(p * 8 + 8), f"{corpus}_shard{p}", "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for p in range(4)
    ]
    shard_secs = []
    for i, p in enumerate(procs):
        out, err = p.communicate()
        if p.returncode != 0:
            raise RuntimeError(f"shard {i} executor failed (rc={p.returncode}):\n{err[-2000:]}")
        shard_secs.append(_sec(out))
    t_4n = max(shard_secs)
    t_iso = _sec(_run(["0", "8", f"{corpus}_shard0", "2"], _EXEC))

    # B. local[8] vs local[32]
    t_l8 = _sec(_run(["0", "8", corpus, "3"], _EXEC))
    t_l32 = _sec(_run(["0", "32", corpus, "3"], _EXEC))

    print(json.dumps({
        "workload": "full extraction pipeline incl. structure UDF",
        "sf_dir": SF_DIR,
        "n_docs": n_docs,
        "executor_proxy": {
            "t_1exec_full_sec": t_n,
            "t_4exec_concurrent_sec": t_4n,
            "shard_secs": shard_secs,
            "t_1exec_shard_alone_sec": t_iso,
            "docs_per_sec_N": round(n_docs / t_n, 1),
            "docs_per_sec_4N": round(n_docs / t_4n, 1),
            "raw_efficiency": round(t_n / (4 * t_4n), 3),
            "colocation_penalty": round(t_4n / t_iso, 3),
            "isolated_node_efficiency": round(t_n / (4 * t_iso), 3),
        },
        "single_jvm_proxy": {
            "t_local8_sec": t_l8,
            "t_local32_sec": t_l32,
            "efficiency": round(t_l8 / (4 * t_l32), 3),
        },
    }))


if __name__ == "__main__":
    main()
