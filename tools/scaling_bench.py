"""Two-cluster-size scaling evidence (north rule: throughput at N vs 4N
executors, efficiency >= 0.8) — with HOST-INTERFERENCE instrumentation.

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

Instrumentation (round-3 verdict item 1: external contention was asserted
from run-to-run consistency, never demonstrated): every phase samples
/proc/stat and getrusage(RUSAGE_CHILDREN) before/after and reports
  * host_busy_cores    — total host CPU during the phase (cores avg)
  * our_cpu_cores      — CPU burned by THIS benchmark's subprocesses
  * foreign_cpu_cores  — host_busy - ours: co-runner interference
  * steal_cores        — hypervisor steal (Firecracker host contention)
  * load1 start/end
A phase whose foreign_cpu_cores exceeds QUIET_FOREIGN_CORES is re-run (up
to MAX_ATTEMPTS); every attempt is reported, the quietest attempt's timing
is used. A raw-efficiency number is only meaningful next to quiet-phase
evidence — that is what this file now produces.

All runs: warmed (JIT + python workers), min of k timed repetitions,
identical materialized parquet input, scan splits sized so the scan
parallelizes (a ~100 MB corpus bin-packs into ~5 default splits, which
would serialize both sides).

Workload: the full extraction pipeline (derive -> OCR route -> stub ->
re-stitch -> assemble -> structure UDF).
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import tempfile
import time

REPLICATE = int(os.environ.get("SCALING_REPLICATE", "256"))
#: cores per emulated executor (8 = default; 2 emulates 4N on a quarter
#: of the box, sidestepping the full-box clock/scheduling penalty the
#: coloc_probe measures — a second, low-utilization scaling data point)
CORES_PER_EXEC = int(os.environ.get("SCALING_CORES_PER_EXEC", "8"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TMP = tempfile.gettempdir()

#: a phase counts as quiet when co-runner CPU stays below this many cores
QUIET_FOREIGN_CORES = float(os.environ.get("SCALING_QUIET_CORES", "1.5"))
#: ... and hypervisor steal below this many cores. Steal is the one that
#: actually bites here: one T_4N attempt recorded 3.1 steal cores and raw
#: efficiency collapsed to 0.195 with ZERO foreign-process CPU — exactly
#: the invisible interference class behind round-3's 0.43-0.72 spread.
QUIET_STEAL_CORES = float(os.environ.get("SCALING_QUIET_STEAL", "0.5"))
MAX_ATTEMPTS = int(os.environ.get("SCALING_MAX_ATTEMPTS", "3"))

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


def _foreign_cpu_ticks() -> float:
    """utime+stime of every process OUTSIDE this benchmark's session — the
    direct co-runner measurement (RUSAGE_CHILDREN misses python-UDF workers
    the JVM kills without reaping, which would misattribute our own CPU as
    foreign). Foreign processes that exit mid-phase lose their ticks — an
    undercount, but persistent co-runner daemons (the contention suspects)
    are counted exactly."""
    ours = os.getsid(0)
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # post-comm fields: state=0, ..., session=3, ..., utime=11, stime=12
            if int(parts[3]) == ours:
                continue
            total += int(parts[11]) + int(parts[12])
        except (OSError, IndexError, ValueError):
            continue  # process vanished mid-read
    return total


def _host_sample() -> dict:
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    user, nice, system, idle, iowait, irq, softirq, steal = (vals + [0] * 8)[:8]
    ru = resource.getrusage(resource.RUSAGE_CHILDREN)
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    return {
        "busy": user + nice + system + irq + softirq,
        "steal": steal,
        "foreign": _foreign_cpu_ticks(),
        "child_cpu": ru.ru_utime + ru.ru_stime,
        "load1": load1,
        "t": time.time(),
    }


def _phase_stats(a: dict, b: dict) -> dict:
    hz = os.sysconf("SC_CLK_TCK")
    wall = max(b["t"] - a["t"], 1e-9)
    busy = (b["busy"] - a["busy"]) / hz
    steal = (b["steal"] - a["steal"]) / hz
    foreign = max(b["foreign"] - a["foreign"], 0) / hz
    ours = b["child_cpu"] - a["child_cpu"]
    return {
        "wall_sec": round(wall, 2),
        "host_busy_cores": round(busy / wall, 2),
        "our_reaped_cpu_cores": round(ours / wall, 2),
        "foreign_cpu_cores": round(foreign / wall, 2),
        "steal_cores": round(steal / wall, 3),
        "load1_start": a["load1"],
        "load1_end": b["load1"],
    }


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


def _measure(phase_fn, name: str) -> tuple[dict, list[dict]]:
    """Run a phase with interference sampling; retry while noisy. Returns
    (the quietest attempt's stats dict — timing plus any extras phase_fn
    attached — and all attempts' stats). phase_fn may return a bare float
    or a dict with at least 'sec'; the dict form lets a phase report
    per-shard timings that stay attached to the attempt they came from
    (previously the shard table was read from the LAST attempt while the
    headline number came from the quietest — they could mismatch)."""
    attempts: list[dict] = []
    for i in range(MAX_ATTEMPTS):
        a = _host_sample()
        res = phase_fn()
        stats = _phase_stats(a, _host_sample())
        stats.update(res if isinstance(res, dict) else {"sec": res})
        attempts.append(stats)
        if (stats["foreign_cpu_cores"] <= QUIET_FOREIGN_CORES
                and stats["steal_cores"] <= QUIET_STEAL_CORES):
            break
        print(f"# {name} attempt {i}: foreign {stats['foreign_cpu_cores']} / "
              f"steal {stats['steal_cores']} cores over threshold — retrying",
              file=sys.stderr)
    best = min(attempts,
               key=lambda s: (s["foreign_cpu_cores"] + s["steal_cores"]))
    return best, attempts


def _four_concurrent(corpus: str) -> dict:
    c = CORES_PER_EXEC
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _EXEC, str(p * c), str(p * c + c),
             f"{corpus}_shard{p}", "2"],
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
    return {"sec": max(shard_secs), "shard_secs": shard_secs}


def main() -> None:
    corpus = os.path.join(TMP, "scaling_corpus")
    n_docs = int(_run([corpus, SF_DIR, str(REPLICATE)], _PREP).strip().splitlines()[-1])

    # A. executor proxy
    c = CORES_PER_EXEC
    best_n, att_n = _measure(lambda: _sec(_run(["0", str(c), corpus, "2"], _EXEC)), "T_N")
    best_4n, att_4n = _measure(lambda: _four_concurrent(corpus), "T_4N")
    t_n, t_4n = best_n["sec"], best_4n["sec"]
    shard_secs = best_4n["shard_secs"]  # same attempt as t_4n by construction
    best_iso, att_iso = _measure(
        lambda: _sec(_run(["0", str(c), f"{corpus}_shard0", "2"], _EXEC)), "T_iso"
    )
    t_iso = best_iso["sec"]

    # B. local[8] vs local[32]
    best_l8, att_l8 = _measure(lambda: _sec(_run(["0", "8", corpus, "3"], _EXEC)), "local8")
    best_l32, att_l32 = _measure(lambda: _sec(_run(["0", "32", corpus, "3"], _EXEC)), "local32")
    t_l8, t_l32 = best_l8["sec"], best_l32["sec"]

    def _quiet(atts):
        b = min(atts, key=lambda s: (s["foreign_cpu_cores"] + s["steal_cores"]))
        return (b["foreign_cpu_cores"] <= QUIET_FOREIGN_CORES
                and b["steal_cores"] <= QUIET_STEAL_CORES)

    quiet = all(_quiet(a) for a in (att_n, att_4n, att_iso, att_l8, att_l32))
    print(json.dumps({
        "workload": "full extraction pipeline incl. structure UDF",
        "cores_per_executor": CORES_PER_EXEC,
        "sf_dir": SF_DIR,
        "n_docs": n_docs,
        "quiet_window": quiet,
        "quiet_threshold_foreign_cores": QUIET_FOREIGN_CORES,
        "quiet_threshold_steal_cores": QUIET_STEAL_CORES,
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
        "interference": {
            "T_N": att_n,
            "T_4N": att_4n,
            "T_iso": att_iso,
            "local8": att_l8,
            "local32": att_l32,
        },
    }))


if __name__ == "__main__":
    main()
