"""Interleaved pipeline-throughput A/B: HEAD vs a reference commit's tip.

Round-3 verdict item 1b: the driver measured 49.1k docs/s on r3 code while
the builder's own runs read 56-66k — reconcile the delta the same way the
round-2 extraction-family regression was reconciled (interleaved worktree
A/B under identical conditions, with interference instrumentation).

Method: the corpus is materialized ONCE; then ALTERNATING subprocesses run
the full extraction pipeline (warm + min-of-2 noop writes) from HEAD's repo
and from a git worktree of the reference commit, k rounds each, with
/proc-based interference sampling around every measurement (same sampler as
scaling_bench). Alternation means both variants see the same host
conditions in expectation; the per-round table shows it.

Usage: python tools/pipeline_ab.py <ref_worktree_path> [rounds]
       (create the worktree first: git worktree add /tmp/r3tip <commit>)
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import tempfile

_spec = importlib.util.spec_from_file_location(
    "scaling_bench", os.path.join(os.path.dirname(__file__), "scaling_bench.py")
)
_sb = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_sb)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("AB_REPLICATE", "64"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_MEASURE = r"""
import json, sys, time
repo, inp, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
sys.path.insert(0, repo)
from text_extraction_system_spark.session import get_spark
from text_extraction_system_spark import pipeline
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                  extra_conf={"spark.sql.files.maxPartitionBytes": str(1 << 20),
                              "spark.sql.files.openCostInBytes": "0"})
res = pipeline.extract_from_documents(spark.read.parquet(inp))
res.write.format("noop").mode("overwrite").save()
best = 1e9
for _ in range(2):
    t0 = time.time(); res.write.format("noop").mode("overwrite").save()
    best = min(best, time.time() - t0)
print(json.dumps({"sec": round(best, 2)}))
spark.stop()
"""


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    ref_repo = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    head_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    corpus = os.path.join(tempfile.gettempdir(), "ab_corpus")
    n_docs = int(
        _sb._run([corpus, SF_DIR, str(REPLICATE)], _sb._PREP).strip().splitlines()[-1]
    )

    results: list[dict] = []
    for r in range(rounds):
        for label, repo in (("head", head_repo), ("ref", ref_repo)):
            a = _sb._host_sample()
            out = subprocess.run(
                [sys.executable, "-c", _MEASURE, repo, corpus, str(CPUS)],
                capture_output=True, text=True, timeout=2400,
            )
            if out.returncode != 0:
                raise RuntimeError(f"{label} r{r} failed:\n{out.stderr[-2000:]}")
            sec = _sb._sec(out.stdout)
            stats = _sb._phase_stats(a, _sb._host_sample())
            results.append({
                "round": r, "variant": label, "sec": sec,
                "docs_per_sec": round(n_docs / sec, 1),
                "foreign_cpu_cores": stats["foreign_cpu_cores"],
                "steal_cores": stats["steal_cores"],
            })
            print(f"# r{r} {label}: {sec}s ({n_docs/sec:,.0f} docs/s) "
                  f"foreign={stats['foreign_cpu_cores']} steal={stats['steal_cores']}",
                  file=sys.stderr)

    head = [x["sec"] for x in results if x["variant"] == "head"]
    ref = [x["sec"] for x in results if x["variant"] == "ref"]
    print(json.dumps({
        "n_docs": n_docs,
        "cpus": CPUS,
        "rounds": results,
        "head_best_sec": min(head),
        "ref_best_sec": min(ref),
        "head_best_docs_per_sec": round(n_docs / min(head), 1),
        "ref_best_docs_per_sec": round(n_docs / min(ref), 1),
        "head_vs_ref": round(min(ref) / min(head), 3),
    }))


if __name__ == "__main__":
    main()
