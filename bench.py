"""Benchmark harness — one JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] (default 32) and prints:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": <sf>, "docs_per_sec": ..., ...}

Results are written with the noop sink so timing covers the full distributed
plan without driver-side collect cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "extract_restitch",
    "plain_text",
    "paragraphs",
    "sentences",
    "sections",
    "ocr_route",
    "rotation",
    "deskew",
    "reading_order",
    "sections_toc",
    "text_coords",
    "coords_text",
    "media_decode",
    "boilerplate",
    "tables",
    "quality",
    "repetition",
    "lang_id",
    "fingerprint",
    "simhash",
    "exact_dedup",
    "curation_funnel",
    "media_features",
    "media_near_dup",
    "near_dup_pairs",
    "decontaminate",
    "split_assign",
    "incremental_dedup",
    "release_manifest",
    "pack_bins",
    "ann_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_trained",
    "sessionize",
    "tumbling",
    "pricing_summary",
    "nation_revenue",
]


def _host_probe() -> dict:
    """/proc snapshot for interference evidence: busy/steal cpu ticks and
    load. The driver-recorded bench carries its own host-conditions proof —
    round-3's pipeline-throughput delta (63k vs 49k docs/s) was
    unattributable because neither side recorded what else the host ran."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    user, nice, system, idle, iowait, irq, softirq, steal = (vals + [0] * 8)[:8]
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    return {"busy": user + nice + system + irq + softirq, "steal": steal,
            "load1": load1, "t": time.time()}


def _host_delta(a: dict, b: dict) -> dict:
    hz = os.sysconf("SC_CLK_TCK")
    wall = max(b["t"] - a["t"], 1e-9)
    return {
        "host_busy_cores": round((b["busy"] - a["busy"]) / hz / wall, 2),
        "steal_cores": round((b["steal"] - a["steal"]) / hz / wall, 3),
        "load1_start": a["load1"],
        "load1_end": b["load1"],
    }


def main() -> None:
    import __spark_entry__ as entrymod
    from text_extraction_system_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # size scan splits for the bench corpora: the sf0.1 tables are a few MB
    # each and bin-pack into 1-2 default 128 MB splits, silently serializing
    # every CPU-bound stage that inherits scan partitioning (see BENCH.md);
    # at real data volumes the default split size is correct
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(1 << 20),
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    qs = entrymod.queries()

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    doc_bytes = os.path.getsize(f"{sf_dir}/documents.parquet")

    # min-of-2 timed runs after a warm run: single timed runs on this shared
    # host swing +-40% with CPU steal and JIT warmup (the round-2 bench
    # "regression" reproduced as pure inter-process variance in a controlled
    # interleaved worktree A/B — see BENCH.md); the min is the stable
    # plan-cost signal
    probe_start = _host_probe()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (plan+JIT)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    headline_host = _host_delta(probe_start, _host_probe())

    # throughput on a replicated corpus: at sf0.1 the raw table is 5k docs,
    # so a single-query timing is all fixed cost; replicate with distinct
    # doc_ids and measure the full pipeline warm, min-of-2
    from pyspark.sql import functions as F

    from text_extraction_system_spark import pipeline as pl

    rep = 64
    big_path = "/tmp/bench_corpus"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from text_extraction_system_spark import synth

    synth.replicate_corpus(docs, rep, cpus * 4).write.mode("overwrite").parquet(big_path)
    big = spark.read.parquet(big_path)
    n_big = big.count()
    big_bytes = n_big / n_docs * doc_bytes
    res = pl.extract_from_documents(big)
    res.write.format("noop").mode("overwrite").save()
    probe_pipe = _host_probe()
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        res.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    pipeline_host = _host_delta(probe_pipe, _host_probe())

    # giant-doc row: one 10^5-span document through extraction — the skew
    # archetype measured AT measurement time (the pytest linearity guard's
    # bench twin). Wall time should stay O(spans); a quadratic regression
    # shows up here as minutes, not seconds.
    from text_extraction_system_spark.operators import layout, restitch

    n_spans = 100_000
    giant = spark.range(1).select(
        F.lit("giantperf").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(n_spans - 1)),
            lambda i: F.struct(
                F.lit("text").alias("kind"),
                F.concat(F.lit("w"), i.cast("string")).alias("text"),
                F.lit("").alias("media_ref"),
                i.cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )
    gres = layout.assemble(restitch.process_spans(giant, fanout_threshold=None))
    gres.write.format("noop").mode("overwrite").save()  # warm
    gbest = 1e9
    for _ in range(2):
        t0 = time.time()
        gres.write.format("noop").mode("overwrite").save()
        gbest = min(gbest, time.time() - t0)

    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_docs": n_docs,
        "pipeline_n_docs": n_big,
        "pipeline_sec": round(best, 2),
        "docs_per_sec": round(n_big / best, 1),
        "mb_per_sec": round(big_bytes / 1e6 / best, 2),
        "giant_doc_spans": n_spans,
        "giant_doc_sec": round(gbest, 2),
        "cpus": cpus,
        "host_headline": headline_host,
        "host_pipeline": pipeline_host,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
