#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Extra keys:
  obo_files_per_sec — throughput of the OBO→KG pipeline (parse + triples +
  canonicalization) over a synthesized corpus, the BASELINE.json metric.

--scaling: run the OBO pipeline at two parallelism levels (local[8] vs
local[32]) on the same input and report throughput + scaling efficiency —
the sandbox proxy for the N vs 4N executor requirement (north_rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# corpus sizing for the OBO throughput leg (files incl. noise; OBO docs
# dominate bytes). ~800 files ≈ 8 MB of OBO text.
BENCH_OBO = int(os.environ.get("SPARK_GRAFT_BENCH_OBO", "600"))
BENCH_NOISE = int(os.environ.get("SPARK_GRAFT_BENCH_NOISE", "200"))

HEADLINE = [
    "pricing_summary",
    "region_revenue",
    "orders_topk_window",
    "events_sessionize",
    "text_stats",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_bruteforce_topk",
]


def _obo_pipeline_files_per_sec(spark, n_obo: int, n_noise: int) -> tuple[float, int]:
    """Time the full KG dataflow (parse → triples → macros → canonicalize →
    CC → dedup) to completion; returns (files_per_sec, n_edges)."""
    from pyspark.sql import functions as F

    from fastobo_py_spark.operators.canonicalize import apply_xref_macros, rewrite_edges
    from fastobo_py_spark.operators.components import canonical_rewrite, equivalence_components
    from fastobo_py_spark.operators.parse import parse_corpus, split_parsed
    from fastobo_py_spark.operators.triples import extract_edges
    from fastobo_py_spark.sources.corpus import corpus_df

    n_files = n_obo + n_noise
    corpus = corpus_df(spark, n_obo=n_obo, n_noise=n_noise, n_broken=2, partitions=int(CPUS) * 2)
    corpus = corpus.persist()
    corpus.count()  # materialize input outside the timed region
    t0 = time.time()
    clauses, _ = split_parsed(parse_corpus(corpus))
    clauses = clauses.persist()
    e = extract_edges(clauses)
    e = apply_xref_macros(e, clauses)
    e = rewrite_edges(e, clauses)
    comps = equivalence_components(e)
    e = canonical_rewrite(e, comps).dropDuplicates(["subj", "pred", "obj", "doc_sha"])
    n_edges = e.count()
    dt = time.time() - t0
    clauses.unpersist()
    corpus.unpersist()
    return n_files / dt, n_edges


def run_bench() -> dict:
    from fastobo_py_spark import queries as Q
    from fastobo_py_spark.session import get_spark

    spark = get_spark(app_name="fastobo-py-spark-bench", master=f"local[{CPUS}]")
    timings = {}
    for name in HEADLINE:
        fn = Q.QUERIES[name]
        t0 = time.time()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)

    t0 = time.time()
    fps, n_edges = _obo_pipeline_files_per_sec(spark, BENCH_OBO, BENCH_NOISE)
    timings["obo_kg_pipeline"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = 0.1 if "sf0.1" in SF_DIR else (0.01 if "sf0.01" in SF_DIR else SF_DIR)
    result = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "obo_files_per_sec": round(fps, 2),
        "obo_canonical_edges": n_edges,
        "cpus": int(CPUS),
    }
    spark.stop()
    return result


def run_scaling() -> dict:
    """Same OBO job at local[8] and local[32]; report scaling efficiency."""
    from fastobo_py_spark.session import get_spark

    out = {}
    for n in (8, 32):
        spark = get_spark(app_name=f"fastobo-scale-{n}", master=f"local[{n}]", shuffle_partitions=n)
        # warmup JVM/Arrow paths
        _obo_pipeline_files_per_sec(spark, 40, 20)
        fps, _ = _obo_pipeline_files_per_sec(spark, BENCH_OBO, BENCH_NOISE)
        out[f"files_per_sec_local{n}"] = round(fps, 2)
        spark.stop()
    speedup = out["files_per_sec_local32"] / out["files_per_sec_local8"]
    out["speedup_8_to_32"] = round(speedup, 3)
    out["scaling_efficiency"] = round(speedup / 4.0, 3)
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
