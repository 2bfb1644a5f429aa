#!/usr/bin/env python
"""Round-4 endurance run: the full bench at 10× volume (sf1) plus the KG
pipeline over a ~130k-file corpus — one order of magnitude above every
number previously recorded in this repo.

Why: plan tests prove shuffle structure, but memory headroom, cache
behavior and AQE decisions only show up with volume. This run keeps every
config at its production default (local[32], the session's standard
confs) — if sf1 needed a tuning change, that change would be the bug.

sf1 tables are derived deterministically from the driver's sf0.1 parquet
(read-only) by unioning 10 key-shifted copies:
  * fact/dim keys shift by copy_i × stride so FK joins stay consistent
    and key cardinality scales 10× (no artificial key collisions);
  * bounded dims (region, nation) stay fixed, exactly like TPC-H;
  * documents rotate their word sequence per copy (cross-copy Jaccard ≈ 0,
    so the near-dup profile scales instead of exploding into 10-cliques);
  * embeddings rotate vector elements per copy (distribution preserved,
    no duplicate vectors).
Everything is pure column ops on deterministic input → byte-stable.

Usage: python tools/endurance_sf1.py  → writes $SPARK_GRAFT_ENDURANCE_OUT
(default BENCH_sf1.json); each KG sample is load-gated, headline = median.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
BASE = "/root/repo/.bench_sf1"
SF1 = os.path.join(BASE, "sf1")
CORPUS_DIR = os.path.join(BASE, "corpus_130k")
N_COPIES = 10

# key strides: far above each table's sf0.1 max key, so shifted copies
# never collide
STRIDES = {
    "orderkey": 10_000_000,
    "custkey": 1_000_000,
    "suppkey": 100_000,
    "partkey": 1_000_000,
    "event_id": 100_000_000,
    "user_id": 10_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
}


def _shift(df, col, stride, i):
    from pyspark.sql import functions as F

    return df.withColumn(col, F.col(col) + F.lit(i * stride))


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF1, exist_ok=True)
    plans = {
        "lineitem": lambda df, i: _shift(
            _shift(_shift(df, "l_orderkey", STRIDES["orderkey"], i), "l_partkey", STRIDES["partkey"], i),
            "l_suppkey", STRIDES["suppkey"], i,
        ),
        "orders": lambda df, i: _shift(
            _shift(df, "o_orderkey", STRIDES["orderkey"], i), "o_custkey", STRIDES["custkey"], i
        ),
        "customer": lambda df, i: _shift(df, "c_custkey", STRIDES["custkey"], i),
        "supplier": lambda df, i: _shift(df, "s_suppkey", STRIDES["suppkey"], i),
        "part": lambda df, i: _shift(df, "p_partkey", STRIDES["partkey"], i),
        "events": lambda df, i: _shift(
            _shift(df, "event_id", STRIDES["event_id"], i), "user_id", STRIDES["user_id"], i
        ),
        # rotate the word sequence by a DISTINCT offset per copy (2+3i:
        # injective over i=1..9 — a modular formula here once collided for
        # copies 1/8 and 2/9, silently making them byte-identical): same
        # language/length profile, but 3-shingle overlap across copies
        # collapses (no 10-cliques in the near-dup graph); n_chars
        # re-derived from the rotated text
        "documents": lambda df, i: df.withColumn(
            "text",
            F.when(F.lit(i) == 0, F.col("text"))
            .when(
                # too short to rotate (rotation would be the identity and
                # recreate byte-identical cross-copy clones): prefix a
                # per-copy token instead — still deterministic, still a
                # different shingle set per copy
                F.expr(f"size(split(text, ' ')) <= {3 * i + 2}"),
                F.concat(F.lit(f"copytok{i} "), F.col("text")),
            )
            .otherwise(
                F.concat_ws(
                    " ",
                    F.flatten(F.array(
                        F.expr(f"slice(split(text, ' '), {3 * i + 3}, size(split(text, ' ')))"),
                        F.expr(f"slice(split(text, ' '), 1, {3 * i + 2})"),
                    )),
                )
            ),
        ).withColumn("doc_id", F.col("doc_id") + F.lit(i * STRIDES["doc_id"]))
        .withColumn("n_chars", F.length("text").cast("long")),
        # rotate embedding elements by i: distinct vectors, same value
        # distribution; copy 0 keeps the original query ids (< 20)
        "embeddings": lambda df, i: df.withColumn(
            "embedding",
            F.when(F.lit(i) == 0, F.col("embedding")).otherwise(
                F.flatten(F.array(
                    F.expr(f"slice(embedding, {i + 1}, size(embedding) - {i})"),
                    F.expr(f"slice(embedding, 1, {i})"),
                ))
            ),
        ).withColumn("vec_id", F.col("vec_id") + F.lit(i * STRIDES["vec_id"])),
    }
    for name, fn in plans.items():
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        out = fn(src, 0)
        for i in range(1, N_COPIES):
            out = out.unionByName(fn(src, i))
        out.write.mode("overwrite").parquet(f"{SF1}/{name}.parquet")
        print(f"  built {name}", flush=True)
    for name in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode("overwrite").parquet(
            f"{SF1}/{name}.parquet"
        )
    # bench.py warms at <parent>/sf0.001 — point it at the driver's copy
    warm = os.path.join(BASE, "sf0.001")
    if not os.path.exists(warm):
        os.symlink("/root/testdata/sf0.001", warm)


def main() -> None:
    t_start = time.time()
    os.environ["SPARK_GRAFT_SF_DIR"] = SF1
    import bench
    from fastobo_py_spark.session import get_spark
    from fastobo_py_spark.sources.corpus import corpus_to_parquet

    bench.SF_DIR = SF1

    # completion markers, not directory existence: a crash mid-build
    # would otherwise leave a partial sf1/corpus that later runs silently
    # bench against
    sf1_done = os.path.join(SF1, "_BUILD_COMPLETE")
    if not os.path.exists(sf1_done):
        import shutil

        shutil.rmtree(SF1, ignore_errors=True)
        print("building sf1 tables (10x key-shifted copies of sf0.1)…", flush=True)
        spark = get_spark(app_name="make-sf1", master="local[32]")
        build_sf1(spark)
        spark.stop()
        open(sf1_done, "w").write("ok\n")

    n_obo, n_noise = 128_000, 2_000
    corpus_done = os.path.join(CORPUS_DIR, "_BUILD_COMPLETE")
    if not os.path.exists(corpus_done):
        import shutil

        shutil.rmtree(CORPUS_DIR, ignore_errors=True)
        print(f"generating {n_obo + n_noise}-file corpus…", flush=True)
        t0 = time.time()
        corpus_to_parquet(CORPUS_DIR, n_obo=n_obo, n_noise=n_noise, n_files=512)
        open(corpus_done, "w").write("ok\n")
        print(f"  corpus generated in {time.time() - t0:.0f}s", flush=True)

    print("bench at sf1…", flush=True)
    result = bench.run_bench()
    result["sf"] = 1.0

    print("KG pipeline over 130k files…", flush=True)
    spark = get_spark(app_name="fastobo-endurance", master="local[32]")
    # warm-up + LOAD-GATED multi-sample (VERDICT r4: a 75% best-of-2
    # spread on identical code is box state, not signal — the endurance
    # leg now meets the scaling harness's bar: gate each sample on a
    # quiet host, record every sample + its load, and headline the
    # MEDIAN with best alongside)
    bench._obo_pipeline_files_per_sec(spark, 20, 10)
    n_samples = int(os.environ.get("SPARK_GRAFT_ENDURANCE_REPS", "3"))
    samples, loads = [], []
    for _ in range(n_samples):
        loads.append(bench.load_gate())
        samples.append(bench._pipeline_from_parquet(spark, CORPUS_DIR, n_obo + n_noise))
    spark.stop()
    ordered = sorted(samples, key=lambda r: r["files_per_sec"])
    kg = ordered[len(ordered) // 2]  # median sample (headline)
    best = ordered[-1]

    result["endurance_corpus"] = {
        "n_files": n_obo + n_noise,
        "files_per_sec": round(kg["files_per_sec"], 2),
        "files_per_sec_best": round(best["files_per_sec"], 2),
        "n_edges": kg["n_edges"],
        "t_parse": kg["t_parse"],
        "t_graph": kg["t_graph"],
        "t_total": kg["t_total"],
        "cpu_sec": kg["cpu_sec"],
        "samples_files_per_sec": [round(r["files_per_sec"], 2) for r in samples],
        "samples_load_1m": loads,
        "headline_stat": "median",
    }
    result["wall_total_sec"] = round(time.time() - t_start, 1)
    out = os.environ.get("SPARK_GRAFT_ENDURANCE_OUT", "/root/repo/BENCH_sf1.json")
    with open(out, "w") as fh:
        fh.write(json.dumps(result) + "\n")
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
