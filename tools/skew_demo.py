#!/usr/bin/env python
"""Measured hub-skew evidence for O18 (BENCH.md 'Round 4: skew').

Builds a 10M-edge table where one idspace holds 90% of rows (the
north-star GO/CHEBI shape) and times the idspace-partitioned write with
and without the repo's subject-hash salting (materialize.with_salt).

Run: python tools/skew_demo.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from fastobo_py_spark import get_spark
    from fastobo_py_spark.operators.materialize import with_salt

    spark = get_spark(master="local[16]")
    n = 10_000_000
    edges = spark.range(n).select(
        F.concat(F.lit("T:"), F.col("id")).alias("subj"),
        F.when(F.col("id") % 10 < 9, "GO")
        .otherwise(F.concat(F.lit("X"), (F.col("id") % 50).cast("string")))
        .alias("idspace"),
        F.concat(F.lit("O:"), (F.col("id") % 1000).cast("string")).alias("obj"),
    ).persist()
    edges.count()
    base = tempfile.mkdtemp(prefix="skew_demo_")
    try:
        # warm the write path once (codegen + committer init would
        # otherwise inflate whichever variant runs first), then alternate
        # variants best-of-2 — the repo's bench convention
        edges.limit(1000).write.mode("overwrite").parquet(f"{base}/warm")
        t_unsalted, t_salted = float("inf"), float("inf")
        for _ in range(2):
            t0 = time.time()
            edges.repartition("idspace").write.mode("overwrite").partitionBy("idspace").parquet(
                f"{base}/unsalted"
            )
            t_unsalted = min(t_unsalted, time.time() - t0)
            t0 = time.time()
            with_salt(edges, "subj", 16).repartition("idspace", "salt").write.mode(
                "overwrite"
            ).partitionBy("idspace", "salt").parquet(f"{base}/salted")
            t_salted = min(t_salted, time.time() - t0)
        print(
            f"unsalted: {t_unsalted:.2f}s  salted: {t_salted:.2f}s  "
            f"speedup: {t_unsalted / t_salted:.2f}x  (90% hub, local[16], best of 2, warmed)"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
