#!/usr/bin/env python
"""Extra benchmarks for the optimization round (guide §1).

NOT the driver artifact — bench.py stays frozen. This harness isolates
each declared query with the noop sink (times the computation, not the
sink or `.count()`'s column pruning), labels jobs, and dumps
`.explain("formatted")` to plans/r06/.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--plans-dir plans/r06]
                        [--suffix before] [query ...]

Defaults to the bench headline queries. Prints one JSON line with
per-query noop seconds (min of reps) and writes
plans/r06/<query>_<suffix>.txt for each.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

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


def main() -> None:
    args = sys.argv[1:]

    def opt(name: str, default: str) -> str:
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    sf = opt("--sf", SF_DIR)
    reps = int(opt("--reps", "3"))
    plans_dir = opt("--plans-dir", "plans/r06")
    suffix = opt("--suffix", "before")
    names = args or HEADLINE

    from fastobo_py_spark import queries as Q
    from fastobo_py_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", master=f"local[{CPUS}]")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict = {"sf": sf, "reps": reps, "noop_sec": {}, "samples": {}}
    for name in names:
        fn = Q.QUERIES[name]
        # warm once at the smallest SF (codegen + py-worker startup)
        warm_dir = os.path.join(os.path.dirname(sf.rstrip("/")), "sf0.001")
        if os.path.isdir(warm_dir):
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        # plan dump (of the SF-dir plan, the one that is timed)
        df = fn(spark, sf)
        with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} noop rep{r}")
            t0 = time.time()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out["samples"][name] = samples
        out["noop_sec"][name] = min(samples)
    out["total_min"] = round(sum(out["noop_sec"].values()), 3)
    out["load_1m"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
