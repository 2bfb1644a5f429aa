#!/usr/bin/env python
"""Measured hot-key evidence for the window-based operators
(VERDICT r5 "what's wrong" #3; optimization r6).

Joins and partitioned writes got measured skew evidence in r3-r4
(tools/skew_demo.py); the window operators (events_sessionize,
asof_join, text_pack) never did. Each funnels a full key partition
through ONE task (`Window.partitionBy(key)`), and AQE's skew handling
splits join/aggregate partitions but NOT window partitions — so a
celebrity key serializes on one core no matter the cluster size.

This demo quantifies that bound for the sessionize shape (lag + running
sum over a per-user time-ordered window — the same plan events_sessionize
uses) on 5M events at local[16]:

  * uniform: 10k users, ~500 rows each (the bench's shape)
  * skewed:  90% of all rows on ONE user_id, rest uniform

and also times the salted two-phase rewrite (per-(key, salt) windows over
time-contiguous slices, then one merge pass per key) to show what the fix
buys WITHOUT shipping it: the bench's declared query keeps the plain
shape, because its results are oracle-frozen this round and the salted
twin would be a new code path needing its own oracle row (next round's
work). The numbers land in BENCH.md / OPTIMIZATION_r06.md as the
documented bound.

Run: python tools/window_skew_demo.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fastobo_py_spark import get_spark

    spark = get_spark(master="local[16]")
    n = 5_000_000
    gap_us = 1800 * 1_000_000

    def events(skewed: bool):
        # ts strictly increasing per user; 90% hub key when skewed
        base = spark.range(n)
        if skewed:
            uid = F.when(F.col("id") % 10 < 9, 0).otherwise((F.col("id") % 10_000) + 1)
        else:
            uid = F.col("id") % 10_000
        return base.select(
            F.col("id").alias("event_id"),
            uid.cast("long").alias("user_id"),
            # seconds-scale steps with occasional >30min jumps so sessions split
            (F.col("id") * 7 + (F.col("id") % 97) * 2200).cast("long").alias("ts_s"),
        ).persist()

    def sessionize_plain(ev):
        w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
        us = F.col("ts_s") * 1_000_000
        lag_us = F.lag(F.col("ts_s"), 1).over(w) * 1_000_000
        gap = F.when(us - lag_us > gap_us, 1).otherwise(0)
        sess = ev.withColumn("new_sess", F.coalesce(gap, F.lit(0))).withColumn(
            "session_ix", F.sum("new_sess").over(w)
        )
        return sess.groupBy("user_id", "session_ix").agg(
            F.count("*").alias("n_events"),
            (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
        )

    def sessionize_salted(ev, n_salt: int = 16):
        # phase 1: windows over time-CONTIGUOUS slices per key. The salt
        # MUST be a contiguous time-range bucket (not a modulo — a cycling
        # salt would put disjoint intervals in one slice and compute gaps
        # between non-adjacent events). Bucket width = ts range / n_salt;
        # at real scale the range comes from the stream watermark or
        # partition metadata, here from the generator's known max (~35.3M).
        sliced = ev.withColumn("salt", F.floor(F.col("ts_s") / (35_300_000 // n_salt)))
        w1 = Window.partitionBy("user_id", "salt").orderBy("ts_s", "event_id")
        lag1 = F.lag(F.col("ts_s"), 1).over(w1)
        first_in_slice = lag1.isNull()
        gap1 = F.when((F.col("ts_s") - lag1) * 1_000_000 > gap_us, 1).otherwise(0)
        p1 = sliced.select(
            "user_id",
            "salt",
            "ts_s",
            "event_id",
            F.coalesce(gap1, F.lit(0)).alias("gap_in_slice"),
            first_in_slice.alias("is_first"),
            F.when(first_in_slice, F.col("ts_s")).alias("slice_first_ts"),
        )
        # phase 2: per-key merge — only slice-boundary rows (n_salt per
        # key) cross the second, tiny exchange; running session index =
        # sum of in-slice gaps + boundary gaps decided against the
        # previous slice's last ts
        slice_stats = p1.groupBy("user_id", "salt").agg(
            F.min("ts_s").alias("s_min"),
            F.max("ts_s").alias("s_max"),
            F.sum("gap_in_slice").alias("s_gaps"),
        )
        w2 = Window.partitionBy("user_id").orderBy("s_min")
        prev_max = F.lag("s_max", 1).over(w2)
        bgap = F.when((F.col("s_min") - prev_max) * 1_000_000 > gap_us, 1).otherwise(0)
        offsets = slice_stats.select(
            "user_id",
            "salt",
            (
                F.sum(F.col("s_gaps") + F.coalesce(bgap, F.lit(0))).over(w2)
                - F.col("s_gaps")
            ).alias("base_ix"),
        )
        w3 = Window.partitionBy("user_id", "salt").orderBy("ts_s", "event_id")
        joined = p1.join(offsets, ["user_id", "salt"]).withColumn(
            "session_ix", F.col("base_ix") + F.sum("gap_in_slice").over(w3)
        )
        return joined.groupBy("user_id", "session_ix").agg(
            F.count("*").alias("n_events"),
            (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
        )

    def timeit(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    results = {}
    for name, skewed in (("uniform", False), ("skewed90", True)):
        ev = events(skewed)
        ev.count()
        # warm codegen once on a slice, then best-of-2 per variant
        timeit(sessionize_plain(ev.limit(10_000)))
        plain = min(timeit(sessionize_plain(ev)) for _ in range(2))
        salted = min(timeit(sessionize_salted(ev)) for _ in range(2))
        # equivalence check on the skewed data: the salted rewrite must
        # produce the identical session multiset
        if skewed:
            a = sessionize_plain(ev)
            b = sessionize_salted(ev)
            diff = a.exceptAll(b).count() + b.exceptAll(a).count()
            results["salted_equal"] = diff == 0
        results[name] = {"plain_s": round(plain, 2), "salted_s": round(salted, 2)}
        ev.unpersist()

    hot = results["skewed90"]["plain_s"]
    uni = results["uniform"]["plain_s"]
    print(
        f"uniform:  plain {results['uniform']['plain_s']}s  salted {results['uniform']['salted_s']}s\n"
        f"skewed90: plain {results['skewed90']['plain_s']}s  salted {results['skewed90']['salted_s']}s\n"
        f"hot-key slowdown (plain, 90% hub vs uniform): {hot / uni:.2f}x\n"
        f"salted two-phase recovers: {hot / results['skewed90']['salted_s']:.2f}x on the skewed set\n"
        f"salted == plain on skewed data: {results.get('salted_equal')}\n"
        f"(5M events, local[16], noop sink, best of 2, warmed)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
