"""Scale-adaptive input spreading (guide §2.5 "input skew" / §6).

The driver-provided parquet tables have 1-6 row groups, so a plain scan
runs heavy downstream map work (shingle explodes, cosine kernels, regex
batteries, window pre-sorts) on 1-6 tasks regardless of core count. At
real scale the scan already has >= shuffle-partition-count splits and
these helpers are no-ops; below that, one cheap exchange of the (small
by definition) input buys full-width parallelism for everything fused
after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _input_partitions(df: DataFrame) -> int:
    try:
        # physical-plan partition count without df.rdd's Python-row
        # serializer wrapping (which grafts an extra conversion plan)
        return df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        return df.rdd.getNumPartitions()


def spread(df: DataFrame) -> DataFrame:
    """Round-robin variant: ensure >= shuffle-partition-count partitions.

    Round-robin repartition pays a local sort of its input
    (spark.sql.execution.sortBeforeRepartition, guide §2.5) — fine for
    small/narrow inputs; prefer :func:`spread_by` with a high-cardinality
    key when the input is wide or large.
    """
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n) if _input_partitions(df) < n else df


def spread_by(df: DataFrame, *cols: str) -> DataFrame:
    """Hash variant: deterministic, no sort-before-repartition, and safe
    under task retry (guide §2.5). Use a near-unique key so the hash
    spreads evenly."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *cols) if _input_partitions(df) < n else df
