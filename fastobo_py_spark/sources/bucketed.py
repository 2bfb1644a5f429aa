"""Bucketed tables: co-located joins with ZERO runtime exchange.

At 100 TB the dominant recurring cost of the star-schema queries is
re-shuffling fact tables on their join keys. Bucketing moves that shuffle
to WRITE time, once: both sides persisted with ``bucketBy(n, key)`` into
the catalog expose ``HashPartitioning(key, n)`` straight off the file
scan, so every subsequent equi-join on the key plans with no Exchange on
either side — the disk layout is the shuffle. (On a real deployment the
same contract comes from Iceberg's bucket partition transform; the Spark
planner consumes it identically.)

Rules the planner enforces (and the test pins):
  * both sides bucketed on the join key with the SAME bucket count;
  * ``spark.sql.sources.bucketing.enabled`` (default true);
  * sortBy at write time additionally removes the runtime Sort under a
    sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    n_buckets: int = 8,
    sort_by: list[str] | str | None = None,
) -> None:
    """Persist ``df`` as a bucketed catalog table (parquet).

    One shuffle now, zero shuffles for every future join/aggregation on
    ``keys`` at matching bucket counts.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *keys)
    if sort_by:
        sort_by = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_on: str,
    right_on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys — plans
    exchange-free when both were written via :func:`write_bucketed` with
    the same ``n_buckets``."""
    lt, rt = spark.table(left_table), spark.table(right_table)
    if right_on is None or right_on == left_on:
        # name-form join: dedups the shared key column (the expression
        # form kept TWO identically-named key columns, so any later
        # reference to the key raised AMBIGUOUS_REFERENCE)
        return lt.join(rt, left_on, how=how)
    return lt.join(rt, lt[left_on] == rt[right_on], how=how)
