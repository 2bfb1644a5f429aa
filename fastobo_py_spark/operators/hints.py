"""Size-gated broadcast hints.

An unconditional ``F.broadcast`` on an unbounded dimension (alias maps,
component maps) is a 100 TB failure mode: a corpus with hundreds of
millions of declared aliases would OOM every executor on the broadcast.
``gated_broadcast`` applies the hint only when the row count is known (or
cheaply measured) to be under a threshold; above it the join falls back to
whatever Catalyst/AQE picks (sort-merge, or a runtime broadcast if AQE's
own byte-level estimate allows it).

Operators that materialize a map driver-side already know its exact size —
they stamp ``_known_rows`` on the DataFrame so the gate costs zero extra
jobs on the hot path. Distributed-path maps pay one bounded
``limit(threshold+1).count()`` probe, which is exactly the cheap insurance
the unconditional hint lacked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~2M rows of (sha64, old, new) strings ≈ 300 MB serialized — the upper
# bound of what a healthy executor broadcast should carry.
BROADCAST_ROW_THRESHOLD = 2_000_000


def known_rows(df: DataFrame, n: int) -> DataFrame:
    """Stamp an exact row count onto a DataFrame (driver-materialized maps)."""
    df._known_rows = n  # type: ignore[attr-defined]
    return df


def _footer_rows(df: DataFrame) -> int | None:
    """Exact row count from parquet footers for a bare, unfiltered scan —
    no Spark job (optimization r6, guide §1/§5: the probe count was a
    full job submission per gated call on the query hot path). Returns
    None unless the optimized plan is a single parquet Relation (any
    Filter/Project could make the footer total an over-count, which
    must not decide a broadcast the probe would have rejected — though
    over-counts could only ever SKIP a broadcast, we only use exact
    numbers). Driver-side footer reads are the same metadata Spark's
    own planning touches; at real scale the catalog/manifest supplies
    this number for free."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        lines = [ln for ln in plan.toString().splitlines() if ln.strip()]
        if len(lines) != 1 or not lines[0].startswith("Relation") or "parquet" not in lines[0]:
            return None
        files = df.inputFiles()
        if not files or len(files) > 256:
            return None
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            total += pq.ParquetFile(f.removeprefix("file:")).metadata.num_rows
        return total
    except Exception:
        return None


def gated_broadcast(df: DataFrame, threshold: int | None = None) -> DataFrame:
    """``F.broadcast(df)`` iff its row count is ≤ threshold, else ``df``.

    Row count comes from a ``known_rows`` stamp when present (free), else
    from parquet footer metadata for bare scans (free, no job), else from
    one bounded count probe (``limit(threshold+1).count()``).
    """
    t = BROADCAST_ROW_THRESHOLD if threshold is None else threshold
    n = getattr(df, "_known_rows", None)
    if n is None:
        n = _footer_rows(df)
    if n is None:
        n = df.limit(t + 1).count()
    return F.broadcast(df) if n <= t else df
