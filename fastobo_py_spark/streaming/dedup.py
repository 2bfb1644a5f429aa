"""Streaming cross-batch deduplication — exactly-once-per-CONTENT over an
unbounded document stream.

The batch dedup operators (operators/dedup.py) decide duplicates over a
closed corpus; a streaming ingest pipeline must make the same decision
against everything that EVER arrived. That is per-key custom state, the
``applyInPandasWithState`` pattern (SURVEY §2.4 O20 / the reference's
``fastobo.iter`` pull loop generalized to infinite input):

* key = content fingerprint (md5 of normalized text — the same
  fingerprint as ``operators/text.fingerprint``, so batch and stream
  agree on what "duplicate" means);
* state = one boolean per fingerprint ("already emitted"), sharded by
  key hash across executors and persisted in the streaming checkpoint —
  a restart resumes the dedup where it left off, replayed micro-batches
  re-emit nothing;
* output = exactly one (fp, keep_id, n_in_batch) row per NEW
  fingerprint, in the micro-batch where it first appears.

State size is 1 bit of logical state (plus the 32-hex key) per distinct
document ever seen — the same order as the batch manifest (O19), and the
state store spills to disk per executor, so nothing is driver-bounded.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from fastobo_py_spark.operators.text import fingerprint

DEDUP_OUTPUT = T.StructType(
    [
        T.StructField("fp", T.StringType()),
        T.StructField("keep_id", T.LongType()),
        T.StructField("n_in_batch", T.LongType()),
    ]
)

DEDUP_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def _first_seen_fn(
    key: Tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful kernel: emit one row for a fingerprint's FIRST appearance
    (keep_id = min doc_id inside that micro-batch — deterministic within
    the batch), drop every later appearance via the persisted flag."""
    if state.exists:
        return  # duplicate content in a later batch: emit nothing
    keep = None
    n = 0
    for pdf in batches:
        n += len(pdf)
        if len(pdf):
            m = int(pdf["doc_id"].min())
            keep = m if keep is None else min(keep, m)
    state.update((True,))
    yield pd.DataFrame([{"fp": key[0], "keep_id": keep, "n_in_batch": n}])


def stream_exact_dedup(docs: DataFrame) -> DataFrame:
    """Streaming (doc_id, text) rows → one (fp, keep_id, n_in_batch) row
    per distinct content, emitted in the micro-batch where the content
    first arrives. Append output mode; state lives in the checkpoint."""
    keyed = docs.select(fingerprint(F.col("text")).alias("fp"), "doc_id")
    return keyed.groupBy("fp").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=DEDUP_OUTPUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
