"""Graph queries over the materialized KG: transitive ancestor closure.

The reference hands users an AST and they walk ``is_a`` chains in Python
(obonet/networkx style, one doc in memory); at corpus scale the closure
is an iterative DataFrame fixpoint — the same checkpointed-loop pattern
as the CC operator (components.py), doubling path length per round
(path-doubling: closure ∘ closure), so a depth-D hierarchy converges in
⌈log2 D⌉ joins instead of D.

Scale notes: ontology ``is_a`` DAGs are shallow (GO ≈ depth 15) and the
closure is bounded by depth × |edges|; every iteration is one self-join
on (doc_sha, vertex) + dedup, both shuffling on the same keys. For
seed-set queries ("ancestors of THESE terms") filter the base relation
first — the loop then carries only reachable frontier pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_ancestors(
    edges: DataFrame, pred: str = "is_a", max_iter: int = 25
) -> DataFrame:
    """(doc_sha, id, ancestor): transitive closure of ``pred`` edges,
    per document (ancestors never cross documents).

    Path-doubling fixpoint with ``localCheckpoint`` per round (lineage
    otherwise doubles every iteration) and a one-scalar xor fingerprint
    as the convergence probe (bit_xor cannot overflow under ANSI mode).
    """
    base = (
        edges.where(F.col("pred") == pred)
        .select("doc_sha", F.col("subj").alias("id"), F.col("obj").alias("ancestor"))
        .where(F.col("id") != F.col("ancestor"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    closure = base
    prev_fp = closure.agg(F.expr("bit_xor(xxhash64(doc_sha, id, ancestor))")).collect()[0][0]
    for _ in range(max_iter):
        hop = closure.select(
            F.col("doc_sha").alias("__d"), F.col("id").alias("__mid"), F.col("ancestor").alias("__anc")
        )
        longer = (
            closure.join(
                hop, (closure["doc_sha"] == F.col("__d")) & (closure["ancestor"] == F.col("__mid"))
            )
            .select("doc_sha", "id", F.col("__anc").alias("ancestor"))
        )
        closure = (
            closure.unionByName(longer)
            .where(F.col("id") != F.col("ancestor"))  # cycles collapse to self-pairs; drop
            .dropDuplicates()
            .localCheckpoint(eager=True)
        )
        fp = closure.agg(F.expr("bit_xor(xxhash64(doc_sha, id, ancestor))")).collect()[0][0]
        if fp == prev_fp:
            break
        prev_fp = fp
    return closure
