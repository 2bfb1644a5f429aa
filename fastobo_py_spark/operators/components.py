"""O10: connected components over equivalence pairs — iterative min-label
propagation as a DataFrame fixpoint.

Reference semantics: ``treat-xrefs-as-equivalent: <IDspace>`` turns
matching xrefs into equivalence statements
(``/root/reference/src/py/header/clause.rs:1203-1272``); the transitive
closure of those statements partitions ids into synonym groups.  Spark has
no built-in CC, so this is the one explicitly-engineered iterative
algorithm (SURVEY.md §4): alternating large-star/small-star style min-id
propagation with ``localCheckpoint()`` per round to cut lineage — without
the checkpoint the plan doubles every iteration and the 10th round
recompiles a 2^10-deep DAG.

Convergence: label space shrinks monotonically; iterations are bounded by
the graph diameter of the equivalence clusters (tiny in ontology practice:
xref cliques), capped by ``max_iter`` with a logged warning.

Also reused by the dedup operators (MinHash/SimHash bucket → duplicate
clusters are exactly a CC problem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(src, dst) undirected pairs → (id, component) with component =
    min id (string order) in the component.

    Plan shape per iteration: one shuffle (groupBy id) + one map-side min;
    localCheckpoint truncates lineage so iteration N doesn't recompute
    iterations 1..N-1.
    """
    # symmetric closure once; self-loops keep singletons' labels stable
    e = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .dropDuplicates()
    )
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).dropDuplicates()

    # labels: every vertex starts as its own component
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # candidate labels: my own + min label among my neighbors
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("id", "b_id"), F.col("b") == F.col("b_id"))
            .select(F.col("a").alias("id"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        # converged when no label changed
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def equivalence_components(edges: DataFrame) -> DataFrame:
    """CC over all 'equivalent_to' edges (incl. macro-synthesized) →
    (id, component). Feed the output to :func:`canonical_rewrite`."""
    pairs = edges.where(F.col("pred") == "equivalent_to").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return connected_components(pairs)


def canonical_rewrite(edges: DataFrame, components: DataFrame) -> DataFrame:
    """Rewrite edge endpoints to their component representative.

    The component map is usually small vs the edge table (only ids that
    appear in equivalence statements) — broadcast both endpoint joins.
    """
    comp_s = components.withColumnRenamed("id", "__s").withColumnRenamed("component", "__cs")
    comp_o = components.withColumnRenamed("id", "__o").withColumnRenamed("component", "__co")
    out = (
        edges.join(F.broadcast(comp_s), F.col("subj") == F.col("__s"), "left")
        .withColumn("subj", F.coalesce(F.col("__cs"), F.col("subj")))
        .drop("__s", "__cs")
        .join(F.broadcast(comp_o), F.col("obj") == F.col("__o"), "left")
        .withColumn("obj", F.coalesce(F.col("__co"), F.col("obj")))
        .drop("__o", "__co")
    )
    return out
