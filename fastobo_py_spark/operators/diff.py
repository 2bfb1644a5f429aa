"""O15: ontology version diffing — set operations over clause/edge tables.

The reference's value-equality scans (``XrefList.__contains__``,
``/root/reference/src/py/xref.rs:275-287``) generalize at corpus scale to
diffing two parses of an evolving ontology corpus: which triples appeared,
disappeared, which frames changed. Pure ``except``/``intersect``/join
plans — no UDFs, fully shuffle-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EDGE_KEY = ["subj", "pred", "obj"]


def edge_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(subj, pred, obj, change ∈ {'added','removed'}) between two edge sets."""
    o = old.select(*_EDGE_KEY).dropDuplicates()
    n = new.select(*_EDGE_KEY).dropDuplicates()
    added = n.exceptAll(o).withColumn("change", F.lit("added"))
    removed = o.exceptAll(n).withColumn("change", F.lit("removed"))
    return added.unionByName(removed)


def frame_change_summary(old_clauses: DataFrame, new_clauses: DataFrame) -> DataFrame:
    """Per-frame change audit: added / removed / modified / unchanged.

    A frame's content hash = order-insensitive xor of clause-row hashes —
    one aggregation per side, one full-outer join on frame id.
    """

    def frame_hashes(clauses: DataFrame) -> DataFrame:
        # two-level: hash every clause row over ALL payload slots, count
        # multiplicity, then xor (row-hash, n) pairs — a frame gaining or
        # losing a PAIR of identical clause lines can no longer cancel out
        # of a plain xor, and scope/xref-only edits are visible.
        ent = clauses.where((F.col("frame_type") != "Header") & (F.col("frame_id") != ""))

        def slot(c):
            # xxhash64 SKIPS null inputs, so NULL and '' would hash the
            # same under a bare coalesce — carry an explicit null flag so
            # a NULL↔'' edit reads as a modification
            return [F.isnull(c).cast("int"), F.coalesce(c, F.lit(""))]

        row_hash = F.xxhash64(
            # frame_type participates: a Term↔Typedef conversion with an
            # identical clause payload is a real semantic change
            "frame_type",
            "tag",
            *slot(F.col("v1")),
            *slot(F.col("v2")),
            *slot(F.col("value_text")),
            *slot(F.col("scope")),
            *slot(F.col("datatype")),
            *slot(F.col("comment")),
            *slot(F.to_json("xrefs")),
            *slot(F.to_json("qualifiers")),
        )
        per_clause = ent.groupBy(F.col("frame_id").alias("id"), row_hash.alias("rh")).agg(
            F.count("*").alias("n")
        )
        return per_clause.groupBy("id").agg(
            F.expr("bit_xor(xxhash64(rh, n))").alias("content_hash")
        )

    o = frame_hashes(old_clauses).withColumnRenamed("content_hash", "old_hash")
    n = frame_hashes(new_clauses).withColumnRenamed("content_hash", "new_hash")
    joined = o.join(n, "id", "full_outer")
    return joined.select(
        "id",
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    )
