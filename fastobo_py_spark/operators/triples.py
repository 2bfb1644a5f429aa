"""O5: triple extraction — clause rows → (subj, pred, obj) edges.

Reproduces the reference's documented KG-construction scan
(``docs/examples/graph.ipynb`` cell 5: ``isinstance(clause, IsAClause)``
→ DiGraph edge) plus the other edge-bearing clause types, as one
filter+project plan — whole-stage codegen end to end, no UDFs:

  tag            reference semantics                         pred
  ----           -----------------------------------------   ----
  is_a           single parent ident (term/clause.rs:1067)    'is_a'
  relationship   typedef + target (term/clause.rs:1479)       v1 (relation)
  intersection_of genus (no rel) / differentia (rel+class)    'intersection_of:genus'
                 (term/clause.rs:1135-1244)                   / 'intersection_of:<rel>'
  union_of       class ident (term/clause.rs:1256)            'union_of'
  equivalent_to  class ident (term/clause.rs:1330)            'equivalent_to'
  disjoint_from  class ident (term/clause.rs:1404)            'disjoint_from'
  xref           foreign id (term/clause.rs:826)              'xref'
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastobo_py_spark.operators.idents import edge_idspace

# tags whose object is v1 and whose predicate is the tag itself
_SIMPLE_EDGE_TAGS = ("is_a", "union_of", "equivalent_to", "disjoint_from", "xref")


def extract_edges(clauses: DataFrame, include_xrefs: bool = True) -> DataFrame:
    """Entity clause rows → edge table (EDGE_SCHEMA).

    One narrow projection per tag class, unioned — Catalyst collapses this
    into a single scan with an OR-filter and a case-projection; no shuffle
    until someone aggregates.
    """
    ent = clauses.where(F.col("frame_type") != "Header").where(F.col("frame_id") != "")

    simple_tags = [t for t in _SIMPLE_EDGE_TAGS if include_xrefs or t != "xref"]
    simple = ent.where(F.col("tag").isin(simple_tags) & F.col("v1").isNotNull()).select(
        F.col("frame_id").alias("subj"),
        F.col("tag").alias("pred"),
        F.col("v1").alias("obj"),
        F.col("tag").alias("src_tag"),
        "doc_sha",
    )

    rel = ent.where((F.col("tag") == "relationship") & F.col("v1").isNotNull() & F.col("v2").isNotNull()).select(
        F.col("frame_id").alias("subj"),
        F.col("v1").alias("pred"),
        F.col("v2").alias("obj"),
        F.lit("relationship").alias("src_tag"),
        "doc_sha",
    )

    inter = ent.where((F.col("tag") == "intersection_of") & F.col("v2").isNotNull()).select(
        F.col("frame_id").alias("subj"),
        F.when(F.col("v1").isNull(), F.lit("intersection_of:genus"))
        .otherwise(F.concat(F.lit("intersection_of:"), F.col("v1")))
        .alias("pred"),
        F.col("v2").alias("obj"),
        F.lit("intersection_of").alias("src_tag"),
        "doc_sha",
    )

    edges = simple.unionByName(rel).unionByName(inter)
    return edges.withColumn("idspace", edge_idspace(F.col("subj")))


def edge_counts_by_pred(edges: DataFrame) -> DataFrame:
    """Metrics view: edges per predicate (partial-agg friendly)."""
    return edges.groupBy("pred").agg(F.count("*").alias("n_edges"))
