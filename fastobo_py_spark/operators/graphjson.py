"""OBO-graph JSON I/O — parity with ``fastobo.dump_graph`` / ``load_graph``
(``/root/reference/src/py/mod.rs:333-422``).

The OBO-graphs model (github.com/geneontology/obographs, public spec):
``{"graphs": [{"id", "nodes": [{"id": <iri>, "lbl", "type", "meta"}],
"edges": [{"sub", "pred", "obj"}]}]}`` with OBO PURL IRIs and
``is_a`` rendered as ``"is_a"``.

Spark-first: dump = one ``to_json(struct(...))`` projection + per-doc
aggregation; load = ``spark.read.json`` + explode back into node/edge
DataFrames. No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastobo_py_spark.operators.idents import compact_url, decompact_prefixed


def dump_graph(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(doc_sha, graph_json): one OBO-graph JSON document per source doc.

    Node ids and edge endpoints are decompacted to OBO PURL IRIs, the
    obographs convention (reference serializes via fastobo-graphs the
    same way).
    """
    n = nodes.select(
        "doc_sha",
        F.struct(
            decompact_prefixed(F.col("id")).alias("id"),
            F.col("name").alias("lbl"),
            F.when(F.col("frame_type") == "Typedef", F.lit("PROPERTY")).otherwise(F.lit("CLASS")).alias("type"),
        ).alias("node"),
    ).groupBy("doc_sha").agg(F.sort_array(F.collect_list("node")).alias("nodes"))

    e = edges.select(
        "doc_sha",
        F.struct(
            decompact_prefixed(F.col("subj")).alias("sub"),
            F.when(F.col("pred") == "is_a", F.lit("is_a")).otherwise(decompact_prefixed(F.col("pred"))).alias(
                "pred"
            ),
            decompact_prefixed(F.col("obj")).alias("obj"),
        ).alias("edge"),
    ).groupBy("doc_sha").agg(F.sort_array(F.collect_list("edge")).alias("edges"))

    doc = n.join(e, "doc_sha", "full_outer").select(
        "doc_sha",
        F.to_json(
            F.struct(
                F.array(
                    F.struct(
                        F.col("doc_sha").alias("id"),
                        F.coalesce("nodes", F.array()).alias("nodes"),
                        F.coalesce("edges", F.array()).alias("edges"),
                    )
                ).alias("graphs")
            )
        ).alias("graph_json"),
    )
    return doc


def load_graph(spark: SparkSession, json_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Inverse of :func:`dump_graph`: (doc_sha, graph_json) → (nodes, edges).

    Ids are compacted back through the default OBO PURL rule
    (``doc.rs:210-248`` semantics).
    """
    schema = (
        "graphs array<struct<id:string,"
        "nodes:array<struct<id:string,lbl:string,type:string>>,"
        "edges:array<struct<sub:string,pred:string,obj:string>>>>"
    )
    parsed = json_df.select("doc_sha", F.from_json("graph_json", schema).alias("g"))
    g = parsed.select("doc_sha", F.explode("g.graphs").alias("graph"))
    nodes = g.select(
        "doc_sha",
        F.explode("graph.nodes").alias("n"),
    ).select(
        "doc_sha",
        compact_url(F.col("n.id")).alias("id"),
        F.col("n.lbl").alias("name"),
        F.when(F.col("n.type") == "PROPERTY", F.lit("Typedef")).otherwise(F.lit("Term")).alias("frame_type"),
    )
    edges = g.select("doc_sha", F.explode("graph.edges").alias("e")).select(
        "doc_sha",
        compact_url(F.col("e.sub")).alias("subj"),
        F.when(F.col("e.pred") == "is_a", F.lit("is_a")).otherwise(compact_url(F.col("e.pred"))).alias("pred"),
        compact_url(F.col("e.obj")).alias("obj"),
    )
    return nodes, edges
