"""O12/O17/O18: node-table build, top-k views, idspace partitioning with
hub salting.

``build_nodes`` is the relational dual of the reference's dict-of-lists
frame aggregation (``/root/reference/src/py/abc.rs:102-109`` doctest) —
one hash aggregation per frame.  Write layout follows the north star:
edges partitioned by subject idspace; skewed hubs (GO/CHEBI-sized
prefixes) get a salt column so no single write task or downstream join
partition owns an entire hub prefix (AQE skew-join handles reads, but a
`partitionBy(idspace)` WRITE of a hot prefix needs explicit salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fastobo_py_spark.operators.idents import edge_idspace


def build_nodes(clauses: DataFrame) -> DataFrame:
    """Entity clause rows → NODE_SCHEMA (one row per frame).

    Single hash agg keyed by (doc_sha, frame_id); every attribute is a
    conditional partial aggregate, so the whole thing is one shuffle.
    Dates come out typed: ``creation_date`` stays raw for round-trips,
    ``creation_date_us`` is the parsed epoch-microsecond column
    (reference shapes at ``src/date.rs:14-123``).
    """
    from fastobo_py_spark.functions.dates import parse_creation_date

    ent = clauses.where((F.col("frame_type") != "Header") & (F.col("frame_id") != ""))
    t = F.col("tag")
    # When the cache carries the doc_key surrogate (and is hash-partitioned
    # on it), grouping by it too keeps this aggregate exchange-free.
    # Exact: doc_key is a function of doc_sha, so the extra key can never
    # split a (doc_sha, frame_id) group.
    extra_keys = ["doc_key"] if "doc_key" in clauses.columns else []
    nodes = ent.groupBy(*extra_keys, "doc_sha", F.col("frame_id").alias("id")).agg(
        F.max(F.when(t == "name", F.col("value_text"))).alias("name"),
        F.max(F.when(t == "namespace", F.col("v1"))).alias("namespace"),
        F.max(F.when(t == "def", F.col("value_text"))).alias("definition"),
        F.coalesce(F.max(F.when(t == "is_obsolete", F.col("v1") == "true")), F.lit(False)).alias("obsolete"),
        F.sort_array(F.collect_set(F.when(t == "replaced_by", F.col("v1")))).alias("replaced_by"),
        F.sort_array(F.collect_set(F.when(t == "consider", F.col("v1")))).alias("consider"),
        F.sort_array(F.collect_set(F.when(t == "alt_id", F.col("v1")))).alias("alt_ids"),
        F.sort_array(
            F.collect_list(
                F.when(t == "synonym", F.struct(F.col("value_text").alias("text"), F.col("scope").alias("scope")))
            )
        ).alias("synonyms"),
        F.sort_array(F.collect_set(F.when(t == "xref", F.col("v1")))).alias("xrefs"),
        F.max(F.when(t == "creation_date", F.col("value_text"))).alias("creation_date"),
        F.max(F.when(t == "created_by", F.col("v1"))).alias("created_by"),
        F.max(F.col("frame_type")).alias("frame_type"),
    )
    if extra_keys:
        nodes = nodes.drop(*extra_keys)
    return nodes.withColumn("idspace", edge_idspace(F.col("id"))).withColumn(
        "creation_date_us", F.unix_micros(parse_creation_date(F.col("creation_date")))
    )


def frame_dicts(clauses: DataFrame) -> DataFrame:
    """O12: per-frame map<tag, array<values>> — the dict-of-lists doctest
    (abc.rs:102-109) as one aggregation."""
    # same entity filter as build_nodes/mention_dictionary/xref_index:
    # never key a dict on an empty frame id
    ent = clauses.where((F.col("frame_type") != "Header") & (F.col("frame_id") != ""))
    per_tag = ent.groupBy("doc_sha", "frame_id", "tag").agg(
        F.sort_array(
            # first non-null slot; '' fallback keeps slotless clauses (e.g.
            # intersection_of genus rows carry only v2) in the value list
            F.collect_list(
                F.struct("clause_ix", F.coalesce("v1", "value_text", "v2", F.lit("")).alias("val"))
            )
        ).alias("vals_ix")
    )
    per_tag = per_tag.withColumn("vals", F.transform("vals_ix", lambda s: s["val"])).drop("vals_ix")
    return per_tag.groupBy("doc_sha", "frame_id").agg(
        F.map_from_entries(F.sort_array(F.collect_list(F.struct("tag", "vals")))).alias("clauses")
    )


def top_k_per_idspace(nodes: DataFrame, k: int = 5) -> DataFrame:
    """O17: smallest k ids per idspace (reference pattern:
    ``min(terms, key=str(id))`` doctest, ``src/py/mod.rs:330-331``;
    ident total order ``id.rs:308-323``)."""
    w = Window.partitionBy("idspace").orderBy("id")
    return (
        nodes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def canonical_node_view(clauses: DataFrame) -> DataFrame:
    """Corpus-level canonical node view: ONE row per canonical id ACROSS
    all documents/ontology versions.

    Per-document node/equivalence scope faithfully mirrors the
    reference's per-document rewrites (``/root/reference/src/py/doc.rs``),
    but the corpus-level KG user question — "show me this term across
    every ontology version in the lake" — needs one more hop: rewrite
    each document's node ids through its own canonicalization map, then
    aggregate across documents.

    Scale shape: the map is a dim table (alias/obsolete/equivalence
    members only — KB–MB even for GO); nodes is the big side. The join
    keys on (doc_sha, id) and the final aggregate is one hash exchange on
    ``canonical_id``; name/obsolete/alt summaries are all order-independent
    (min / any / distinct-size), so the result is deterministic under any
    partitioning."""
    from fastobo_py_spark.operators.canonicalize import combined_map_distributed
    from fastobo_py_spark.operators.hints import gated_broadcast

    nodes = build_nodes(clauses)
    cmap = gated_broadcast(
        combined_map_distributed(clauses).select(
            F.col("doc_sha").alias("__md"), F.col("old").alias("__mo"), F.col("new").alias("__mn")
        )
    )
    n = nodes.join(
        cmap, (nodes["doc_sha"] == F.col("__md")) & (nodes["id"] == F.col("__mo")), "left"
    ).withColumn("canonical_id", F.coalesce(F.col("__mn"), F.col("id")))
    return n.groupBy("canonical_id").agg(
        F.countDistinct("doc_sha").alias("n_docs"),
        F.countDistinct("id").alias("n_source_ids"),
        F.min("name").alias("name"),
        F.max(F.col("obsolete")).alias("ever_obsolete"),
        F.size(F.array_distinct(F.flatten(F.collect_list("alt_ids")))).alias("n_alt_ids"),
    )


def with_salt(df: DataFrame, key: str = "obj", n_salts: int = 16) -> DataFrame:
    """O18: deterministic salt for skewed hub keys.

    ``salt = pmod(xxhash64(key), n_salts)`` — joins/aggs over
    (idspace, salt) split a GO/CHEBI hub across ``n_salts`` tasks. AQE
    skew-join handles runtime skew in joins, but deliberate key salting is
    still required for `partitionBy` writes and groupBys on the hub key.
    """
    return df.withColumn("salt", F.pmod(F.xxhash64(F.col(key)), F.lit(n_salts)).cast("int"))


def write_graph(nodes: DataFrame, edges: DataFrame, out_dir: str, n_salts: int = 16) -> None:
    """Materialize node/edge parquet partitioned by idspace (+ salt for
    edges). On a cluster these are Iceberg tables; parquet directories are
    the sandbox stand-in (identical partition layout)."""
    nodes.write.mode("overwrite").partitionBy("idspace").parquet(f"{out_dir}/nodes")
    with_salt(edges, "subj", n_salts).write.mode("overwrite").partitionBy("idspace", "salt").parquet(
        f"{out_dir}/edges"
    )


def hub_degrees(edges: DataFrame, n_salts: int = 16) -> DataFrame:
    """O18: in-degree per object with explicit salt two-phase aggregation.

    A plain ``groupBy(obj)`` sends every edge of a GO/CHEBI hub to ONE
    reducer; salting first aggregates (obj, salt) partials — at most
    ``n_salts`` rows per hub survive to the final exchange, bounding any
    single task's input regardless of hub size (the north-star skew case).
    """
    partial = (
        with_salt(edges, "obj", n_salts)
        .groupBy("obj", "salt")
        .agg(F.count("*").alias("partial_degree"))
    )
    return partial.groupBy("obj").agg(F.sum("partial_degree").cast("long").alias("in_degree"))
