"""O7: mention matching — link free-text mentions to entities via names,
synonyms and xrefs.

Reference data being exploited: ``name`` clauses
(``/root/reference/src/py/term/clause.rs:258``), ``Synonym{desc, scope,
type, xrefs}`` (``src/py/syn.rs:121-129``) and xref ids that reference
foreign vocabularies (``src/py/xref.rs:39-43``).  The reference itself has
no linker — linking is the downstream KG-construction step named by the
north star; here it is an equi-join on a normalized surface form.

Scale shape: the mention dictionary (names+synonyms) is |terms|-sized —
typically the SMALL side vs a document-mention stream — so it broadcasts;
matching a 100 TB mention stream is then map-side only.  When both sides
are huge, drop the broadcast() and let AQE pick a sort-merge join on the
normalized key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def normalize_mention(col: Column) -> Column:
    """Case-fold, collapse whitespace, strip punctuation at the rim.

    Deliberately expressible in ANSI SQL (the DuckDB oracle mirrors it).
    """
    c = F.lower(F.trim(col))
    c = F.regexp_replace(c, r"[\s]+", " ")
    return F.regexp_replace(c, r"^[\"'\(\[]+|[\"'\)\]\.,;:]+$", "")


def mention_dictionary(clauses: DataFrame) -> DataFrame:
    """(doc_sha, mention, id, kind, scope): every surface form that names
    an entity — its name and every synonym (with scope)."""
    ent = clauses.where((F.col("frame_type") != "Header") & (F.col("frame_id") != ""))
    names = ent.where(F.col("tag") == "name").select(
        "doc_sha",
        normalize_mention(F.col("value_text")).alias("mention"),
        F.col("frame_id").alias("id"),
        F.lit("name").alias("kind"),
        F.lit(None).cast("string").alias("scope"),
    )
    syns = ent.where(F.col("tag") == "synonym").select(
        "doc_sha",
        normalize_mention(F.col("value_text")).alias("mention"),
        F.col("frame_id").alias("id"),
        F.lit("synonym").alias("kind"),
        "scope",
    )
    return names.unionByName(syns).where(F.col("mention") != "").dropDuplicates(
        ["doc_sha", "mention", "id", "kind"]
    )


def link_mentions(
    mentions: DataFrame,
    clauses: DataFrame,
    mention_col: str = "mention",
    broadcast_dict: bool = True,
) -> DataFrame:
    """Join arbitrary (.., mention) rows to candidate entity ids.

    Returns the input columns + (id, kind, scope, dict_doc_sha,
    n_candidates). Ambiguous mentions (shared surface forms) produce
    multiple candidate rows; ``n_candidates`` counts DISTINCT candidate
    entities per surface form — a term whose name is also declared as a
    synonym contributes several dictionary rows but one candidate, so
    the "keep only unambiguous links" consumer pattern
    (n_candidates == 1) must not see row multiplicity. The dictionary's
    doc_sha is renamed ``dict_doc_sha`` (which document declared the
    candidate) so it cannot collide with a mention-side doc_sha.
    """
    d = mention_dictionary(clauses).withColumnRenamed("doc_sha", "dict_doc_sha")
    d = d.withColumn(
        "n_candidates", F.size(F.collect_set("id").over(Window.partitionBy("mention")))
    )
    if broadcast_dict:
        # the dictionary is one row per declared surface form — corpus-
        # proportional, so the hint is size-gated (hints.py): above the
        # threshold the join falls back to shuffle on the mention key
        from fastobo_py_spark.operators.hints import gated_broadcast

        d = gated_broadcast(d)
    m = mentions.withColumn("__norm", normalize_mention(F.col(mention_col)))
    return m.join(d, m["__norm"] == d["mention"], "left").drop("__norm", "mention")


def xref_index(clauses: DataFrame) -> DataFrame:
    """Reverse xref index: (foreign_id, id, doc_sha) — which entities cite
    a foreign vocabulary id (xref clause + def/synonym xref lists)."""
    ent = clauses.where((F.col("frame_type") != "Header") & (F.col("frame_id") != ""))
    direct = ent.where(F.col("tag") == "xref").select(
        F.col("v1").alias("foreign_id"), F.col("frame_id").alias("id"), "doc_sha"
    )
    nested = (
        ent.where(F.col("xrefs").isNotNull())
        .select(F.explode("xrefs").alias("x"), F.col("frame_id").alias("id"), "doc_sha")
        .select(F.col("x.id").alias("foreign_id"), "id", "doc_sha")
    )
    return direct.unionByName(nested).dropDuplicates()
