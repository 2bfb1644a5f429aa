"""Columnar schemas — the relational dual of the reference's typed AST.

The reference models a document as a tree of heap objects
(``OboDoc -> EntityFrame -> TermClause...``, see
``/root/reference/src/py/doc.rs:95-102`` and ``term/frame.rs:27-34``).
Here a document is a row of the corpus table and its AST is a set of rows
in one flat *clause* table; every one of the reference's ~90 typed clause
classes (``src/py/header/clause.rs``, ``term/clause.rs``,
``typedef/clause.rs``) maps onto this schema as a (tag, slot-assignment)
contract — so downstream "typed getters" are plain Catalyst projections,
not Python classes.

Slot contract per tag (see ``fastobo_py_spark/obo/grammar.py`` for the
authoritative table):
  * ``v1``/``v2``    — predicate/object ident slots (unescaped canonical
                       form, e.g. ``value-type:xsd:string``)
  * ``value_text``   — free-text payload (name, def text, synonym text, ...)
  * ``xrefs``        — ``[Term] def:/synonym:/xref lists`` (id + quoted desc)
  * ``qualifiers``   — trailing ``{k="v", ...}`` block
                       (``src/py/abc.rs:160-165``)
  * ``comment``      — trailing ``! ...`` line comment
  * ``scope``        — synonym scope EXACT/BROAD/NARROW/RELATED
                       (``src/py/syn.rs:68-82``)
  * ``datatype``     — property_value literal datatype (``src/py/pv.rs:92-96``)
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input corpus (BASELINE.json input_hint): one row per file of a repo corpus.
# ---------------------------------------------------------------------------
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

XREF_TYPE = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("desc", T.StringType()),
    ]
)

QUALIFIER_TYPE = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Clause rows: the whole AST, exploded. One row per parsed clause.
# ---------------------------------------------------------------------------
CLAUSE_SCHEMA = T.StructType(
    [
        # identity of the source row (sha256(content) — the per-row
        # invariant vs the reference per BASELINE.json input_hint)
        T.StructField("doc_sha", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        # frame coordinates
        T.StructField("frame_type", T.StringType()),  # Header|Term|Typedef|Instance
        T.StructField("frame_id", T.StringType()),  # entity id ('' for header)
        T.StructField("frame_ix", T.IntegerType()),  # 0=header, 1..N entities
        T.StructField("clause_ix", T.IntegerType()),  # declaration order in frame
        # the clause itself
        T.StructField("tag", T.StringType()),
        T.StructField("v1", T.StringType()),
        T.StructField("v2", T.StringType()),
        T.StructField("value_text", T.StringType()),
        T.StructField("xrefs", T.ArrayType(XREF_TYPE)),
        T.StructField("qualifiers", T.ArrayType(QUALIFIER_TYPE)),
        T.StructField("comment", T.StringType()),
        T.StructField("scope", T.StringType()),
        T.StructField("datatype", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Parse errors are data, not job failures (reference raises per-doc
# SyntaxError, src/error.rs:78-91; at 10^12-file scale errors quarantine).
# ---------------------------------------------------------------------------
QUARANTINE_SCHEMA = T.StructType(
    [
        T.StructField("doc_sha", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("error_kind", T.StringType()),
        T.StructField("error_msg", T.StringType()),
        T.StructField("line_no", T.IntegerType()),
    ]
)

# Parse output = clause rows UNION quarantine rows in one pass (a second
# pass over 100 TB just to collect errors would double the scan).  The
# mapInPandas UDF emits this combined shape; callers split by `is_error`.
PARSE_OUTPUT_SCHEMA = T.StructType(
    CLAUSE_SCHEMA.fields
    + [
        T.StructField("is_error", T.BooleanType()),
        T.StructField("error_kind", T.StringType()),
        T.StructField("error_msg", T.StringType()),
        T.StructField("line_no", T.IntegerType()),
    ]
)

# ---------------------------------------------------------------------------
# Graph tables (FIXTURES.md §2)
# ---------------------------------------------------------------------------
EDGE_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("src_tag", T.StringType()),
        T.StructField("doc_sha", T.StringType()),
        T.StructField("idspace", T.StringType()),
    ]
)

NODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("namespace", T.StringType()),
        T.StructField("definition", T.StringType()),
        T.StructField("obsolete", T.BooleanType()),
        T.StructField("replaced_by", T.ArrayType(T.StringType())),
        T.StructField("consider", T.ArrayType(T.StringType())),
        T.StructField("alt_ids", T.ArrayType(T.StringType())),
        T.StructField(
            "synonyms",
            T.ArrayType(
                T.StructType([T.StructField("text", T.StringType()), T.StructField("scope", T.StringType())])
            ),
        ),
        T.StructField("xrefs", T.ArrayType(T.StringType())),
        T.StructField("creation_date", T.StringType()),   # raw text (round-trip)
        T.StructField("created_by", T.StringType()),
        T.StructField("idspace", T.StringType()),
        T.StructField("creation_date_us", T.LongType()),  # typed epoch µs
    ]
)
