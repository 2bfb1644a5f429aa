"""O8/O9/O11: entity canonicalization — alias merge, obsolete redirect,
treat-xrefs macro rewrites.

Reference semantics being reproduced:
  * ``alt_id:`` declares alternate ids for a frame
    (``/root/reference/src/py/term/clause.rs:403-410``) → rewrite any
    subj/obj that is an alt_id to its canonical frame id.
  * ``is_obsolete`` + ``replaced_by`` (hard redirect) / ``consider``
    (advisory only) (``term/clause.rs:1564,1630,1705``; validation
    pattern in ``docs/examples/obsolete.ipynb`` cell 4) → rewrite edge
    endpoints pointing at obsolete terms to their replacement.
  * ``treat-xrefs-as-is_a`` / ``-as-relationship(rel)`` /
    ``-as-genus-differentia(rel, filler)`` / reverse / ``-as-has-subclass``
    header macros (``header/clause.rs:1283-1642``) → synthesize edges from
    xref rows whose object prefix matches the macro idspace.

Scale notes: the alias and redirect maps are proportional to the number of
*declared aliases*, orders of magnitude smaller than the edge table — both
are broadcast; the edge rewrite is a map-side join, no shuffle of edges.
Macro lists are per-document header metadata — also broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastobo_py_spark.operators.idents import ident_prefix


def alias_map(clauses: DataFrame) -> DataFrame:
    """(doc_sha, alias, canonical) from alt_id declarations (O8)."""
    return (
        clauses.where((F.col("tag") == "alt_id") & (F.col("frame_id") != ""))
        .select("doc_sha", F.col("v1").alias("alias"), F.col("frame_id").alias("canonical"))
        .dropDuplicates(["doc_sha", "alias"])
    )


def replacement_map(clauses: DataFrame) -> DataFrame:
    """(doc_sha, obsolete_id, replacement) from replaced_by (O9).

    Only hard redirects; ``consider`` is advisory (kept on nodes, not used
    to rewrite edges) per the reference's distinction.
    Multi-valued replaced_by: pick the lexicographically first target —
    deterministic, matching the "first declared wins" reading via
    min(clause_ix).
    """
    w = (
        clauses.where((F.col("tag") == "replaced_by") & (F.col("frame_id") != ""))
        .groupBy("doc_sha", F.col("frame_id").alias("obsolete_id"))
        .agg(F.min_by("v1", "clause_ix").alias("replacement"))
    )
    return w


def rewrite_edges(edges: DataFrame, clauses: DataFrame, max_hops: int = 3) -> DataFrame:
    """Canonicalize edge endpoints: alias merge, then obsolete redirect
    iterated ``max_hops`` times (replaced_by chains are short in practice;
    a fixpoint loop over a broadcast map costs one map-side join per hop).
    """
    aliases = F.broadcast(alias_map(clauses))
    repl = F.broadcast(replacement_map(clauses))

    def _rewrite(df: DataFrame, col: str, m: DataFrame, key: str, val: str) -> DataFrame:
        mm = m.withColumnRenamed(key, f"__k_{col}").withColumnRenamed(val, f"__v_{col}").withColumnRenamed(
            "doc_sha", "__d"
        )
        out = df.join(
            F.broadcast(mm),
            (F.col("doc_sha") == F.col("__d")) & (F.col(col) == F.col(f"__k_{col}")),
            "left",
        )
        return out.withColumn(col, F.coalesce(F.col(f"__v_{col}"), F.col(col))).drop(
            f"__k_{col}", f"__v_{col}", "__d"
        )

    out = _rewrite(edges, "subj", aliases, "alias", "canonical")
    out = _rewrite(out, "obj", aliases, "alias", "canonical")
    for _ in range(max_hops):
        out = _rewrite(out, "subj", repl, "obsolete_id", "replacement")
        out = _rewrite(out, "obj", repl, "obsolete_id", "replacement")
    return out


# ---------------------------------------------------------------------------
# O11: treat-xrefs header macros
# ---------------------------------------------------------------------------

def macro_table(clauses: DataFrame) -> DataFrame:
    """Normalize all treat-xrefs-* header clauses into one macro dim:
    (doc_sha, kind, macro_idspace, rel, filler)."""
    hdr = clauses.where(F.col("frame_type") == "Header")
    simple = hdr.where(
        F.col("tag").isin("treat-xrefs-as-equivalent", "treat-xrefs-as-is_a", "treat-xrefs-as-has-subclass")
    ).select(
        "doc_sha",
        F.col("tag").alias("kind"),
        F.col("v1").alias("macro_idspace"),
        F.lit(None).cast("string").alias("rel"),
        F.lit(None).cast("string").alias("filler"),
    )
    rel = hdr.where(F.col("tag") == "treat-xrefs-as-relationship").select(
        "doc_sha",
        F.col("tag").alias("kind"),
        F.col("v1").alias("macro_idspace"),
        F.col("v2").alias("rel"),
        F.lit(None).cast("string").alias("filler"),
    )
    gd = hdr.where(
        F.col("tag").isin("treat-xrefs-as-genus-differentia", "treat-xrefs-as-reverse-genus-differentia")
    ).select(
        "doc_sha",
        F.col("tag").alias("kind"),
        F.col("v1").alias("macro_idspace"),
        F.col("v2").alias("rel"),
        F.col("value_text").alias("filler"),
    )
    return simple.unionByName(rel).unionByName(gd)


def apply_xref_macros(edges: DataFrame, clauses: DataFrame) -> DataFrame:
    """Synthesize edges from xref rows per header macros (O11).

    xref edges whose object prefix matches a macro idspace in the same doc
    produce, per macro kind:
      equivalent        → (subj, 'equivalent_to', xref)
      is_a              → (subj, 'is_a', xref)
      has-subclass      → (xref, 'is_a', subj)          [reversed]
      relationship(rel) → (subj, rel, xref)
      genus-differentia(rel, filler)
                        → (subj, 'intersection_of:genus', xref)
                          + (subj, 'intersection_of:<rel>', filler)
      reverse-genus-differentia
                        → (xref, 'intersection_of:genus', subj)
                          + (xref, 'intersection_of:<rel>', filler)

    Returns the input edges unioned with the synthesized ones. The macro
    dim is broadcast; the xref scan shuffles nothing.
    """
    macros = F.broadcast(macro_table(clauses).withColumnRenamed("doc_sha", "__d"))
    xr = edges.where(F.col("src_tag") == "xref")
    m = xr.join(
        macros,
        (xr["doc_sha"] == macros["__d"]) & (ident_prefix(xr["obj"]) == macros["macro_idspace"]),
        "inner",
    ).drop("__d")

    eq = m.where(F.col("kind") == "treat-xrefs-as-equivalent").select(
        "subj", F.lit("equivalent_to").alias("pred"), "obj", F.lit("xref-macro").alias("src_tag"), "doc_sha", "idspace"
    )
    isa = m.where(F.col("kind") == "treat-xrefs-as-is_a").select(
        "subj", F.lit("is_a").alias("pred"), "obj", F.lit("xref-macro").alias("src_tag"), "doc_sha", "idspace"
    )
    hassub = m.where(F.col("kind") == "treat-xrefs-as-has-subclass").select(
        F.col("obj").alias("subj"),
        F.lit("is_a").alias("pred"),
        F.col("subj").alias("obj"),
        F.lit("xref-macro").alias("src_tag"),
        "doc_sha",
        "idspace",
    )
    relm = m.where(F.col("kind") == "treat-xrefs-as-relationship").select(
        "subj", F.col("rel").alias("pred"), "obj", F.lit("xref-macro").alias("src_tag"), "doc_sha", "idspace"
    )
    gd = m.where(F.col("kind") == "treat-xrefs-as-genus-differentia")
    gd_genus = gd.select(
        "subj", F.lit("intersection_of:genus").alias("pred"), "obj",
        F.lit("xref-macro").alias("src_tag"), "doc_sha", "idspace",
    )
    gd_diff = gd.select(
        "subj", F.concat(F.lit("intersection_of:"), F.col("rel")).alias("pred"), F.col("filler").alias("obj"),
        F.lit("xref-macro").alias("src_tag"), "doc_sha", "idspace",
    )
    rgd = m.where(F.col("kind") == "treat-xrefs-as-reverse-genus-differentia")
    rgd_genus = rgd.select(
        F.col("obj").alias("subj"), F.lit("intersection_of:genus").alias("pred"), F.col("subj").alias("obj"),
        F.lit("xref-macro").alias("src_tag"), "doc_sha", "idspace",
    )
    rgd_diff = rgd.select(
        F.col("obj").alias("subj"),
        F.concat(F.lit("intersection_of:"), F.col("rel")).alias("pred"),
        F.col("filler").alias("obj"),
        F.lit("xref-macro").alias("src_tag"),
        "doc_sha",
        "idspace",
    )

    synthesized = eq.unionByName(isa).unionByName(hassub).unionByName(relm).unionByName(gd_genus).unionByName(
        gd_diff
    ).unionByName(rgd_genus).unionByName(rgd_diff)
    return edges.unionByName(synthesized)
