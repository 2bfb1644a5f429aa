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

from fastobo_py_spark.operators.hints import gated_broadcast, known_rows
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


def resolution_map(clauses: DataFrame, max_hops: int = 3, driver_threshold: int = 5_000_000) -> DataFrame:
    """Compose alias + replacement chains into ONE lookup map
    (doc_sha, old, new).

    The chain resolution iterates on the MAP (alias declarations only,
    orders of magnitude smaller than the edge table), never on edges.
    Scale-adaptive like the CC operator: below ``driver_threshold``
    entries the composition happens driver-side in one pass (one Arrow
    collect + one createDataFrame instead of 5 shuffle/broadcast jobs);
    above it, the map composes distributedly by self-joining ``max_hops``
    times. Semantics (alias first, then ``max_hops`` replacement
    applications) match the sequential reference reading and oracle.py.
    """
    aliases = alias_map(clauses)
    repl = replacement_map(clauses)
    # ONE driver job fetches both maps (limit guards the driver: if the
    # fetch hits the cap, fall through to the distributed composition)
    import pandas as pd

    both = (
        aliases.select(F.col("alias").alias("old"), F.col("canonical").alias("new"), "doc_sha", F.lit(0).alias("k"))
        .unionByName(
            repl.select(
                F.col("obsolete_id").alias("old"), F.col("replacement").alias("new"), "doc_sha", F.lit(1).alias("k")
            )
        )
        .limit(driver_threshold + 1)
        .toPandas()
    )
    if len(both) <= driver_threshold:
        a = both[both["k"] == 0][["doc_sha", "old", "new"]]
        r = both[both["k"] == 1][["doc_sha", "old", "new"]]
        # repl keys enter at identity so every entry receives exactly
        # max_hops applications; alias wins when both are declared.
        ident = r[["doc_sha", "old"]].copy()
        ident["new"] = ident["old"]
        base = pd.concat([a, ident], ignore_index=True).drop_duplicates(["doc_sha", "old"], keep="first")
        lut = r.rename(columns={"old": "__k", "new": "__v"})
        for _ in range(max_hops):
            base = base.merge(lut, how="left", left_on=["doc_sha", "new"], right_on=["doc_sha", "__k"])
            base["new"] = base["__v"].fillna(base["new"])
            base = base.drop(columns=["__k", "__v"])
        base = base[base["old"] != base["new"]]
        spark = clauses.sparkSession
        if base.empty:
            return known_rows(spark.createDataFrame([], "doc_sha string, old string, new string"), 0)
        return known_rows(
            spark.createDataFrame(
                base[["doc_sha", "old", "new"]], schema="doc_sha string, old string, new string"
            ),
            len(base),
        )

    m = aliases.select("doc_sha", F.col("alias").alias("old"), F.col("canonical").alias("new"), F.lit(0).alias("prio"))
    repl_identity = repl.select(
        "doc_sha", F.col("obsolete_id").alias("old"), F.col("obsolete_id").alias("new"), F.lit(1).alias("prio")
    )
    m = m.unionByName(repl_identity).groupBy("doc_sha", "old").agg(F.min_by("new", "prio").alias("new"))
    r = (
        repl.select("doc_sha", "obsolete_id", "replacement")
        .withColumnRenamed("obsolete_id", "__o")
        .withColumnRenamed("replacement", "__n")
        .withColumnRenamed("doc_sha", "__d")
    )
    for _ in range(max_hops):
        m = (
            m.join(r, (F.col("doc_sha") == F.col("__d")) & (F.col("new") == F.col("__o")), "left")
            .withColumn("new", F.coalesce(F.col("__n"), F.col("new")))
            .drop("__o", "__n", "__d")
        )
    return m.where(F.col("old") != F.col("new"))


def rewrite_edges(
    edges: DataFrame,
    clauses: DataFrame,
    max_hops: int = 3,
    resolution: DataFrame | None = None,
    broadcast_threshold: int | None = None,
) -> DataFrame:
    """Canonicalize edge endpoints via the pre-composed resolution map —
    one equi-join per endpoint.

    The map is bounded by *declared aliases*, usually a tiny fraction of
    the corpus — when measurably small it broadcasts (shuffling the 5M-row
    edge table twice costs far more than a driver broadcast of the map);
    above the gate it falls back to a sort-merge join on (doc_sha, key)
    so a pathological alias census cannot OOM executors.
    """
    m = gated_broadcast(
        resolution_map(clauses, max_hops) if resolution is None else resolution, broadcast_threshold
    )

    ms = m.withColumnRenamed("old", "__ks").withColumnRenamed("new", "__vs").withColumnRenamed("doc_sha", "__ds")
    mo = m.withColumnRenamed("old", "__ko").withColumnRenamed("new", "__vo").withColumnRenamed("doc_sha", "__do")
    out = (
        edges.join(ms, (F.col("doc_sha") == F.col("__ds")) & (F.col("subj") == F.col("__ks")), "left")
        .withColumn("subj", F.coalesce(F.col("__vs"), F.col("subj")))
        .drop("__ks", "__vs", "__ds")
        .join(mo, (F.col("doc_sha") == F.col("__do")) & (F.col("obj") == F.col("__ko")), "left")
        .withColumn("obj", F.coalesce(F.col("__vo"), F.col("obj")))
        .drop("__ko", "__vo", "__do")
    )
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
    macros = gated_broadcast(macro_table(clauses).withColumnRenamed("doc_sha", "__d"))
    xr = edges.where(F.col("src_tag") == "xref")
    m = xr.join(
        macros,
        (xr["doc_sha"] == macros["__d"]) & (ident_prefix(xr["obj"]) == macros["macro_idspace"]),
        "inner",
    ).drop("__d")

    # SINGLE pass: each matched (xref, macro) row emits its 1-2 synthesized
    # edges through one explode — the 8-branch union formulation re-scanned
    # the join once per branch (measured 6.7s -> this shape is one stage).
    s, o, k, rel, filler = F.col("subj"), F.col("obj"), F.col("kind"), F.col("rel"), F.col("filler")
    pair = lambda subj, pred, obj: F.struct(subj.alias("s"), pred.alias("p"), obj.alias("o"))
    emitted = (
        F.when(k == "treat-xrefs-as-equivalent", F.array(pair(s, F.lit("equivalent_to"), o)))
        .when(k == "treat-xrefs-as-is_a", F.array(pair(s, F.lit("is_a"), o)))
        .when(k == "treat-xrefs-as-has-subclass", F.array(pair(o, F.lit("is_a"), s)))
        .when(k == "treat-xrefs-as-relationship", F.array(pair(s, rel, o)))
        .when(
            k == "treat-xrefs-as-genus-differentia",
            F.array(
                pair(s, F.lit("intersection_of:genus"), o),
                pair(s, F.concat(F.lit("intersection_of:"), rel), filler),
            ),
        )
        .when(
            k == "treat-xrefs-as-reverse-genus-differentia",
            F.array(
                pair(o, F.lit("intersection_of:genus"), s),
                pair(o, F.concat(F.lit("intersection_of:"), rel), filler),
            ),
        )
        .otherwise(F.array())
    )
    synthesized = (
        m.select("doc_sha", "idspace", F.explode(emitted).alias("e"))
        .select(
            F.col("e.s").alias("subj"),
            F.col("e.p").alias("pred"),
            F.col("e.o").alias("obj"),
            F.lit("xref-macro").alias("src_tag"),
            "doc_sha",
            "idspace",
        )
    )
    return edges.unionByName(synthesized)
