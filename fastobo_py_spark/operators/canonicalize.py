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
*declared aliases*, orders of magnitude smaller than the edge table; macro
lists are per-document header metadata. Two join strategies throughout:
``auto`` size-gates a broadcast (map-side join, sort-merge fallback), and
``shuffle_hash`` — the 10^12-file production default — joins every dim
against the clause cache's doc_sha hash partitioning with zero exchanges
of the edge table and zero driver materialization (the resolution map
itself shards per document via ``applyInPandas``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastobo_py_spark.operators.hints import gated_broadcast, known_rows
from fastobo_py_spark.operators.idents import edge_idspace, ident_prefix


def alias_map(clauses: DataFrame) -> DataFrame:
    """(doc_sha, alias, canonical) from alt_id declarations (O8).

    Conflicting declarations (two frames claiming the same alt_id) keep
    the FIRST in document order — min_by (frame_ix, clause_ix) — the same
    rule the pure-Python oracle applies by iterating clauses in parse
    order; a dropDuplicates here kept an arbitrary survivor and could
    disagree with the fused kernel run-to-run."""
    return (
        clauses.where((F.col("tag") == "alt_id") & (F.col("frame_id") != ""))
        .groupBy("doc_sha", F.col("v1").alias("alias"))
        .agg(
            F.min_by(
                F.col("frame_id"), F.struct(F.col("frame_ix"), F.col("clause_ix"))
            ).alias("canonical")
        )
    )


def replacement_map(clauses: DataFrame) -> DataFrame:
    """(doc_sha, obsolete_id, replacement) from replaced_by (O9).

    Only hard redirects; ``consider`` is advisory (kept on nodes, not used
    to rewrite edges) per the reference's distinction.
    Multi-valued replaced_by: first declared in DOCUMENT order wins —
    min_by (frame_ix, clause_ix), the same tiebreak as alias_map (two
    frames sharing a frame_id tie on clause_ix alone, and the oracle's
    parse-order iteration keeps the earlier frame's target).
    """
    w = (
        clauses.where((F.col("tag") == "replaced_by") & (F.col("frame_id") != ""))
        .groupBy("doc_sha", F.col("frame_id").alias("obsolete_id"))
        .agg(
            F.min_by(
                "v1", F.struct(F.col("frame_ix"), F.col("clause_ix"))
            ).alias("replacement")
        )
    )
    return w


def _compose_resolution_pandas(both, max_hops: int):
    """Compose alias+replacement chains in pandas: rows (doc_sha, old,
    new, k) with k=0 alias / k=1 replaced_by → (doc_sha, old, new).

    Shared by the driver-side path (whole map at once) and the
    per-document ``applyInPandas`` kernel (one doc per call) — identical
    semantics by construction: aliases win when both are declared, repl
    keys enter at identity, every entry receives exactly ``max_hops``
    replacement applications, identity entries dropped.
    """
    import pandas as pd

    a = both[both["k"] == 0][["doc_sha", "old", "new"]]
    r = both[both["k"] == 1][["doc_sha", "old", "new"]]
    ident = r[["doc_sha", "old"]].copy()
    ident["new"] = ident["old"]
    base = pd.concat([a, ident], ignore_index=True).drop_duplicates(["doc_sha", "old"], keep="first")
    lut = r.rename(columns={"old": "__k", "new": "__v"})
    for _ in range(max_hops):
        base = base.merge(lut, how="left", left_on=["doc_sha", "new"], right_on=["doc_sha", "__k"])
        base["new"] = base["__v"].fillna(base["new"])
        base = base.drop(columns=["__k", "__v"])
    return base[base["old"] != base["new"]][["doc_sha", "old", "new"]]


def _alias_repl_union(clauses: DataFrame) -> DataFrame:
    aliases = alias_map(clauses)
    repl = replacement_map(clauses)
    return aliases.select(
        F.col("alias").alias("old"), F.col("canonical").alias("new"), "doc_sha", F.lit(0).alias("k")
    ).unionByName(
        repl.select(
            F.col("obsolete_id").alias("old"), F.col("replacement").alias("new"), "doc_sha", F.lit(1).alias("k")
        )
    )


def resolution_map_distributed(clauses: DataFrame, max_hops: int = 3) -> DataFrame:
    """Fully distributed resolution map: alias/replacement chains are
    DOCUMENT-LOCAL (each OboDoc resolves independently), so the chain
    composition shards perfectly by doc_sha — no driver collect, no
    broadcast, nothing bounded by one machine. This is the 10^12-file
    path; :func:`resolution_map` keeps the scale-adaptive driver shortcut
    for interactive/small corpora.

    Execution shape: ONE hash exchange on doc_sha (what a
    ``groupBy(doc_sha).applyInPandas`` would also pay) followed by a
    partition-wide ``mapInPandas`` kernel. ``_compose_resolution_pandas``
    keys every merge on doc_sha, so one vectorized pass composes ALL
    documents in the partition at once — the earlier per-document
    ``applyInPandas`` paid pandas-DataFrame construction + three merges
    per ~10-row group, a fixed Python tax of ~1 ms × n_docs that
    dominated the graph stage's scaling profile. Memory is bounded by the
    per-partition slice of the alias/replacement dim (tiny vs clauses);
    size ``spark.sql.shuffle.partitions`` to the corpus as usual.
    """
    import pandas as pd

    both = _alias_repl_union(clauses)
    n = int(clauses.sparkSession.conf.get("spark.sql.shuffle.partitions"))

    def compose(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        yield _compose_resolution_pandas(pd.concat(pdfs, ignore_index=True), max_hops)

    # the union above erases the clause cache's partitioning (UnionExec
    # concatenates partition lists), so a doc's k=0 and k=1 rows land in
    # different partitions — the explicit repartition restores doc-locality
    return both.repartition(n, "doc_sha").mapInPandas(
        compose, "doc_sha string, old string, new string"
    )


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
    # ONE driver job fetches both maps (limit guards the driver: if the
    # fetch hits the cap, fall through to the per-document distributed
    # composition)
    both = _alias_repl_union(clauses).limit(driver_threshold + 1).toPandas()
    if len(both) <= driver_threshold:
        base = _compose_resolution_pandas(both, max_hops)
        spark = clauses.sparkSession
        if base.empty:
            return known_rows(spark.createDataFrame([], "doc_sha string, old string, new string"), 0)
        return known_rows(
            spark.createDataFrame(base, schema="doc_sha string, old string, new string"), len(base)
        )
    return resolution_map_distributed(clauses, max_hops)


def combined_map_distributed(
    dims: DataFrame, max_hops: int = 3, key_col: str = "doc_sha"
) -> DataFrame:
    """The FUSED canonicalization map — alias/obsolete resolution composed
    with equivalence component labels — in ONE exchange + ONE
    partition-wide kernel.

    ``key_col`` is the document key the kernel shards and emits on:
    ``doc_sha`` (string spine) or ``doc_key`` (the BIGINT surrogate,
    operators/surrogate.py) — the surrogate also shrinks the Arrow
    transfer into the kernel by ~80 bytes/row.

    Semantically identical to ``fuse_resolution_components(
    resolution_map_distributed(dims), equivalence_components_from_clauses(
    dims, ...))`` (test_canonical_edges_auto_matches_shuffle_hash and the
    oracle tests pin this), but the compositional pipeline spends ~10
    serial stage boundaries on kilobyte-sized dim tables — a constant
    ~seconds of latency that does not shrink with cores and was the
    measured dominant term of the graph stage's N→4N scaling loss. Here
    every per-document step (alias/replaced_by chain composition,
    treat-xrefs-as-equivalent macro pair synthesis, union-find, final
    composition) runs inside one Python call per partition; doc-locality
    comes from the explicit doc_sha repartition.
    """
    import re

    import pandas as pd

    url_re = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")

    def py_prefix(s: str):
        # mirrors idents.ident_prefix: prefix of a PREFIXED ident else None
        if url_re.match(s) or ":" not in s:
            return None
        return s.split(":", 1)[0]

    def kernel(batches):
        docs: dict = {}
        for pdf in batches:
            for sha, ftype, fid, tag, v1, fix, cix in zip(
                pdf[key_col], pdf["frame_type"], pdf["frame_id"],
                pdf["tag"], pdf["v1"], pdf["frame_ix"], pdf["clause_ix"],
            ):
                if v1 is None:
                    continue
                d = docs.get(sha)
                if d is None:
                    d = docs[sha] = {"alias": {}, "repl": {}, "pairs": [], "xrefs": [], "spaces": set()}
                if ftype == "Header":
                    if tag == "treat-xrefs-as-equivalent":
                        d["spaces"].add(v1)
                elif fid:
                    if tag == "alt_id":
                        # first in DOCUMENT order wins (same rule as
                        # alias_map's min_by and the oracle's parse-order
                        # iteration) — partition arrival order after the
                        # shuffle is not deterministic, so track the key
                        cur = d["alias"].get(v1)
                        if cur is None or (fix, cix) < cur[1]:
                            d["alias"][v1] = (fid, (fix, cix))
                    elif tag == "replaced_by":
                        cur = d["repl"].get(fid)
                        if cur is None or (fix, cix) < cur[1]:
                            # first declared in DOCUMENT order (same
                            # tiebreak as alias handling above)
                            d["repl"][fid] = (v1, (fix, cix))
                    elif tag == "equivalent_to":
                        d["pairs"].append((fid, v1))
                    elif tag == "xref":
                        d["xrefs"].append((fid, v1))
        out: list[tuple] = []
        for sha, d in docs.items():
            repl = {k: v[0] for k, v in d["repl"].items()}
            # strip the (frame_ix, clause_ix) tiebreak keys; alias wins
            # over a same-key replacement
            res = {k: v[0] for k, v in d["alias"].items()}
            for k in repl:
                res.setdefault(k, k)
            for _ in range(max_hops):
                for k in res:
                    res[k] = repl.get(res[k], res[k])
            res = {k: v for k, v in res.items() if k != v}

            pairs = list(d["pairs"])
            if d["spaces"]:
                for fid, x in d["xrefs"]:
                    if py_prefix(x) in d["spaces"]:
                        pairs.append((fid, x))
            from fastobo_py_spark.operators.components import MinUnionFind

            uf = MinUnionFind()
            verts = set()
            for a, b in pairs:
                a, b = res.get(a, a), res.get(b, b)
                verts.add(a)
                verts.add(b)
                uf.union(a, b)
            comp = {v: uf.find(v) for v in verts}

            for old, new in res.items():
                final = comp.get(new, new)
                if old != final:
                    out.append((sha, old, final))
            for v, c in comp.items():
                if v not in res and v != c:
                    out.append((sha, v, c))
        if out:
            yield pd.DataFrame(out, columns=[key_col, "old", "new"])

    n = int(dims.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    cols = [key_col, "frame_type", "frame_id", "tag", "v1", "frame_ix", "clause_ix"]
    hdr = F.col("frame_type") == "Header"
    # xref rows dominate the dims volume but only those covered by a
    # treat-xrefs-as-equivalent macro ever matter — filter them with a
    # vectorized JVM semi-join BEFORE anything reaches Python (looping
    # every xref row through the kernel cost more than the whole edge job)
    eq_hdr = dims.where(hdr & (F.col("tag") == "treat-xrefs-as-equivalent"))
    spaces = eq_hdr.select(F.col(key_col).alias("__d"), F.col("v1").alias("__space")).hint(
        "shuffle_hash"
    )
    xr = dims.where(~hdr & (F.col("tag") == "xref"))
    xr_kept = xr.join(
        spaces, (xr[key_col] == F.col("__d")) & (ident_prefix(xr["v1"]) == F.col("__space")), "left_semi"
    )
    small = dims.where(~hdr & F.col("tag").isin("alt_id", "replaced_by", "equivalent_to"))
    proj = eq_hdr.select(*cols).unionByName(small.select(*cols)).unionByName(xr_kept.select(*cols))
    key_type = "bigint" if key_col == "doc_key" else "string"
    return proj.repartition(n, key_col).mapInPandas(
        kernel, f"{key_col} {key_type}, old string, new string"
    )


def fuse_resolution_components(res: DataFrame, comps: DataFrame) -> DataFrame:
    """Compose the alias/obsolete resolution map with the equivalence
    component labels into ONE (doc_sha, old, new) lookup.

    The pipeline applies resolution first, then component rewrite, and
    the component labels are keyed on POST-resolution ids (the pair
    endpoints are rewritten through ``res`` before CC) — so the two maps
    compose exactly:

        combined(x) = comps(res(x)) ?? res(x)   if res(x) defined
                    = comps(x)                   otherwise

    Composing on the DIM side (two joins over the tiny maps) halves the
    number of left joins against the edge table from four to two — the
    edge table is the multi-million-row side, so this is the dominant
    term at scale. Identity entries are dropped (a no-op join hit).
    """
    c = comps.select(
        F.col("doc_sha").alias("__cd"), F.col("id").alias("__ci"), F.col("component").alias("__cc")
    )
    through = res.join(
        c, (res["doc_sha"] == F.col("__cd")) & (res["new"] == F.col("__ci")), "left"
    ).select("doc_sha", "old", F.coalesce(F.col("__cc"), F.col("new")).alias("new"))
    r = res.select(F.col("doc_sha").alias("__rd"), F.col("old").alias("__ro"))
    direct = comps.join(
        r, (comps["doc_sha"] == F.col("__rd")) & (comps["id"] == F.col("__ro")), "left_anti"
    ).select("doc_sha", F.col("id").alias("old"), F.col("component").alias("new"))
    return through.unionByName(direct).where(F.col("old") != F.col("new"))


def rewrite_edges(
    edges: DataFrame,
    clauses: DataFrame,
    max_hops: int = 3,
    resolution: DataFrame | None = None,
    broadcast_threshold: int | None = None,
    strategy: str = "auto",
    key_col: str = "doc_sha",
) -> DataFrame:
    """Canonicalize edge endpoints via the pre-composed resolution map —
    one equi-join per endpoint.

    strategy='auto': the map is bounded by *declared aliases*, usually a
    tiny fraction of the corpus — when measurably small it broadcasts
    (shuffling the 5M-row edge table twice costs far more than a driver
    broadcast of the map); above the gate it falls back to a sort-merge
    join on (doc_sha, key) so a pathological alias census cannot OOM
    executors.

    strategy='shuffle_hash': zero probe jobs, zero broadcasts — both join
    keys lead with doc_sha, the edge side is already hash-partitioned by
    doc_sha (the clause cache contract), so the per-partition hash join
    co-locates without exchanging the edge table. The 10^12-file default
    in run_pipeline/bench.
    """
    m = resolution_map(clauses, max_hops) if resolution is None else resolution
    m = m.hint("shuffle_hash") if strategy == "shuffle_hash" else gated_broadcast(m, broadcast_threshold)

    ms = m.withColumnRenamed("old", "__ks").withColumnRenamed("new", "__vs").withColumnRenamed(key_col, "__ds")
    mo = m.withColumnRenamed("old", "__ko").withColumnRenamed("new", "__vo").withColumnRenamed(key_col, "__do")
    out = (
        edges.join(ms, (F.col(key_col) == F.col("__ds")) & (F.col("subj") == F.col("__ks")), "left")
        .withColumn("subj", F.coalesce(F.col("__vs"), F.col("subj")))
        .drop("__ks", "__vs", "__ds")
        .join(mo, (F.col(key_col) == F.col("__do")) & (F.col("obj") == F.col("__ko")), "left")
        .withColumn("obj", F.coalesce(F.col("__vo"), F.col("obj")))
        .drop("__ko", "__vo", "__do")
    )
    return out


# ---------------------------------------------------------------------------
# O11: treat-xrefs header macros
# ---------------------------------------------------------------------------

def macro_table(clauses: DataFrame, doc_col: str = "doc_sha") -> DataFrame:
    """Normalize all treat-xrefs-* header clauses into one macro dim:
    (doc_col, kind, macro_idspace, rel, filler). ``doc_col`` is the
    document key the dim joins on — ``doc_sha`` (string spine) or
    ``doc_key`` (the BIGINT surrogate spine, operators/surrogate.py)."""
    hdr = clauses.where(F.col("frame_type") == "Header")
    simple = hdr.where(
        F.col("tag").isin("treat-xrefs-as-equivalent", "treat-xrefs-as-is_a", "treat-xrefs-as-has-subclass")
    ).select(
        doc_col,
        F.col("tag").alias("kind"),
        F.col("v1").alias("macro_idspace"),
        F.lit(None).cast("string").alias("rel"),
        F.lit(None).cast("string").alias("filler"),
    )
    rel = hdr.where(F.col("tag") == "treat-xrefs-as-relationship").select(
        doc_col,
        F.col("tag").alias("kind"),
        F.col("v1").alias("macro_idspace"),
        F.col("v2").alias("rel"),
        F.lit(None).cast("string").alias("filler"),
    )
    gd = hdr.where(
        F.col("tag").isin("treat-xrefs-as-genus-differentia", "treat-xrefs-as-reverse-genus-differentia")
    ).select(
        doc_col,
        F.col("tag").alias("kind"),
        F.col("v1").alias("macro_idspace"),
        F.col("v2").alias("rel"),
        F.col("value_text").alias("filler"),
    )
    return simple.unionByName(rel).unionByName(gd)


def _macro_emit(kind, rel, filler, s, x):
    """Edges a (kind, rel, filler) macro synthesizes from an xref (s → x)."""
    pair = lambda subj, pred, obj: F.struct(
        subj.alias("s"), pred.alias("p"), obj.alias("o"), F.lit("xref-macro").alias("st")
    )
    return (
        F.when(kind == "treat-xrefs-as-equivalent", F.array(pair(s, F.lit("equivalent_to"), x)))
        .when(kind == "treat-xrefs-as-is_a", F.array(pair(s, F.lit("is_a"), x)))
        .when(kind == "treat-xrefs-as-has-subclass", F.array(pair(x, F.lit("is_a"), s)))
        .when(kind == "treat-xrefs-as-relationship", F.array(pair(s, rel, x)))
        .when(
            kind == "treat-xrefs-as-genus-differentia",
            F.array(
                pair(s, F.lit("intersection_of:genus"), x),
                pair(s, F.concat(F.lit("intersection_of:"), rel), filler),
            ),
        )
        .when(
            kind == "treat-xrefs-as-reverse-genus-differentia",
            F.array(
                pair(x, F.lit("intersection_of:genus"), s),
                pair(x, F.concat(F.lit("intersection_of:"), rel), filler),
            ),
        )
        .otherwise(F.array())
    )


def extract_edges_with_macros(
    clauses: DataFrame,
    strategy: str = "auto",
    macro_source: DataFrame | None = None,
    key_col: str = "doc_sha",
) -> DataFrame:
    """Single-pass triple extraction WITH treat-xrefs macro synthesis.

    ``extract_edges(...).unionByName(synthesized)`` loses the clause
    cache's doc_sha hash partitioning (UnionExec concatenates partitions),
    which re-introduces a full edge-table exchange at the final dedup.
    Fusing the macro join INTO the extraction pass — left-join each xref
    row against the per-(doc, idspace) macro dim, then ONE explode emits
    the base edge plus any synthesized ones — keeps the whole chain on
    the cache's partitioning: zero edge-table exchanges end to end.
    """
    from fastobo_py_spark.operators.triples import _SIMPLE_EDGE_TAGS, edge_case_exprs

    t, v1 = F.col("tag"), F.col("v1")
    fid = F.col("frame_id")
    ent = clauses.where(
        (F.col("frame_type") != "Header")
        & (fid != "")
        & t.isin(list(_SIMPLE_EDGE_TAGS) + ["relationship", "intersection_of"])
    )
    pred, obj, valid = edge_case_exprs()
    base = F.when(
        valid,
        F.array(F.struct(fid.alias("s"), pred.alias("p"), obj.alias("o"), t.alias("st"))),
    ).otherwise(F.array())

    # Direct left join to the macro dim (NOT aggregated into per-idspace
    # arrays): transform/flatten higher-order functions fall out of
    # whole-stage codegen and cost ~10x per row on the 14M-row hot path.
    # Several macros on one idspace duplicate the matched xref row — each
    # duplicate re-emits the base edge, which the end-of-chain
    # dropDuplicates(EDGE_KEY) removes; pure CaseWhen/CreateArray keeps
    # the whole emission inside codegen.
    mspace = macro_table(
        clauses if macro_source is None else macro_source, doc_col=key_col
    ).withColumnRenamed(key_col, "__d")
    mspace = mspace.hint("shuffle_hash") if strategy == "shuffle_hash" else gated_broadcast(mspace)

    joined = ent.join(
        mspace,
        (ent[key_col] == mspace["__d"]) & (t == "xref") & (ident_prefix(v1) == mspace["macro_idspace"]),
        "left",
    )
    synth = _macro_emit(F.col("kind"), F.col("rel"), F.col("filler"), fid, v1)
    edges = joined.select(key_col, F.explode(F.concat(base, synth)).alias("e")).select(
        F.col("e.s").alias("subj"),
        F.col("e.p").alias("pred"),
        F.col("e.o").alias("obj"),
        F.col("e.st").alias("src_tag"),
        key_col,
    )
    return edges.withColumn("idspace", edge_idspace(F.col("subj")))


def apply_xref_macros(edges: DataFrame, clauses: DataFrame, strategy: str = "auto") -> DataFrame:
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
    macros = macro_table(clauses).withColumnRenamed("doc_sha", "__d")
    macros = macros.hint("shuffle_hash") if strategy == "shuffle_hash" else gated_broadcast(macros)
    xr = edges.where(F.col("src_tag") == "xref")
    m = xr.join(
        macros,
        (xr["doc_sha"] == macros["__d"]) & (ident_prefix(xr["obj"]) == macros["macro_idspace"]),
        "inner",
    ).drop("__d")

    # SINGLE pass: each matched (xref, macro) row emits its 1-2 synthesized
    # edges through one explode — the 8-branch union formulation re-scanned
    # the join once per branch (measured 6.7s -> this shape is one stage).
    # The emission when-chain is _macro_emit, shared with the fused
    # extraction path, so the two strategies cannot drift.
    emitted = _macro_emit(
        F.col("kind"), F.col("rel"), F.col("filler"), F.col("subj"), F.col("obj")
    )
    synthesized = (
        m.select("doc_sha", F.explode(emitted).alias("e"))
        .select(
            F.col("e.s").alias("subj"),
            F.col("e.p").alias("pred"),
            F.col("e.o").alias("obj"),
            F.col("e.st").alias("src_tag"),
            "doc_sha",
            # re-derive from the SYNTHESIZED subject: reversed kinds
            # (has-subclass, reverse-genus-differentia) change the edge's
            # subject prefix, and the raw-edge write path partitions on
            # this column — inheriting the xref edge's idspace would file
            # those edges under the wrong partition
            edge_idspace(F.col("e.s")).alias("idspace"),
        )
    )
    return edges.unionByName(synthesized)
