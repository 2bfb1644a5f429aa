"""O19 + orchestration: the full corpus→KG job, resumable mid-run.

North-rule requirements implemented here:
  * per-partition checkpointed lineage: every completed source row is
    recorded in a manifest keyed by (repo, path, commit, content_sha256);
    a restarted run anti-joins the corpus against the manifest and only
    processes the remainder (no reference analogue — fastobo-py is a
    single-process library; this is the 10^12-file-scale addition).
  * metrics: per-stage row counts written next to the outputs.

The manifest is append-only parquet (an Iceberg table on a real cluster,
where commit atomicity comes from the table format; locally, parquet
append of one sub-directory per batch gives the same crash-consistency:
a batch is visible only after its files commit). Fragmentation is bounded
by :func:`compact_manifest` — a crash-safe write-then-swap rewrite into a
few doc_sha-sorted files once part-count passes a threshold (Iceberg's
rewrite_data_files analogue), so the resume anti-join never scans
unbounded small files.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from fastobo_py_spark.operators.canonicalize import rewrite_edges
from fastobo_py_spark.operators.idents import edge_idspace
from fastobo_py_spark.operators.materialize import build_nodes, with_salt
from fastobo_py_spark.operators.parse import parse_corpus, split_parsed

MANIFEST_COLS = ("doc_sha", "repo", "path", "commit")

# the canonical-edge identity. BOTH pipeline paths dedup on its doc_key
# surrogate twin (see _dedup_edges) — the clause cache is hash-partitioned
# on doc_key once and nothing downstream re-shuffles the edge table; a
# dropDuplicates on doc_sha here would re-exchange the whole table, since
# doc_sha is no longer the cache's partitioning column (code-review r5)
EDGE_KEY = ["subj", "pred", "obj", "doc_sha"]


def canonical_edges(
    clauses: DataFrame,
    strategy: str = "shuffle_hash",
    persisted_out: list | None = None,
    _spine_key: str | None = None,
) -> DataFrame:
    """Clause rows → canonicalized, per-doc-deduped edge table.

    strategy='shuffle_hash' (the 10^12-file default): every dimension —
    macro table, resolution map, component labels — flows as a
    doc-key-co-partitioned shuffle-hash join against the already-
    partitioned clause cache, and the resolution/CC computations shard
    per document inside one partition-wide mapInPandas kernel. ZERO
    driver collects, ZERO broadcast
    builds, so the job's serial fraction is two job submissions no matter
    the corpus size. strategy='auto' keeps the scale-adaptive driver
    shortcuts + gated broadcasts (fastest for interactive small corpora).

    ``persisted_out``: internal caches (dims / resolution map / component
    labels) are appended here so the caller can ``unpersist()`` them once
    the edge table is materialized. Long-lived sessions — above all the
    streaming path, which enters once per micro-batch — MUST pass a list
    and clean up, or the CacheManager accumulates three relations per call.

    Spine key: the shuffle_hash path runs on the BIGINT surrogate
    ``doc_key = xxhash64(doc_sha)`` (operators/surrogate.py) — the 64-hex
    doc_sha is pruned off every join/explode/aggregate row and restored
    by one co-partitioned dictionary join at the end (collision math and
    the audit helper live in the surrogate module; ``strategy='auto'``
    is the exact string-spine twin). Callers should hash-partition the
    clause cache on ``doc_key``; a cache without the column is healed
    here (at the cost of the joins re-exchanging, same as any
    mispartitioned input).
    """
    from fastobo_py_spark.operators.canonicalize import (
        combined_map_distributed,
        extract_edges_with_macros,
        fuse_resolution_components,
        resolution_map,
    )
    from fastobo_py_spark.operators.components import equivalence_components_from_clauses
    from fastobo_py_spark.operators.surrogate import with_doc_key

    shj = strategy == "shuffle_hash"
    # _spine_key: measurement override (tools/surrogate_ab.py) pinning the
    # shuffle_hash chain to the string spine ("doc_sha") so the surrogate's
    # effect can be isolated in one session; production callers leave it None
    key = _spine_key or ("doc_key" if shj else "doc_sha")
    if shj and key == "doc_key":
        clauses = with_doc_key(clauses)
    # The dim builders (macro table, alias/replacement map, equivalence
    # pairs) each rescan their input; against the full clause cache that
    # was ~5 extra full-table scans — the measured bulk of the graph
    # stage. One narrow projection holds every dim-bearing row (headers +
    # alias/redirect/equivalence/xref tags, a small fraction of the edge
    # rows), so dim building rescans only it.
    dims = clauses.where(
        (F.col("frame_type") == "Header")
        | F.col("tag").isin("alt_id", "replaced_by", "equivalent_to", "xref")
    ).persist()
    if persisted_out is not None:
        persisted_out.append(dims)
    if shj:
        # eager fill: the res/comps/macro branches otherwise race to
        # compute the same cache partitions and serialize on block locks
        # (measured: 100+ task-seconds of cores held while blocked)
        dims.count()

    if shj:
        # resolution ∘ components in ONE exchange + ONE partition-wide
        # kernel (combined_map_distributed): the compositional pipeline's
        # ~10 serial stage boundaries over kilobyte dim tables were the
        # measured constant term dominating the graph stage's N→4N loss.
        # The edge table then sees two left joins (subj, obj), not four.
        combined = combined_map_distributed(dims, key_col=key).persist()
        if persisted_out is not None:
            persisted_out.append(combined)
    else:
        res = resolution_map(dims)
        comps = equivalence_components_from_clauses(dims, resolution=res, strategy=strategy)
        combined = fuse_resolution_components(res, comps)
    # macro synthesis is FUSED into the extraction pass (no union) so the
    # clause cache's doc-key partitioning survives to the final dedup
    e = extract_edges_with_macros(clauses, strategy=strategy, macro_source=dims, key_col=key)
    e = rewrite_edges(e, clauses, resolution=combined, strategy=strategy, key_col=key)
    if not shj or key == "doc_sha":
        return _dedup_edges(e)
    # decode the surrogate back to doc_sha: the dictionary is one row per
    # document (exchange-free aggregate over the already-partitioned
    # cache), and the edge side keeps its doc_key partitioning through
    # the dedup aggregate, so this final join exchanges only the dict
    doc_dict = clauses.select("doc_key", "doc_sha").distinct()
    return _dedup_edges(e, key_col=key, doc_dict=doc_dict)


# src_tag is a CLOSED 8-value set (triples._SIMPLE_EDGE_TAGS +
# relationship/intersection_of + the macro marker); the order below is the
# survivor priority when one (subj,pred,obj,doc_sha) arrives under several
# tags — original clauses beat macro-synthesized.
_SRC_TAG_ORDER = (
    "is_a", "relationship", "intersection_of", "union_of",
    "equivalent_to", "disjoint_from", "xref", "xref-macro",
)


def _dedup_edges(e: DataFrame, key_col: str = "doc_sha", doc_dict: DataFrame | None = None) -> DataFrame:
    """Per-doc edge dedup as a HashAggregate.

    ``dropDuplicates(EDGE_KEY)`` carries the src_tag/idspace STRINGS in
    ``first()`` buffers, which HashAggregateExec cannot hold (aggregation
    buffers must be mutable fixed-width) — Spark silently falls back to
    SortAggregate and full-sorts the multi-million-row edge table inside
    every partition. Encoding src_tag into a byte keeps the buffer
    fixed-width (min = deterministic survivor, unlike dropDuplicates),
    and idspace is re-derived from the FINAL subj — also more correct:
    the extraction-time value went stale when alias/equivalence rewrites
    changed the endpoint.

    On the surrogate spine (``key_col='doc_key'``) the aggregate hashes a
    BIGINT instead of the 64-hex doc_sha, and ``doc_dict`` (doc_key →
    doc_sha, one row per document) restores the output column with a
    shuffle-hash join that exchanges only the dict — the edge side still
    carries the aggregate's doc_key partitioning.
    """
    enc = F.lit(None).cast("tinyint")
    for i, tag in reversed(list(enumerate(_SRC_TAG_ORDER))):
        enc = F.when(F.col("src_tag") == tag, F.lit(i).cast("tinyint")).otherwise(enc)
    dec = F.lit(None).cast("string")
    for i, tag in enumerate(_SRC_TAG_ORDER):
        dec = F.when(F.col("__tc") == i, F.lit(tag)).otherwise(dec)
    deduped = (
        e.withColumn("__tc", enc)
        .groupBy("subj", "pred", "obj", key_col)
        .agg(F.min("__tc").alias("__tc"))
    )
    if doc_dict is not None:
        deduped = deduped.join(doc_dict.hint("shuffle_hash"), key_col, "inner")
    return deduped.select(
        "subj", "pred", "obj", dec.alias("src_tag"), "doc_sha",
        edge_idspace(F.col("subj")).alias("idspace"),
    )


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _adopt_orphan_compaction(out_dir: str) -> bool:
    """Crash recovery for :func:`compact_manifest`'s two-rename swap: if
    the primary manifest dir is missing but a fully-committed
    ``_manifest.compact-*`` dir (its ``_SUCCESS`` marker present) exists,
    adopt the NEWEST one by commit mtime — ids are random hex, so name
    order says nothing about recency, and adopting a stale dir leaked by
    an earlier pre-swap crash would silently roll the manifest back.
    (Belt-and-braces: :func:`compact_manifest` also deletes stale
    compact/old dirs up front, so normally at most one candidate exists.)
    Returns True if a rename happened."""
    import glob

    p = _manifest_path(out_dir)
    if os.path.isdir(p):
        return False
    candidates = [
        d for d in glob.glob(p + ".compact-*")
        if os.path.exists(os.path.join(d, "_SUCCESS"))
    ]
    if not candidates:
        return False
    newest = max(candidates, key=lambda d: os.path.getmtime(os.path.join(d, "_SUCCESS")))
    os.rename(newest, p)
    return True


def _sweep_stale_compaction_dirs(out_dir: str) -> None:
    """Delete leftover ``_manifest.compact-*`` / ``_manifest.old-*`` dirs
    while the primary manifest exists — garbage from crashes before (or
    after) the swap. Without this sweep a committed-but-never-swapped
    copy would linger and could shadow a LATER crash's adoption."""
    import glob
    import shutil

    if not os.path.isdir(_manifest_path(out_dir)):
        return  # primary missing: candidates are recovery state, keep them
    for d in glob.glob(_manifest_path(out_dir) + ".compact-*") + glob.glob(
        _manifest_path(out_dir) + ".old-*"
    ):
        shutil.rmtree(d, ignore_errors=True)


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    _adopt_orphan_compaction(out_dir)
    p = _manifest_path(out_dir)
    try:
        return spark.read.parquet(p)
    except Exception:
        return None


def _manifest_part_count(out_dir: str) -> int:
    p = _manifest_path(out_dir)
    try:
        return sum(1 for f in os.listdir(p) if f.endswith(".parquet"))
    except FileNotFoundError:
        return 0


# rewrite once fragmentation passes this; target ~128 MB compacted parts
# (matches the scan split size, like compact_outputs)
MANIFEST_COMPACT_MAX_PARTS = 128
_MANIFEST_TARGET_BYTES = 128 << 20


def compact_manifest(
    spark: SparkSession,
    out_dir: str,
    max_parts: int = MANIFEST_COMPACT_MAX_PARTS,
    target_parts: int | None = None,
) -> dict:
    """O19 manifest compaction: collapse the append-only manifest into a
    few doc_sha-sorted parquet files once it fragments past ``max_parts``.

    Every batch appends part files forever; at the 10^12-file design point
    the resume anti-join would otherwise scan millions of tiny parts (the
    read in :func:`pending_corpus` IS the restart hot path). Iceberg calls
    this rewrite_data_files; on plain parquet we get the same effect with
    a crash-safe write-then-swap:

      1. read + deduplicate on the anti-join key (crash-reruns may have
         recorded a doc twice; ``min`` keeps the earliest completion —
         a deterministic survivor, unlike dropDuplicates),
      2. write the compacted copy to ``_manifest.compact-<id>`` and let
         parquet commit it (``_SUCCESS``) before anything is touched,
      3. swap via two directory renames.

    A crash between the renames leaves the committed compact dir behind;
    :func:`read_manifest` adopts it on the next run
    (:func:`_adopt_orphan_compaction`), so no state is ever lost and the
    worst crash window costs idempotent rework, never correctness.
    """
    import shutil

    _adopt_orphan_compaction(out_dir)
    _sweep_stale_compaction_dirs(out_dir)
    n = _manifest_part_count(out_dir)
    if n <= max_parts:
        return {"compacted": False, "parts_before": n}
    p = _manifest_path(out_dir)
    m = (
        spark.read.parquet(p)
        .groupBy(*MANIFEST_COLS)
        .agg(
            F.min("payload_sha").alias("payload_sha"),
            F.min("batch_id").alias("batch_id"),
            F.min("completed_at").alias("completed_at"),
        )
    )
    # size target from on-disk bytes — no extra count() job: the
    # aggregation is the expensive part on the restart hot path and must
    # run exactly once (the write below)
    n_bytes = sum(
        os.path.getsize(os.path.join(p, f)) for f in os.listdir(p) if f.endswith(".parquet")
    )
    parts = target_parts or max(1, (n_bytes + _MANIFEST_TARGET_BYTES - 1) // _MANIFEST_TARGET_BYTES)
    cid = uuid.uuid4().hex[:8]
    tmp = p + f".compact-{cid}"
    # sorted by the key: row-group min/max stats make future doc_sha
    # probes skippable, and co-keyed readers get locality for free
    m.repartition(parts, "doc_sha").sortWithinPartitions("doc_sha").write.mode(
        "overwrite"
    ).parquet(tmp)
    old = p + f".old-{cid}"
    os.rename(p, old)
    os.rename(tmp, p)
    shutil.rmtree(old, ignore_errors=True)
    return {"compacted": True, "parts_before": n, "parts_after": int(parts), "bytes": n_bytes}


def _with_doc_sha(corpus: DataFrame) -> DataFrame:
    """Manifest key: sha256(content) per the input_hint invariant; rows
    carrying only gzip payloads key on sha256(content_gz) — equally
    deterministic across restarts, computed JVM-side either way.

    ``payload_sha`` (sha256 of the compressed bytes, null for plaintext
    rows) rides along into the manifest so both identities are recorded:
    ``doc_sha`` stays the restart-stable anti-join key, while analysts can
    tell a gz-keyed manifest row (doc_sha == payload_sha) from a
    plaintext-keyed one and join gz rows back to their payloads. (For
    successfully-parsed gz rows the OUTPUT tables key on the decompressed
    plaintext sha — recomputing that here would mean gunzipping in the
    resume anti-join path, defeating its JVM-side pruning; the trade is
    deliberate and the two identities are both recorded.)
    """
    sha = F.sha2(F.col("content"), 256)
    payload = F.lit(None).cast("string")
    if "content_gz" in corpus.columns:
        payload = F.sha2(F.col("content_gz"), 256)
        sha = F.coalesce(sha, payload)
    return corpus.withColumn("doc_sha", sha).withColumn("payload_sha", payload)


def pending_corpus(spark: SparkSession, corpus: DataFrame, out_dir: str) -> DataFrame:
    """Anti-join the corpus against the manifest: only unprocessed rows.

    The sha is computed JVM-side (F.sha2) so the anti-join prunes rows
    BEFORE anything crosses into Python. left_anti on (sha, repo, path,
    commit) — the per-row invariant key from BASELINE.json input_hint.

    The manifest grows with every document ever processed — at the
    10^12-file design point it IS the corpus catalog, far past any sane
    broadcast. ``gated_broadcast`` hints the build side only while it is
    provably small (one bounded limit-count probe on the manifest scan);
    above the threshold the anti-join falls back to a shuffle join, which
    is the correct plan for a catalog-sized build side.
    """
    from fastobo_py_spark.operators.hints import gated_broadcast

    withsha = _with_doc_sha(corpus)
    manifest = read_manifest(spark, out_dir)
    if manifest is None:
        return withsha
    return withsha.join(
        gated_broadcast(manifest.select(*MANIFEST_COLS).dropDuplicates()),
        on=list(MANIFEST_COLS),
        how="left_anti",
    )


def run_pipeline(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    resume: bool = True,
    n_salts: int = 16,
    canonicalize: bool = True,
    compact_threshold: int | None = MANIFEST_COMPACT_MAX_PARTS,
    snapshot_branch: str | None = None,
) -> dict:
    """Run the full OBO→KG job; returns the metrics dict.

    Stages: filter+parse → quarantine split → triple extraction →
    treat-xrefs macros → alias/obsolete rewrite → equivalence CC →
    nodes+edges write (idspace-partitioned, salted) → manifest append.

    ``snapshot_branch``: commit the batch's snapshot to a named branch
    instead of main (write-audit-publish): snapshot readers of HEAD
    never see the batch until :func:`snapshots.fast_forward` publishes
    it. The ingest manifest still records the batch (resume scope is
    the PHYSICAL work done); an audit that ends in ``delete_branch``
    should expect corrected inputs to arrive as new content (new
    doc_sha) — identical re-submissions are resume-skipped by design.
    """
    t0 = time.time()
    batch_id = uuid.uuid4().hex[:12]

    # self-heal interrupted maintenance before anything reads the tables:
    # an output-compaction swap killed between its two renames would
    # otherwise leave a partition leaf invisible to this batch's readers
    # (the manifest path self-heals inside read_manifest already)
    recover_output_compactions(out_dir)
    # ... and re-point the snapshot HEAD at the physical state if a crash
    # mid-destructive-maintenance left it referencing renamed-away files.
    # Leaf-scoped heal: intact leaves are untouched, so rolled-back or
    # orphaned files are NOT resurrected (no-op without a snapshot log);
    # the heal's listing doubles as this batch's pre-write baseline
    from fastobo_py_spark.plans import snapshots as _snap

    pre_files = _snap.ensure_baseline(out_dir)

    src = pending_corpus(spark, corpus, out_dir) if resume else _with_doc_sha(corpus)
    keep = ["repo", "path", "commit", "lang", "content", "doc_sha", "payload_sha"] + (
        ["content_gz"] if "content_gz" in src.columns else []
    )
    src = src.select(*keep)

    # Metrics ride on the write actions via Observation — counting after
    # the fact re-executed the whole macro/rewrite/CC chain (the job did
    # ~2x the work to report on itself).
    obs = {k: Observation(k) for k in ("clauses", "quarantine", "edges", "nodes", "done")}

    # parse ONCE: both the clause and quarantine paths read this cache
    # (without it the quarantine write re-ran the mapInPandas parse)
    parsed = parse_corpus(src).persist()
    clauses, quarantine = split_parsed(parsed)
    quarantine = quarantine.observe(obs["quarantine"], F.count(F.lit(1)).alias("n"))
    quarantine.write.mode("append").parquet(os.path.join(out_dir, "quarantine"))

    # one pass over the corpus feeds every downstream stage; hash-partition
    # by the BIGINT doc_key surrogate so every doc-keyed operation
    # downstream (the canonical chain's joins and final dedup, the node
    # build, the decode dictionary) is satisfied without re-shuffling —
    # and the partitioner hashes 8 bytes instead of the 64-hex doc_sha
    from fastobo_py_spark.operators import surrogate as _surrogate

    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    clauses = _surrogate.with_doc_key(clauses).repartition(n_shuffle, "doc_key").persist()

    # surrogate-key audit (ADVICE r5): a 64-bit doc_key collision would
    # silently merge two documents' edge scopes. The audit is one
    # exchange-free aggregate over the just-persisted cache; when it
    # fires, this batch falls back to the exact string spine
    # (strategy='auto' — the oracle-pinned twin), and the count is
    # surfaced in the metrics dict either way.
    n_key_collisions = _surrogate.audit_doc_keys(clauses).count()
    spine_strategy = "shuffle_hash" if n_key_collisions == 0 else "auto"

    caches: list[DataFrame] = []
    if canonicalize:
        edges = canonical_edges(clauses, strategy=spine_strategy, persisted_out=caches)
    else:
        # same spine discipline as the canonical path: the cache is
        # doc_key-partitioned, so the dedup aggregate must group on
        # doc_key (a dropDuplicates on doc_sha would re-exchange the
        # whole edge table — the column isn't in the cache partitioning
        # anymore) and doc_sha is restored by the dictionary join
        from fastobo_py_spark.operators.canonicalize import extract_edges_with_macros

        macro_dims = clauses.where(
            (F.col("frame_type") == "Header") | (F.col("tag") == "xref")
        )
        # audit fallback mirrors the canonical path: on a collision the
        # extraction and dedup key on the exact doc_sha (the joins then
        # re-exchange — the documented cost of a corpus where the
        # surrogate is not injective)
        raw_key = "doc_key" if n_key_collisions == 0 else "doc_sha"
        e = extract_edges_with_macros(
            clauses, strategy="shuffle_hash", macro_source=macro_dims, key_col=raw_key
        )
        if raw_key == "doc_key":
            edges = _dedup_edges(
                e, key_col="doc_key", doc_dict=clauses.select("doc_key", "doc_sha").distinct()
            )
        else:
            edges = _dedup_edges(e)
    edges = edges.observe(obs["edges"], F.count(F.lit(1)).alias("n"))
    # clause observation rides the node build: its write is a guaranteed
    # FULL scan of the clause cache (a limit-style first action — e.g. the
    # resolution-map probe — would otherwise record a partial count)
    nodes = build_nodes(clauses.observe(obs["clauses"], F.count(F.lit(1)).alias("n")))
    nodes = nodes.observe(obs["nodes"], F.count(F.lit(1)).alias("n"))

    nodes.write.mode("append").partitionBy("idspace").parquet(os.path.join(out_dir, "nodes"))
    with_salt(edges, "subj", n_salts).write.mode("append").partitionBy("idspace", "salt").parquet(
        os.path.join(out_dir, "edges")
    )
    parsed.unpersist()
    for c in caches:
        c.unpersist()

    # snapshot commit: the batch's part files become visible to
    # read_table_at readers HERE, in one atomic rename — before the
    # manifest append, so a crash between the two reruns the batch
    # idempotently instead of losing it from snapshot visibility
    post_files = _snap.list_data_files(out_dir)
    snapshot = _snap.commit_snapshot(
        out_dir,
        added={t: sorted(post_files[t] - pre_files.get(t, set())) for t in _snap.TABLES},
        op="append",
        batch_id=batch_id,
        branch=snapshot_branch,
    )

    # manifest append LAST: a crash before this line leaves the batch
    # unrecorded and it reruns idempotently (outputs keyed by doc_sha are
    # deduplicated by readers; Iceberg would make this a single atomic commit)
    done = (
        src.select("repo", "path", "commit", "doc_sha", "payload_sha")
        .dropDuplicates()
        .withColumn("batch_id", F.lit(batch_id))
        .withColumn("completed_at", F.current_timestamp())
    )
    done = done.observe(obs["done"], F.count(F.lit(1)).alias("n"))
    done.write.mode("append").parquet(_manifest_path(out_dir))
    compaction = (
        compact_manifest(spark, out_dir, max_parts=compact_threshold)
        if compact_threshold is not None
        else {"compacted": False}
    )

    metrics = {
        "batch_id": batch_id,
        "docs_in_batch": obs["done"].get["n"],
        "clause_rows": obs["clauses"].get["n"],
        "quarantined_docs": obs["quarantine"].get["n"],
        "edges": obs["edges"].get["n"],
        "nodes": obs["nodes"].get["n"],
        "doc_key_collisions": n_key_collisions,
        "spine_strategy": spine_strategy if canonicalize else raw_key,
        "manifest_compaction": compaction,
        "snapshot_id": snapshot["snapshot_id"],
        "snapshot_sequence": snapshot["sequence"],
        "elapsed_sec": round(time.time() - t0, 3),
    }
    clauses.unpersist()
    metrics_dir = os.path.join(out_dir, "_metrics")
    os.makedirs(metrics_dir, exist_ok=True)
    with open(os.path.join(metrics_dir, f"{batch_id}.json"), "w") as fh:
        json.dump(metrics, fh)
    return metrics


# ---------------------------------------------------------------------------
# Output-table small-file compaction (the DATA-file analogue of
# compact_manifest; Iceberg's rewrite_data_files on plain parquet)
# ---------------------------------------------------------------------------

def _leaf_part_dirs(root: str) -> list[str]:
    """Partition leaf dirs (contain parquet parts directly) under a
    partitioned table root."""
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            out.append(dirpath)
    return sorted(out)


def _compact_tmp_root(out_dir: str) -> str:
    return os.path.join(out_dir, "_compact_tmp")


# Leaf-path encoding for _compact_tmp entries. quote(rel, safe="") is
# injective: '%' itself is encoded, so a partition VALUE containing
# Spark's own %2F escape (idspace 'a/b' writes the leaf dir idspace=a%2Fb)
# round-trips exactly instead of being restored as nested a/b dirs.
_OLD_SUFFIX = "%old"  # impossible in quote() output: '%' is always + 2 hex


def _enc_leaf(rel: str) -> str:
    from urllib.parse import quote

    return quote(rel, safe="")


def _dec_leaf(name: str) -> str:
    from urllib.parse import unquote

    return unquote(name)


def recover_output_compactions(out_dir: str) -> int:
    """Crash recovery for :func:`compact_outputs`: restore any leaf whose
    swap was interrupted. Preference order — a fully-committed compacted
    copy (has ``_SUCCESS``), else the displaced original (``*.old``).
    Returns the number of leaves restored."""
    tmp_root = _compact_tmp_root(out_dir)
    if not os.path.isdir(tmp_root):
        return 0
    restored = 0
    entries = sorted(os.listdir(tmp_root))
    entry_set = set(entries)
    for name in entries:
        if name.endswith(_OLD_SUFFIX):
            continue  # displaced-original marker; consumed via its base entry
        if name.endswith(".old"):
            # pre-r5 releases suffixed displaced originals with '.old'
            # (not the injective '%old'), so an entry ending '.old' is
            # ambiguous with a real leaf whose partition VALUE ends in
            # '.old'. Precise discriminator (code-review r5 ×3): a
            # CURRENT-format in-flight swap of a genuine '*.old' leaf
            # always carries either a committed compacted copy
            # (_SUCCESS inside the tmp entry — Spark writes it at the
            # write root) or a '%old' displaced-original sibling; a
            # legacy '.old' displaced-original dir is a partition leaf
            # and has NEITHER (leaves hold only parquet parts). Skip
            # exactly the latter — it is consumed as its base entry's
            # restore fallback below, or is completed-swap debris.
            if not (
                os.path.exists(os.path.join(tmp_root, name, "_SUCCESS"))
                or name + _OLD_SUFFIX in entry_set
            ):
                continue
        tmp = os.path.join(tmp_root, name)
        leaf = os.path.join(out_dir, _dec_leaf(name))
        if os.path.isdir(leaf):
            continue  # swap completed; leftover tmp is cleaned below
        src = tmp if os.path.exists(os.path.join(tmp, "_SUCCESS")) else tmp + _OLD_SUFFIX
        if not os.path.isdir(src):
            src = tmp + ".old"  # pre-r5 displaced-original suffix
        if os.path.isdir(src):
            os.makedirs(os.path.dirname(leaf), exist_ok=True)
            os.rename(src, leaf)
            restored += 1
    return restored


def compact_outputs(
    spark: SparkSession,
    out_dir: str,
    tables: tuple = ("nodes", "edges"),
    max_parts: int = 32,
    target_bytes: int = 128 << 20,
) -> dict:
    """Collapse fragmented partition leaves of the output tables.

    Every ``run_pipeline`` batch appends part files into each (idspace)
    / (idspace, salt) leaf it touches; after thousands of batches a hot
    partition holds thousands of tiny files and every reader pays the
    open-cost tax. This rewrites any leaf with more than ``max_parts``
    parquet parts down to ceil(bytes / target_bytes) files (the 128 MB
    default matches the scan split size, so compacted files map 1:1 to
    read partitions).

    Same crash-safety contract as :func:`compact_manifest`, adapted to a
    partitioned tree: the rewrite commits (``_SUCCESS``) OUTSIDE the
    table root (``_compact_tmp`` — partition discovery never sees
    half-written data), then two renames swap it in; an interrupted swap
    is healed by :func:`recover_output_compactions`, which this function
    runs first. Maintenance op by design — run it out-of-band like
    Iceberg's rewrite_data_files, not inside the ingest commit path.

    Snapshot interaction: this compactor is DESTRUCTIVE — it deletes the
    fragmented originals, so when a snapshot log exists it finishes by
    committing a replace snapshot from the physical state and EXPIRING
    all history (older snapshots referenced the deleted files). It
    REFUSES to run while tags exist: a tag is a retention pin, and the
    destructive swap would strand it pointing at deleted files
    (code-review r5). Use
    :func:`fastobo_py_spark.plans.snapshots.rewrite_data_files` to
    compact while retaining time travel and tags.
    """
    import shutil

    from fastobo_py_spark.plans import snapshots as _snap

    _snap._refuse_pending_deletes(out_dir, tables, "compact_outputs")
    branches = _snap.list_branches(out_dir)
    if branches:
        # a staged branch's part files sit physically inside the table
        # leaves: the destructive rewrite would merge the UNAUDITED batch
        # into main and strand the branch ref on deleted files
        raise ValueError(
            f"compact_outputs is destructive and would absorb/strand staged "
            f"branches {sorted(branches)}; publish or delete them first, or use "
            f"snapshots.rewrite_data_files"
        )
    tags = _snap.list_tags(out_dir)
    if tags:
        raise ValueError(
            f"compact_outputs is destructive and would strand tagged snapshots "
            f"{sorted(tags)}; use snapshots.rewrite_data_files (non-destructive) "
            f"or delete the tags first"
        )
    recover_output_compactions(out_dir)
    tmp_root = _compact_tmp_root(out_dir)
    stats = {"leaves_seen": 0, "leaves_compacted": 0, "parts_before": 0, "parts_after": 0}
    for t in tables:
        root = os.path.join(out_dir, t)
        if not os.path.isdir(root):
            continue
        for leaf in _leaf_part_dirs(root):
            parts = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
            stats["leaves_seen"] += 1
            if len(parts) <= max_parts:
                continue
            n_bytes = sum(os.path.getsize(os.path.join(leaf, f)) for f in parts)
            n_out = max(1, (n_bytes + target_bytes - 1) // target_bytes)
            rel = os.path.relpath(leaf, out_dir)
            enc = _enc_leaf(rel)
            tmp = os.path.join(tmp_root, enc)
            shutil.rmtree(tmp, ignore_errors=True)
            # mergeSchema: a leaf mixing pre-/post-evolution files must not
            # be compacted down to one file's schema (columns silently lost)
            spark.read.option("mergeSchema", "true").parquet(leaf).repartition(n_out).write.mode(
                "overwrite"
            ).parquet(tmp)
            old = tmp + _OLD_SUFFIX
            shutil.rmtree(old, ignore_errors=True)
            os.rename(leaf, old)
            os.rename(tmp, leaf)
            shutil.rmtree(old, ignore_errors=True)
            stats["leaves_compacted"] += 1
            stats["parts_before"] += len(parts)
            stats["parts_after"] += int(n_out)
    shutil.rmtree(tmp_root, ignore_errors=True)
    if stats["leaves_compacted"]:
        from fastobo_py_spark.plans import snapshots as _snap

        if _snap.sync_snapshot_to_disk(out_dir, op="replace", tables=tables) is not None:
            stats["snapshots_expired"] = _snap.expire_snapshots(out_dir, keep_last=1, tables=tables)
    return stats
