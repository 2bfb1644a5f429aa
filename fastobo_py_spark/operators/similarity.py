"""Similarity search over an embedding column (array<float>).

Two paths:
  * brute-force cosine top-k — the correctness baseline; broadcast the
    (small) query set, one scan of the corpus, per-partition partial
    top-k via window rank. Exactly mirrorable in SQL for the oracle.
  * LSH-bucketed ANN / near-dup — the 100 TB path: random-hyperplane
    signatures bucket the corpus; probes join only their own bucket,
    turning the cross join into an equi-join on the bucket key.
    Hyperplanes come from a seeded ``numpy.random.RandomState`` generated
    INSIDE the Arrow-batched pandas UDF — no ``dim × n_planes`` literal
    arrays bloating the plan (fine at dim=16, pathological at dim=1024)
    and no driver-side ``.first()`` to sniff the dimension. The same seed
    reproduces the exact weights anywhere (incl. the DuckDB oracle, which
    gets them as SQL literals via :func:`hyperplane_weights`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window


def _norm_hof(v: Column) -> Column:
    """Catalyst higher-order fold ‖v‖ — mirrors the DuckDB oracle SQL
    term-for-term AND is the measured winner at this table's dim=16:
    the fold runs JVM-side with no serialization, while the Arrow kernel
    must ship the full array column across the JVM→Python boundary.
    Measured on local[8], 200k pairs: dim=16 HOF 0.30s vs Arrow 1.71s;
    dim=256 1.33 vs 2.33; crossover ≈ dim 1024 (50k pairs: 1.41 vs
    0.94) — swap call sites to norm_udf/dot_udf past that."""
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot_hof(a: Column, b: Column) -> Column:
    """Higher-order-fold dot product (cost model: see :func:`_norm_hof`)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _fold_rows(cols: list, combine, finish) -> pd.Series:
    """Batch driver for the sequential-fold kernels with exact HOF edge
    semantics: any null operand → null, empty arrays → fold of nothing
    (0.0 before ``finish``), equal-length non-empty batch → one
    vectorized ``np.add.accumulate`` pass (a strict left-to-right fold),
    ragged batch → per-row accumulate (same fold, row at a time)."""
    lens = {len(x) for col in cols for x in col if x is not None}
    uniform = len(lens) == 1 and 0 not in lens and not any(
        x is None for col in cols for x in col
    )
    if uniform:
        mats = [np.stack([np.asarray(x, dtype="float64") for x in col]) for col in cols]
        return pd.Series(finish(np.add.accumulate(combine(*mats), axis=1)[:, -1]))
    out = []
    for row in zip(*cols):
        if any(x is None for x in row) or len({len(x) for x in row}) > 1:
            # null operand, or zip_with length mismatch (null padding
            # poisons the HOF fold to null) → null, matching the spec
            out.append(None)
            continue
        arrs = [np.asarray(x, dtype="float64") for x in row]
        prod = combine(*arrs)
        acc = np.add.accumulate(prod)[-1] if len(prod) else 0.0
        out.append(float(finish(np.asarray([acc]))[0]))
    return pd.Series(out, dtype="float64")


@pandas_udf(DoubleType())
def norm_udf(v: pd.Series) -> pd.Series:
    """Arrow-batched ‖v‖ with SEQUENTIAL summation semantics:
    ``np.add.accumulate`` is a strict left-to-right fold, so the result is
    bit-identical to the interpreted ``F.aggregate`` spec and to DuckDB's
    sequential list fold — float parity at thresholds survives, while the
    arithmetic runs vectorized in C. This is the HIGH-DIM variant: it
    pays one Arrow transfer of the array column per call, which loses to
    the JVM-side fold until ≈dim 1024 (measurements on :func:`_norm_hof`)
    — call sites default to the HOF and switch here for fat embeddings.
    numpy's pairwise ``np.sum``/BLAS ``dot`` would round differently and
    are deliberately NOT used. HOF edge parity: null → null, empty →
    0.0, ragged batches fall back to the same fold row-wise."""
    if len(v) == 0:
        return pd.Series([], dtype="float64")
    return _fold_rows([v], lambda a: a * a, np.sqrt)


@pandas_udf(DoubleType())
def dot_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched a·b, sequential-fold parity (see :func:`norm_udf`)."""
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    return _fold_rows([a, b], lambda x, y: x * y, lambda z: z)


# Codegen fast path (optimization r6, guide §4.1 "prefer built-ins"):
# F.aggregate/zip_with are CodegenFallback — every element costs an
# interpreted lambda dispatch. For a statically known dim the SAME
# left-to-right fold unrolls into a flat arithmetic expression
# ((0.0 + a1*b1) + a2*b2) + ... that whole-stage codegen compiles.
# IEEE float addition is evaluated in the identical order, so results
# are BIT-EQUAL to the HOF fold (pinned by test_cosine_fast_matches_hof);
# null arrays and null elements poison to null in both (F.get returns
# null out of range, null * x = null, null + x = null). Rows whose size
# differs from the unrolled dim fall back to the interpreted HOF, so
# semantics are unchanged for any input shape.
FAST_DIMS = (64,)  # the embeddings tables' dim; extend when new corpora land


def _chain_dot(a: Column, b: Column, dim: int) -> Column:
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + (F.get(a, i) * F.get(b, i))
    return acc


def _chain_sqnorm(v: Column, dim: int) -> Column:
    acc = F.lit(0.0)
    for i in range(dim):
        x = F.get(v, i)
        acc = acc + (x * x)
    return acc


def _norm_fast(v: Column) -> Column:
    expr = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    for d in FAST_DIMS:
        expr = F.when(F.size(v) == d, F.sqrt(_chain_sqnorm(v, d))).otherwise(expr)
    return expr


def _dot_fast(a: Column, b: Column) -> Column:
    expr = _dot_hof(a, b)
    for d in FAST_DIMS:
        expr = F.when((F.size(a) == d) & (F.size(b) == d), _chain_dot(a, b, d)).otherwise(expr)
    return expr


# default cosine impl: the interpreted HOF fold. The codegen-unrolled
# chain above is bit-equal (pinned by test_cosine_chain_matches_hof) and
# its generated loop body runs at the same speed at dim 64 (measured
# 0.389s noop both over 400k pairs at sf1), but CONSTRUCTING it costs
# ~0.5s of py4j round trips per invocation (~800 Column calls) plus a
# first-run janino compile of the giant method — full ann_bruteforce
# cold 2.5s (chain) vs 1.75s (HOF), warm 1.3s vs 0.8s (optimization r6
# re-measurement, fresh session each). The chain stays available for
# call sites that build the expression once and reuse it; the Arrow
# kernels (norm_udf/dot_udf, bit-equal) take over past ≈dim 1024.
_norm = _norm_hof
_dot = _dot_hof


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id).

    ``queries`` is (query_id, q: array<double>). The query side broadcasts;
    the corpus is scanned once. Ties broken by neighbor_id for determinism.
    """
    from fastobo_py_spark.operators.spread import spread_by

    # spread the corpus scan (guide §2.5/§6): the broadcast-nested-loop
    # cosine fan-out runs fused with the scan, and the driver tables have
    # 1 row group — without this every (corpus x query) cosine computes
    # in ONE task; a no-op at real scale
    corp = spread_by(
        embeddings.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").cast("array<double>").alias("v"),
        ),
        "neighbor_id",
    ).withColumn("nrm", _norm(F.col("v")))
    q = queries.withColumn("qnrm", _norm(F.col("q")))
    joined = corp.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    cos = _dot(F.col("v"), F.col("q")) / (F.col("nrm") * F.col("qnrm"))
    scored = joined.select("query_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def self_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5) -> DataFrame:
    """Top-k neighbors for the first ``n_queries`` vec_ids of the table."""
    queries = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("q")
    )
    return brute_force_topk(embeddings, queries, k=k)


def hyperplane_weights(dim: int, n_planes: int, seed: int = 7) -> "np.ndarray":
    """Deterministic Gaussian hyperplanes, shape (dim, n_planes).

    Generated from a seeded RandomState so executors, the driver, and the
    DuckDB oracle (which receives them as SQL literals) all agree bit-for-
    bit — float64 repr round-trips exactly.
    """
    return np.random.RandomState(seed).standard_normal((dim, n_planes))


def _ragged_ref_dim(lens) -> int:
    """Reference dim for a ragged Arrow batch: the MOST FREQUENT non-null
    row length (ties broken toward the smaller dim, deterministically).
    ``max(lens)`` would let a single over-length malformed vector
    NULL-bucket every normal-dim vector that happens to share its Arrow
    batch — bucket assignment would depend on batch boundaries and
    diverge from the brute-force path, which only nulls the bad row's
    cosine. The modal length confines NULLs to the malformed rows."""
    from collections import Counter

    counts = Counter(lens)
    if not counts:
        return 0
    return max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]


def signature_udf(n_planes: int, seed: int = 7):
    """pandas UDF: array<double> embedding → '0101...' sign-bit string.

    The weight matrix is rebuilt per executor from the seed (a few KB of
    numpy state) instead of shipping dim × n_planes literals in the plan;
    each Arrow batch is one vectorized (batch × dim) @ (dim × n_planes)
    matmul.
    """

    # heavyweight init once per task, not per batch (guide §4.5): the
    # Arrow batch size is tuned small for the whole-document parse UDF,
    # so without this the RandomState rebuild ran per 16-row batch
    _w_cache: dict = {}

    def _weights(dim: int) -> "np.ndarray":
        if dim not in _w_cache:
            _w_cache[dim] = hyperplane_weights(dim, n_planes, seed)
        return _w_cache[dim]

    @pandas_udf("string")
    def sig(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        # null/ragged rows get a NULL bucket (they match nothing in the
        # equi-join, mirroring the brute-force path's NULL cosine) rather
        # than np.stack killing the whole task
        lens = {len(x) for x in v if x is not None}
        if len(lens) == 1 and not any(x is None for x in v):
            mat = np.stack(v.to_numpy())
            bits = mat @ _weights(mat.shape[1]) >= 0
            return pd.Series(["".join("1" if b else "0" for b in row) for row in bits])
        out = []
        dim = _ragged_ref_dim(len(x) for x in v if x is not None)
        for x in v:
            if x is None or len(x) != dim:
                out.append(None)
                continue
            row = np.asarray(x, dtype="float64") @ _weights(dim) >= 0
            out.append("".join("1" if b else "0" for b in row))
        return pd.Series(out, dtype="object")

    return sig


def lsh_bucketed_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5, n_planes: int = 8, seed: int = 7) -> DataFrame:
    """ANN via hyperplane buckets: candidates share the query's bucket;
    exact cosine + rank within the bucket. Recall < 1 by design — the
    scale path (bucket equi-join instead of cross join)."""
    # norms computed ONCE per vector as columns (the brute-force shape):
    # folding them inside the pair expression re-paid an O(dim) norm per
    # candidate — a bucket with B members cost B redundant folds/vector
    from fastobo_py_spark.operators.spread import spread_by

    e = (
        spread_by(
            embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v")),
            "vec_id",
        )
        .withColumn("bucket", signature_udf(n_planes, seed)(F.col("v")))
        .withColumn("nrm", _norm(F.col("v")))
    )
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q"), F.col("bucket"),
        F.col("nrm").alias("qnrm"),
    )
    cand = e.join(q, "bucket").where(F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("v"), F.col("q")) / (F.col("nrm") * F.col("qnrm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def ivf_anchors(dim: int, n_cells: int, seed: int = 11) -> "np.ndarray":
    """Deterministic unit-norm anchor matrix (n_cells, dim) — a
    k-means-free IVF coarse quantizer: the probe/search structure of an
    inverted-file index with centroids replaced by seeded random anchors,
    so executors, driver and the DuckDB oracle reproduce the exact same
    cells (float64 repr round-trips). A production deployment swaps this
    for trained k-means centroids; every DataFrame below is unchanged."""
    a = np.random.RandomState(seed).standard_normal((n_cells, dim))
    return a / np.linalg.norm(a, axis=1, keepdims=True)


def kmeans_centroids(vectors: "np.ndarray", n_cells: int, seed: int = 13, iters: int = 10) -> "np.ndarray":
    """Deterministic spherical k-means (Lloyd) for IVF coarse quantizers.

    Unit-normalizes the input (zero vectors dropped), picks ``n_cells``
    seeded initial centroids without replacement, then iterates
    assign-by-max-dot (ties → lowest cell id via argmax) / mean-and-
    renormalize. An emptied cell keeps its previous centroid (no random
    restarts — determinism over recall polish). Returns unit-norm float64
    ``(n_cells, dim)`` — a drop-in replacement for :func:`ivf_anchors`.

    The spherical objective (sum of max cosine to a centroid) is
    monotonically non-decreasing across iterations, which the tests pin.
    """
    v = np.asarray(vectors, dtype="float64")
    if v.ndim != 2:
        raise ValueError("vectors must be a 2-D (n, dim) array")
    nrm = np.linalg.norm(v, axis=1, keepdims=True)
    v = v[nrm[:, 0] > 0] / nrm[nrm[:, 0] > 0]
    if len(v) < n_cells:
        raise ValueError(f"need >= {n_cells} non-zero training vectors, got {len(v)}")
    idx = np.sort(np.random.RandomState(seed).choice(len(v), size=n_cells, replace=False))
    c = v[idx].copy()
    for _ in range(iters):
        assign = np.argmax(v @ c.T, axis=1)
        new_c = c.copy()
        for j in range(n_cells):
            members = v[assign == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    new_c[j] = m / n
        if np.array_equal(new_c, c):
            break
        c = new_c
    return c


# memoized trained quantizers: bench reruns and the oracle builder share
# one training pass per (sf_dir, params) instead of re-reading parquet
_TRAINED_ANCHORS: dict = {}


def train_ivf_anchors(
    sf_dir: str, n_cells: int = 16, train_n: int = 256, seed: int = 13, iters: int = 10
) -> "np.ndarray":
    """Train IVF centroids on a BOUNDED, deterministic sample of the
    embeddings table: the first ``train_n`` vec_ids, read driver-side via
    pyarrow (a few-hundred × dim float block — the faiss-style shape:
    coarse quantizers train on a sample, never the corpus; at 100 TB the
    sample is a pushed-down ``vec_id < train_n`` scan of one partition).
    Spark query and DuckDB oracle call THIS same function, so both sides
    hold bit-identical centroids (float64 repr round-trips into SQL)."""
    key = (sf_dir, n_cells, train_n, seed, iters)
    hit = _TRAINED_ANCHORS.get(key)
    if hit is not None:
        return hit
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas()
    df = df[df["vec_id"] < train_n].sort_values("vec_id")
    mat = np.stack([np.asarray(x, dtype="float64") for x in df["embedding"]])
    out = kmeans_centroids(mat, n_cells, seed=seed, iters=iters)
    _TRAINED_ANCHORS[key] = out
    return out


def cells_udf(n_cells: int, nprobe: int, seed: int = 11, anchors: "np.ndarray | None" = None):
    """pandas UDF: embedding → array<int> of the ``nprobe`` best cells,
    ordered by anchor dot product (argmax of v·a equals argmax of cosine:
    |v| is constant per row, so no normalization — fewer float ops to
    keep bit-parity with the SQL mirror). Stable sort = deterministic
    tie-break by cell id.

    ``anchors`` (optional) pins an explicit quantizer — e.g. k-means
    centroids from :func:`train_ivf_anchors` — shipped to executors via
    closure capture (n_cells × dim float64, a few KB; never retrained per
    executor). Default: seeded random anchors rebuilt from ``seed``."""
    if anchors is not None:
        anchors = np.ascontiguousarray(anchors, dtype="float64")
        if anchors.shape[0] != n_cells:
            raise ValueError(f"anchors has {anchors.shape[0]} rows, expected n_cells={n_cells}")

    # per-task anchor cache (guide §4.5) — seeded anchors otherwise
    # regenerate per 16-row Arrow batch
    _a_cache: dict = {}

    @pandas_udf("array<int>")
    def cells(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")

        def _anchors_for(dim: int):
            if anchors is not None:
                return anchors if anchors.shape[1] == dim else None
            if dim not in _a_cache:
                _a_cache[dim] = ivf_anchors(dim, n_cells, seed)
            return _a_cache[dim]

        # same null/ragged policy as signature_udf: NULL cells, no crash
        lens = {len(x) for x in v if x is not None}
        if len(lens) == 1 and not any(x is None for x in v):
            mat = np.stack(v.to_numpy())
            a = _anchors_for(mat.shape[1])
            if a is None:  # uniform batch at a non-quantizer dim
                return pd.Series([None] * len(v), dtype="object")
            scores = mat @ a.T
            order = np.argsort(-scores, axis=1, kind="stable")[:, :nprobe]
            return pd.Series([[int(c) for c in row] for row in order])
        out = []
        # with an explicit quantizer the reference dim is known a priori —
        # anchors.shape[1] — so malformed rows can never outvote valid
        # ones via the modal heuristic (code-review r5: a batch where
        # wrong-dim rows dominate would NULL the valid vectors too)
        dim = anchors.shape[1] if anchors is not None else _ragged_ref_dim(
            len(x) for x in v if x is not None
        )
        a = _anchors_for(dim)
        for x in v:
            if x is None or len(x) != dim or a is None:
                out.append(None)
                continue
            scores = np.asarray(x, dtype="float64") @ a.T
            out.append([int(c) for c in np.argsort(-scores, kind="stable")[:nprobe]])
        return pd.Series(out, dtype="object")

    return cells


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 11,
    anchors: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF-style ANN: corpus vectors live in their single best cell; a
    query probes its ``nprobe`` best cells and ranks exact cosine inside
    them only. The cross join becomes an equi-join on cell id, and recall
    grows with nprobe — the classic quality/cost dial the brute-force
    baseline lacks. Everything shuffles by cell id: cells are the
    partition-pruning unit at 100 TB (one parquet partition per cell).

    ``anchors`` swaps the seeded-random quantizer for trained centroids
    (:func:`train_ivf_anchors`); the DataFrame program is unchanged."""
    from fastobo_py_spark.operators.spread import spread_by

    e = (
        spread_by(
            embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v")),
            "vec_id",
        )
        .withColumn("cell", F.element_at(cells_udf(n_cells, 1, seed, anchors)(F.col("v")), 1))
        .withColumn("nrm", _norm(F.col("v")))
    )
    q = (
        e.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("q"),
            F.col("nrm").alias("qnrm"),
            F.explode(cells_udf(n_cells, nprobe, seed, anchors)(F.col("v"))).alias("cell"),
        )
    )
    cand = e.join(q, "cell").where(F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("v"), F.col("q")) / (F.col("nrm") * F.col("qnrm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
