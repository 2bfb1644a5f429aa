"""Batch deduplication queries: exact, MinHash+LSH, n-gram Jaccard,
SimHash, embedding near-dup, duplicate clusters and the keep-list."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastobo_py_spark.queries._registry import (
    GENERATED_ORACLES as _GENERATED_ORACLES,
    QUERIES,
    STATIC_SQLS,
)
from fastobo_py_spark.operators import dedup as D
from fastobo_py_spark.operators import text as X
from fastobo_py_spark.queries.text import _EN
from fastobo_py_spark.sources.tables import load_table


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return D.exact_duplicates(docs).orderBy("fp")


SQL_DEDUP_EXACT = """
SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
       min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents
GROUP BY 1
ORDER BY 1
"""

_SH = """
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
              ELSE [array_to_string(toks, ' ')] END AS shs
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS toks
        FROM documents)
"""

# double hashing mirror of operators.dedup.minhash_signatures: one md5
# per shingle, h_i = a + i*b over the two 32-bit halves
_SIG = (
    "SELECT doc_id, "
    + ", ".join(f"min(a + {i} * b) AS h{i}" for i in range(16))
    + " FROM (SELECT doc_id,"
    + " ('0x' || substr(md5(sh), 1, 8))::UBIGINT::BIGINT AS a,"
    + " ('0x' || substr(md5(sh), 9, 8))::UBIGINT::BIGINT AS b"
    + f" FROM (SELECT doc_id, unnest(shs) AS sh FROM ({_SH}))) GROUP BY doc_id"
)

_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_ix, md5(h{4*b}::VARCHAR || '|' || h{4*b+1}::VARCHAR || '|' || h{4*b+2}::VARCHAR || '|' || h{4*b+3}::VARCHAR) AS band_hash FROM sigs"
    for b in range(4)
)

_EST = " + ".join(f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(16))


def q_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return D.minhash_candidate_pairs(docs).orderBy("doc_a", "doc_b")


SQL_DEDUP_MINHASH = f"""
WITH sigs AS ({_SIG}),
bands AS ({_BANDS}),
pairs AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r ON l.band_ix = r.band_ix AND l.band_hash = r.band_hash
  WHERE l.doc_id < r.doc_id
)
SELECT p.doc_a, p.doc_b, round(({_EST}) / 16.0, 6) AS est_jaccard
FROM pairs p JOIN sigs a ON p.doc_a = a.doc_id JOIN sigs b ON p.doc_b = b.doc_id
ORDER BY p.doc_a, p.doc_b
"""


def q_dedup_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return D.ngram_jaccard_pairs(docs).orderBy("doc_a", "doc_b")


SQL_DEDUP_JACCARD = f"""
WITH sigs AS ({_SIG}),
bands AS ({_BANDS}),
pairs AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r ON l.band_ix = r.band_ix AND l.band_hash = r.band_hash
  WHERE l.doc_id < r.doc_id
),
sh AS (SELECT doc_id, unnest(shs) AS sh FROM ({_SH})),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS n_int
  FROM pairs p JOIN sh a ON p.doc_a = a.doc_id JOIN sh b ON p.doc_b = b.doc_id AND a.sh = b.sh
  GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(n_int / (sa.n_sh + sb.n_sh - n_int), 6) AS jaccard
FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id JOIN sizes sb ON i.doc_b = sb.doc_id
ORDER BY i.doc_a, i.doc_b
"""


def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate GROUPS: connected components over the exact-Jaccard
    (>= 0.5) near-dup pairs — the keep-one-per-cluster dedup decision.
    Doc ids ride as zero-padded strings so the CC min-label convention
    (lexicographic) equals numeric order in both engines."""
    docs = load_table(spark, sf, "documents")
    pairs = D.ngram_jaccard_pairs(docs, min_jaccard=0.5).select(
        F.format_string("%010d", F.col("doc_a")).alias("doc_a"),
        F.format_string("%010d", F.col("doc_b")).alias("doc_b"),
    )
    return (
        D.duplicate_clusters(pairs)
        .groupBy("component")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("component")
    )


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE sigs AS ({_SIG}),
bands AS ({_BANDS}),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r ON l.band_ix = r.band_ix AND l.band_hash = r.band_hash
  WHERE l.doc_id < r.doc_id
),
sh AS (SELECT doc_id, unnest(shs) AS sh FROM ({_SH})),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_int
  FROM cand c JOIN sh a ON c.doc_a = a.doc_id JOIN sh b ON c.doc_b = b.doc_id AND a.sh = b.sh
  GROUP BY c.doc_a, c.doc_b
),
pairs AS (
  SELECT lpad(i.doc_a::VARCHAR, 10, '0') AS a, lpad(i.doc_b::VARCHAR, 10, '0') AS b
  FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE round(n_int::DOUBLE / (sa.n_sh + sb.n_sh - n_int), 6) >= 0.5
),
sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a
)
SELECT component, count(*) AS n_docs FROM (
  SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a
) GROUP BY component
ORDER BY component
"""


def q_corpus_keep_list(spark: SparkSession, sf: str) -> DataFrame:
    """The curation end-product: every doc classified kept /
    drop_low_quality / drop_near_dup with fixed precedence (quality
    first, then near-dup non-representatives). Composes the quality
    scorer, the two-stage MinHash→Jaccard pipeline, and the duplicate
    clusters into the keep-one-per-group decision a training-data
    pipeline actually ships."""
    docs = load_table(spark, sf, "documents")
    stats = X.text_stats(docs).select("doc_id", "quality_ppm")
    pairs = D.ngram_jaccard_pairs(docs, min_jaccard=0.5).select(
        F.format_string("%010d", F.col("doc_a")).alias("doc_a"),
        F.format_string("%010d", F.col("doc_b")).alias("doc_b"),
    )
    comps = D.duplicate_clusters(pairs).withColumnRenamed("id", "pid")
    classified = (
        stats.withColumn("pid", F.format_string("%010d", F.col("doc_id")))
        .join(comps, "pid", "left")
        .select(
            F.when(F.col("quality_ppm") < 400_000, F.lit("drop_low_quality"))
            .when(F.col("component").isNotNull() & (F.col("pid") != F.col("component")), F.lit("drop_near_dup"))
            .otherwise(F.lit("kept"))
            .alias("reason")
        )
    )
    return classified.groupBy("reason").agg(F.count("*").alias("n_docs")).orderBy("reason")


def sql_corpus_keep_list() -> str:
    return f"""
WITH RECURSIVE sigs AS ({_SIG}),
bands AS ({_BANDS}),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r ON l.band_ix = r.band_ix AND l.band_hash = r.band_hash
  WHERE l.doc_id < r.doc_id
),
sh AS (SELECT doc_id, unnest(shs) AS sh FROM ({_SH})),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_int
  FROM cand c JOIN sh a ON c.doc_a = a.doc_id JOIN sh b ON c.doc_b = b.doc_id AND a.sh = b.sh
  GROUP BY c.doc_a, c.doc_b
),
pairs AS (
  SELECT lpad(i.doc_a::VARCHAR, 10, '0') AS a, lpad(i.doc_b::VARCHAR, 10, '0') AS b
  FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE round(n_int::DOUBLE / (sa.n_sh + sb.n_sh - n_int), 6) >= 0.5
),
sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a
),
comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
base AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS ltoks
  FROM documents
),
q AS (
  SELECT doc_id,
         CAST(floor((0.4 * least(len(toks) / 64.0, 1.0)
             + 0.3 * least(len(list_filter(ltoks, x -> x IN ({_EN}))) / 4.0, 1.0)
             + 0.3 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                           / greatest(length(text), 1))) * 1000000) AS BIGINT) AS quality_ppm
  FROM base
)
SELECT reason, count(*) AS n_docs FROM (
  SELECT CASE WHEN q.quality_ppm < 400000 THEN 'drop_low_quality'
              WHEN c.component IS NOT NULL AND c.id <> c.component THEN 'drop_near_dup'
              ELSE 'kept' END AS reason
  FROM q LEFT JOIN comp c ON lpad(q.doc_id::VARCHAR, 10, '0') = c.id
) GROUP BY reason ORDER BY reason
"""


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return D.simhash(docs).orderBy("doc_id")


SQL_DEDUP_SIMHASH = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS tok
  FROM documents
), hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT)::BIGINT AS h FROM toks
), bits AS (
  SELECT doc_id, b.bit, CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END AS w
  FROM hashed, (SELECT unnest(range(0, 60)) AS bit) b
), per_bit AS (
  SELECT doc_id, bit, sum(w) AS s FROM bits GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
FROM per_bit GROUP BY doc_id ORDER BY doc_id
"""


def q_dedup_embedding(spark: SparkSession, sf: str) -> DataFrame:
    # threshold 0.4 yields a non-trivial pair set on the synthetic
    # embeddings (59 pairs at sf0.01; 0.9 matched nothing and verified
    # nothing about the cosine math)
    emb = load_table(spark, sf, "embeddings")
    return D.embedding_near_dup_pairs(emb, threshold=0.4).orderBy("vec_a", "vec_b")


SQL_DEDUP_EMBEDDING = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
ORDER BY vec_a, vec_b
"""


def q_dedup_embedding_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Scale path: AND-OR hyperplane LSH buckets → exact-cosine verify."""
    emb = load_table(spark, sf, "embeddings")
    return D.embedding_near_dup_lsh(emb, threshold=0.4, n_tables=4, n_planes=4).orderBy("vec_a", "vec_b")


def sql_dedup_embedding_lsh(dim: int = 64, n_tables: int = 4, n_planes: int = 4, seed: int = 7) -> str:
    """DuckDB mirror of the LSH bucketing: the SAME seeded hyperplanes
    (float64 repr round-trips exactly) as SQL literals."""
    from fastobo_py_spark.operators.similarity import hyperplane_weights

    w = hyperplane_weights(dim, n_tables * n_planes, seed)
    def bucket_expr(t: int) -> str:
        bits = []
        for j in range(t * n_planes, (t + 1) * n_planes):
            arr = ", ".join(repr(float(x)) for x in w[:, j])
            bits.append(f"(CASE WHEN list_dot_product(v, [{arr}]) >= 0 THEN '1' ELSE '0' END)")
        return " || ".join(bits)

    tabs = " UNION ALL ".join(
        f"SELECT vec_id, v, nrm, {t} AS t, {bucket_expr(t)} AS bucket FROM e" for t in range(n_tables)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
), tabs AS ({tabs})
SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM tabs a JOIN tabs b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
ORDER BY vec_a, vec_b
"""


def q_dedup_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Hamming-band SimHash near-dup pairs (exact for d<=3 by pigeonhole)."""
    docs = load_table(spark, sf, "documents")
    out = D.simhash_hamming_pairs(docs, max_hamming=3)
    return out.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")).orderBy(
        "doc_a", "doc_b"
    )


# oracle verifies via ALL-PAIRS popcount (oracle scale) — identical result
# set to the band join by the pigeonhole argument in simhash_hamming_pairs
SQL_DEDUP_SIMHASH_PAIRS = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS tok
  FROM documents
), hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT)::BIGINT AS h FROM toks
), bits AS (
  SELECT doc_id, b.bit, CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END AS w
  FROM hashed, (SELECT unnest(range(0, 60)) AS bit) b
), per_bit AS (
  SELECT doc_id, bit, sum(w) AS s FROM bits GROUP BY doc_id, bit
), sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
  FROM per_bit GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


QUERIES.update(
    {
        "dedup_exact": q_dedup_exact,
        "dedup_clusters": q_dedup_clusters,
        "corpus_keep_list": q_corpus_keep_list,
        "dedup_minhash_lsh": q_dedup_minhash,
        "dedup_ngram_jaccard": q_dedup_jaccard,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "dedup_embedding": q_dedup_embedding,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
    }
)
STATIC_SQLS.update(
    {
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_clusters": SQL_DEDUP_CLUSTERS,
        "dedup_minhash_lsh": SQL_DEDUP_MINHASH,
        "dedup_ngram_jaccard": SQL_DEDUP_JACCARD,
        "dedup_simhash": SQL_DEDUP_SIMHASH,
        "dedup_simhash_pairs": SQL_DEDUP_SIMHASH_PAIRS,
        "dedup_embedding": SQL_DEDUP_EMBEDDING,
    }
)
_GENERATED_ORACLES.update(
    {
        "corpus_keep_list": sql_corpus_keep_list,
        "dedup_embedding_lsh": sql_dedup_embedding_lsh,
    }
)
