"""Streaming queries: incremental KG build over micro-batches and the
cross-batch stateful dedup family (exact / minhash / embedding)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastobo_py_spark.queries._registry import (
    GENERATED_ORACLES as _GENERATED_ORACLES,
    QUERIES,
    STATIC_SQLS,
)
from fastobo_py_spark.queries._shared import _CORPUS_KW, _values_sql
from fastobo_py_spark.queries.dedup import (
    SQL_DEDUP_MINHASH,
    sql_dedup_embedding_lsh,
)
from fastobo_py_spark.sources.tables import load_table


def q_obo_stream_kg(spark: SparkSession, sf: str) -> DataFrame:
    """§2.1 ``fastobo.iter`` analogue, oracle-checked end to end: the
    streaming corpus→KG job (readStream → foreachBatch canonical chain,
    streaming/kg.py) drained with availableNow across MULTIPLE
    micro-batches; totals over the edge sink must equal the pure-Python
    oracle — i.e. the stream loses and duplicates nothing vs a batch run
    (reference: ``fastobo.iter``, ``src/iter.rs:174-250`` — the same
    frames, pull-based)."""
    import os
    import shutil
    import tempfile

    from fastobo_py_spark.sources.corpus import corpus_to_parquet
    from fastobo_py_spark.streaming.kg import stream_build_kg

    base = tempfile.mkdtemp(prefix="stream_kg_q_")
    corpus_dir = os.path.join(base, "corpus")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    try:
        corpus_to_parquet(corpus_dir, n_files=8, **_CORPUS_KW)
        stream_build_kg(spark, corpus_dir, out, ckpt, max_files_per_trigger=3)
        edges = spark.read.parquet(os.path.join(out, "edges"))
        rows = [
            ("docs_with_edges", edges.select("doc_sha").distinct().count()),
            ("edges_total", edges.select("subj", "pred", "obj", "doc_sha").distinct().count()),
            ("n_preds", edges.select("pred").distinct().count()),
        ]
        return spark.createDataFrame(sorted(rows), "metric string, value bigint")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def sql_obo_stream_kg() -> str:
    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    edges = oracle.build_edges(generate_corpus(**_CORPUS_KW), canonicalize=True)
    dist = {(s, p, o, sha) for s, p, o, _, sha in edges}
    rows = [
        ("docs_with_edges", len({e[3] for e in dist})),
        ("edges_total", len(dist)),
        ("n_preds", len({e[1] for e in dist})),
    ]
    return _values_sql(sorted(rows), ["metric", "value"])


def q_dedup_stream_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming cross-batch dedup, oracle-checked on its batch-order-
    INVARIANT outputs: drained over multiple micro-batches, the stream
    must emit exactly one row per distinct content and account for every
    input row — the same census a batch GROUP BY computes (which doc_id
    survives per group is arrival-dependent and deliberately excluded)."""
    import os
    import shutil
    import tempfile

    from fastobo_py_spark.streaming.dedup import stream_exact_dedup

    base = tempfile.mkdtemp(prefix="stream_dedup_q_")
    try:
        src = os.path.join(base, "docs")
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        docs.repartition(4).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            stream_exact_dedup(stream)
            .writeStream.format("parquet")
            .option("path", os.path.join(base, "out"))
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.read.parquet(os.path.join(base, "out"))
        rows = [
            ("n_distinct", got.count()),
            ("n_docs", got.agg(F.sum("n_in_batch")).collect()[0][0]),
        ]
        return spark.createDataFrame(sorted(rows), "metric string, value bigint")
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_DEDUP_STREAM = """
SELECT * FROM (
  SELECT 'n_distinct' AS metric,
         CAST(count(DISTINCT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))) AS BIGINT) AS value
  FROM documents
  UNION ALL
  SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM documents
) ORDER BY metric
"""

QUERIES.update({"dedup_stream_exact": q_dedup_stream_exact})
def q_dedup_stream_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming MinHash+LSH near-dup candidates drained over
    micro-batches, deduped across bands — must hash-match the SAME
    DuckDB oracle as the batch ``dedup_minhash_lsh`` query: the stream
    loses nothing at batch boundaries and computes identical signatures."""
    import os
    import shutil
    import tempfile

    from fastobo_py_spark.streaming.dedup import stream_minhash_pairs

    base = tempfile.mkdtemp(prefix="stream_mh_q_")
    try:
        src = os.path.join(base, "docs")
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        docs.repartition(4).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            stream_minhash_pairs(stream)
            .writeStream.format("parquet")
            .option("path", os.path.join(base, "out"))
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.read.parquet(os.path.join(base, "out"))
            .select("doc_a", "doc_b", "est_jaccard")
            .dropDuplicates(["doc_a", "doc_b"])
            .orderBy("doc_a", "doc_b")
        )
        # materialize before the temp dir vanishes
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES.update({"dedup_stream_minhash": q_dedup_stream_minhash})


def q_dedup_stream_embedding(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming hyperplane-LSH embedding near-dup drained over
    micro-batches, deduped across tables — hash-matches the SAME DuckDB
    oracle as the batch ``dedup_embedding_lsh`` query (identical seeded
    hyperplanes as SQL literals)."""
    import os
    import shutil
    import tempfile

    from fastobo_py_spark.streaming.dedup import stream_embedding_near_dup

    base = tempfile.mkdtemp(prefix="stream_emb_q_")
    try:
        src = os.path.join(base, "emb")
        emb = load_table(spark, sf, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        emb.repartition(4).write.parquet(src)
        stream = spark.readStream.schema("vec_id long, embedding array<double>").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            stream_embedding_near_dup(stream, threshold=0.4, n_tables=4, n_planes=4)
            .writeStream.format("parquet")
            .option("path", os.path.join(base, "out"))
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.read.parquet(os.path.join(base, "out"))
            .select("vec_a", "vec_b")
            .dropDuplicates()
            .orderBy("vec_a", "vec_b")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES.update({"dedup_stream_embedding": q_dedup_stream_embedding})
_GENERATED_ORACLES.update({"dedup_stream_embedding": sql_dedup_embedding_lsh})


QUERIES.update({"obo_stream_kg": q_obo_stream_kg})
_GENERATED_ORACLES.update({"obo_stream_kg": sql_obo_stream_kg})
STATIC_SQLS.update(
    {
        "dedup_stream_exact": SQL_DEDUP_STREAM,
        "dedup_stream_minhash": SQL_DEDUP_MINHASH,
    }
)
