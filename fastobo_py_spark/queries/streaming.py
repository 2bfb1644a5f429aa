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


# Event-time TTL dedup constants — shared verbatim by the Spark harness
# and the DuckDB oracle below, so the two sides cannot drift.
_TTL_US = 200_000  # sliding TTL: suppress a repeat within 200 ms of the previous event
_TTL_OFFSET_US = 1_000_000_000  # keeps every event above Spark's initial 0-ms watermark
_TTL_GAP_EXPR = "((doc_id % 13) + 1) * 40000"  # per-doc repeat gap: 40–520 ms straddles the TTL


def q_dedup_stream_ttl(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming exact dedup with a DETERMINISTIC sliding TTL on EVENT
    time (streaming/dedup.py::stream_exact_dedup_event_ttl): each doc is
    replayed 3× with a doc-dependent event-time gap (40–520 ms) that
    straddles the 200 ms TTL — close repeats are suppressed, distant ones
    re-emitted, and state is evicted by the watermark horizon
    (EventTimeTimeout). Because the TTL clock is event time, the drained
    output is a pure function of the data and the DuckDB oracle can
    hash-check it row for row (lag window + gap filter) — the
    processing-time ``state_ttl_ms`` twin is pytest-only by nature.

    The harness feeds the stream in event-time order: events are sorted
    by timestamp and chunked into contiguous slice files (boundaries
    aligned to distinct timestamps so no row ever equals the watermark),
    drained one file per micro-batch — repeats of a doc land in LATER
    micro-batches than their first arrival, exercising cross-batch state.
    """
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fastobo_py_spark.streaming.dedup import stream_exact_dedup_event_ttl

    base = tempfile.mkdtemp(prefix="stream_ttl_q_")
    try:
        src = os.path.join(base, "events")
        os.makedirs(src)
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        events = (
            docs.select("doc_id", "text", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("r"))
            .withColumn(
                "event_ts_us",
                (
                    F.lit(_TTL_OFFSET_US)
                    + F.col("doc_id") * 1000
                    + F.col("r") * F.expr(_TTL_GAP_EXPR)
                ).cast("long"),
            )
            .select("doc_id", "text", "event_ts_us")
        )
        pdf = events.toPandas().sort_values(["event_ts_us", "doc_id"]).reset_index(drop=True)
        n, k = len(pdf), 5
        bounds = [0]
        for i in range(1, k):
            b = i * n // k
            # align each boundary to a change in event_ts_us: slice i's
            # min ts must be STRICTLY above slice i-1's max ts, so no row
            # ever ties the watermark (delay 0) and gets late-filtered
            while b < n and pdf["event_ts_us"].iat[b] == pdf["event_ts_us"].iat[b - 1]:
                b += 1
            bounds.append(b)
        bounds.append(n)
        for i in range(k):
            chunk = pdf.iloc[bounds[i] : bounds[i + 1]]
            if not len(chunk):
                continue
            f = os.path.join(src, f"slice-{i:03d}.parquet")
            pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), f)
            # FileStreamSource orders by mtime (path as tiebreak): force
            # strictly increasing mtimes so slice order is arrival order
            os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
        stream = spark.readStream.schema("doc_id long, text string, event_ts_us long").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            stream_exact_dedup_event_ttl(stream, ttl_us=_TTL_US)
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
            .select("fp", "keep_id", "emit_ts_us")
            .orderBy("fp", "emit_ts_us")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_DEDUP_STREAM_TTL = f"""
WITH ev AS (
  SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
         doc_id,
         {_TTL_OFFSET_US} + doc_id * 1000 + r.r * {_TTL_GAP_EXPR} AS ts_us
  FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS r) r
), g AS (
  SELECT fp, doc_id, ts_us,
         lag(ts_us) OVER (PARTITION BY fp ORDER BY ts_us) AS prev_us
  FROM ev
)
SELECT fp, CAST(doc_id AS BIGINT) AS keep_id, CAST(ts_us AS BIGINT) AS emit_ts_us
FROM g
WHERE prev_us IS NULL OR ts_us - prev_us > {_TTL_US}
ORDER BY fp, emit_ts_us
"""

QUERIES.update({"dedup_stream_ttl": q_dedup_stream_ttl})


QUERIES.update({"obo_stream_kg": q_obo_stream_kg})
_GENERATED_ORACLES.update({"obo_stream_kg": sql_obo_stream_kg})
STATIC_SQLS.update(
    {
        "dedup_stream_exact": SQL_DEDUP_STREAM,
        "dedup_stream_minhash": SQL_DEDUP_MINHASH,
        "dedup_stream_ttl": SQL_DEDUP_STREAM_TTL,
    }
)
