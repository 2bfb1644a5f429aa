"""Structured Streaming ingest: new corpus files → clause rows, exactly
the batch operators over ``readStream``.

The batch pipeline is resumable via the manifest anti-join (O19); the
streaming variant gets the same guarantee from the Structured Streaming
checkpoint (source offsets + sink commit log). Because the parse stage is
a stateless ``mapInPandas``, the SAME operator code runs in both modes —
the classic Spark batch/streaming unification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fastobo_py_spark.operators.parse import parse_corpus
from fastobo_py_spark.schema import CORPUS_SCHEMA


def stream_parse_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """readStream over a corpus parquet directory → combined parse output
    (clauses + quarantine rows, discriminated by ``is_error``).

    Caller attaches the sink, e.g.::

        q = (stream_parse_corpus(spark, dir)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
    """
    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(corpus_dir)
    return parse_corpus(stream)


def run_stream_to_parquet(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Materialize the parsed stream into ONE parquet sink (clause and
    quarantine rows together, distinguished by the is_error column —
    split_parsed is a downstream reader concern here).

    ``availableNow`` processes the current backlog then stops — the
    batch-equivalent trigger used in tests; a production deployment drops
    it for continuous micro-batches.
    """
    parsed = stream_parse_corpus(spark, corpus_dir)
    writer = (
        parsed.writeStream.format("parquet")
        .option("path", f"{out_dir}/parsed")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
