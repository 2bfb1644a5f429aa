"""Structured Streaming ingest test: availableNow over an on-disk corpus
produces the same clause rows as the batch path, and the checkpoint makes
a second run a no-op (streaming resumability)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F


def test_stream_parse_matches_batch(spark):
    from fastobo_py_spark.sources.corpus import corpus_to_parquet
    from fastobo_py_spark.streaming.ingest import run_stream_to_parquet

    base = tempfile.mkdtemp(prefix="stream_test_")
    corpus_dir = f"{base}/corpus"
    out_dir = f"{base}/out"
    ckpt = f"{base}/ckpt"
    try:
        corpus_to_parquet(corpus_dir, n_obo=8, n_noise=20, n_broken=1, n_files=4)
        run_stream_to_parquet(spark, corpus_dir, out_dir, ckpt)
        got = spark.read.parquet(f"{out_dir}/parsed")
        n_stream = got.count()

        from fastobo_py_spark.operators.parse import parse_corpus

        batch = parse_corpus(spark.read.parquet(corpus_dir))
        assert n_stream == batch.count()
        assert got.where(F.col("is_error")).count() == 2  # 1 broken + 1 mislabeled

        # resumability: re-running against the same checkpoint adds nothing
        run_stream_to_parquet(spark, corpus_dir, out_dir, ckpt)
        assert spark.read.parquet(f"{out_dir}/parsed").count() == n_stream
    finally:
        shutil.rmtree(base, ignore_errors=True)
