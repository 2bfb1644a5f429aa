from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from fastobo_py_spark.session import get_spark

    s = get_spark(app_name="fastobo-py-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    from fastobo_py_spark.sources.corpus import generate_corpus

    return generate_corpus()


@pytest.fixture(scope="session")
def corpus(spark, corpus_rows):
    from fastobo_py_spark.schema import CORPUS_SCHEMA

    return spark.createDataFrame(corpus_rows, schema=CORPUS_SCHEMA).repartition(4)


@pytest.fixture(scope="session")
def clauses(spark, corpus):
    from fastobo_py_spark.operators.parse import parse_corpus, split_parsed

    cl, _ = split_parsed(parse_corpus(corpus))
    cl = cl.persist()
    cl.count()
    return cl
