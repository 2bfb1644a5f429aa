"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator family from SURVEY.md §2:
relational joins/aggs/windows (O13/O15/O17), events sessionization, text
analysis + dedup + similarity (training-data ops), and the OBO→KG pipeline
(parse O1-O3, triples O5, linking O7, canonicalization O8-O11, CC O10).
``oracle_sql()`` gives a DuckDB-checkable mirror for each: plain ANSI SQL
for the star-schema/text queries, VALUES literals computed by the
independent pure-Python oracle (fastobo_py_spark/oracle.py) for the KG
queries over the deterministic synthetic corpus.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship smoke: TPC-H-Q5-shaped 6-way star join at sf0.001."""
    from fastobo_py_spark.queries import q_region_revenue

    return q_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fastobo_py_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from fastobo_py_spark.queries import oracle_sqls

    return oracle_sqls()
