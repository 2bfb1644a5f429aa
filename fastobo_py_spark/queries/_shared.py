"""Shared fixtures for the query families: the deterministic synthetic
corpus, the per-session memoized clause cache, and SQL literal helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession



_CORPUS_KW = dict(n_obo=40, n_noise=160, n_broken=2, seed=42)


def _corpus_df(spark: SparkSession) -> DataFrame:
    from fastobo_py_spark.sources.corpus import corpus_df

    return corpus_df(spark, partitions=8, **_CORPUS_KW)


# ~20 OBO queries share the same 200-doc synthetic parse; memoize the
# (eagerly filled) clause cache per session so the contract harness parses
# once instead of once per query.
_CLAUSES_CACHE: dict = {}


def _clauses(spark: SparkSession) -> DataFrame:
    from fastobo_py_spark.operators.parse import parse_corpus, split_parsed

    key = spark.sparkContext.applicationId  # unique per session (id() can be GC-reused)
    cached = _CLAUSES_CACHE.get(key)
    if cached is not None:
        return cached
    cl, _ = split_parsed(parse_corpus(_corpus_df(spark)))
    cl = cl.persist()
    cl.count()
    _CLAUSES_CACHE[key] = cl
    return cl


def _sql_quote(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _values_sql(rows, cols) -> str:
    if not rows:
        sel = ", ".join(f"NULL AS {c}" for c in cols)
        return f"SELECT {sel} WHERE 1=0"
    body = ",\n".join("(" + ", ".join(_sql_quote(v) for v in r) + ")" for r in rows)
    return f"SELECT * FROM (VALUES\n{body}\n) AS t({', '.join(cols)})"
