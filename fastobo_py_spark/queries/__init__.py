r"""Query registry: every implemented operator exposed as a
(spark_fn, oracle_sql) pair for the driver contract (__spark_entry__.py).

Each Spark query is written with the DataFrame API (the operator under
test); each oracle is the same computation in ANSI SQL for DuckDB over
the same parquet views. Column names and value rounding match exactly —
the driver hashes values after sorting columns by name.

OBO queries run over the deterministic synthetic corpus
(sources/corpus.py); their oracles are VALUES literals derived from the
independent pure-Python oracle (oracle.py) — golden snapshots computed by
a second implementation, not by Spark.

Split by family (round-4 refactor): relational / text / dedup / ann /
obo_core / obo_meta / obo_graph / streaming / multimodal, all feeding the
single registry in ``_registry`` so consumers are unchanged.
"""

from fastobo_py_spark.queries._registry import QUERIES, oracle_sqls

# importing each family registers its queries + oracles (order matters
# only for streaming, which reuses dedup's batch oracles)
from fastobo_py_spark.queries import ann  # noqa: E402,F401
from fastobo_py_spark.queries import dedup  # noqa: E402,F401
from fastobo_py_spark.queries import multimodal  # noqa: E402,F401
from fastobo_py_spark.queries import obo_core  # noqa: E402,F401
from fastobo_py_spark.queries import obo_graph  # noqa: E402,F401
from fastobo_py_spark.queries import obo_meta  # noqa: E402,F401
from fastobo_py_spark.queries import relational  # noqa: E402,F401
from fastobo_py_spark.queries import streaming  # noqa: E402,F401
from fastobo_py_spark.queries import text  # noqa: E402,F401
from fastobo_py_spark.queries.relational import (  # noqa: E402
    q_pricing_summary,
    q_region_revenue,
)

__all__ = ["QUERIES", "oracle_sqls", "q_pricing_summary", "q_region_revenue"]
