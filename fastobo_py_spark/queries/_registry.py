"""Single shared registry for the driver contract.

Every query-family module registers into these dicts at import time;
``fastobo_py_spark.queries.__init__`` imports all families, so consumers
see one complete ``QUERIES`` / ``oracle_sqls()`` no matter the split.
Generated oracles run the pure-Python second implementation at call
time — assembled through ONE registry so queries() and oracle_sqls()
cannot drift apart (test_every_query_has_oracle pins the key sets).
"""

from __future__ import annotations

QUERIES: dict = {}

# name -> ready ANSI-SQL string (DuckDB-runnable as-is)
STATIC_SQLS: dict = {}

# name -> zero-arg callable building the SQL (pure-Python oracle runs)
GENERATED_ORACLES: dict = {}


def oracle_sqls() -> dict[str, str]:
    out = dict(STATIC_SQLS)
    out.update({name: build() for name, build in GENERATED_ORACLES.items()})
    return out
