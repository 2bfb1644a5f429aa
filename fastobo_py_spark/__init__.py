"""fastobo_py_spark — a PySpark-native OBO knowledge-graph construction engine.

A brand-new distributed engine with the query and data-processing
capabilities of the ``fastobo/fastobo-py`` reference (a Rust/PyO3 OBO 1.4
parser + typed AST, see ``/root/reference``): it scans a repo-corpus table
``(repo, path, commit, lang, content)``, parses OBO documents into typed
clause rows with a vectorized Arrow UDF, extracts (subj, pred, obj)
triples, links and canonicalizes entities, and materializes node/edge
tables — all expressed as DataFrame dataflow so Catalyst/Tungsten pick the
physical plan.

Nothing here is a port: the reference's per-object AST
(``src/py/doc.rs``, ``src/py/term/clause.rs``, ...) becomes a columnar
clause-row schema (:mod:`fastobo_py_spark.schema`); its isinstance-driven
scan patterns become Catalyst projections (:mod:`fastobo_py_spark.operators`).
"""

__version__ = "0.1.0"

from fastobo_py_spark.session import get_spark  # noqa: F401
