"""OBO 1.4 flat-file grammar: tokenizer, document parser, serializer.

The only imperative (non-DataFrame) logic in the engine — it plays the
role of the reference's Rust pest parser (``fastobo`` crate; see
``/root/reference/src/error.rs:12-15`` for the pest Rule imports) and runs
vectorized over Arrow batches inside ``mapInPandas``.
"""

from fastobo_py_spark.obo.parser import parse_document, ParseError  # noqa: F401
