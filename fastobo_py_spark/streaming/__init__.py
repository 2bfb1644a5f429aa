"""Structured Streaming variant of the ingest path (stretch goal per
SURVEY.md §2.4 note): continuous OBO→clauses over a file-arrival stream."""

from fastobo_py_spark.streaming.ingest import stream_parse_corpus  # noqa: F401
