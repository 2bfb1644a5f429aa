"""Scalar column functions (SURVEY.md §2.5): escapes, dates, hashing."""

from fastobo_py_spark.functions.dates import (  # noqa: F401
    parse_creation_date,
    parse_header_date,
)
