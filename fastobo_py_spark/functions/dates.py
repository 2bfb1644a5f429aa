r"""OBO date parsing as column expressions.

Two distinct shapes in the reference (``/root/reference/src/date.rs:14-123``,
``src/py/abc.rs:146-151``; golden examples ``tests/common.py:173-194``):

* header ``date:`` — ``DD:MM:YYYY HH:MM`` (``25:03:2019 16:28``)
* ``creation_date:`` — ISO-8601 date (``2021-01-23``) OR datetime with
  optional timezone (``2021-01-23T12:30:00Z``, ``...+02:00``, naive).

Parsed into (timestamp, tz-string) column pairs: Spark timestamps are
tz-normalized, but OBO round-trips need the ORIGINAL offset text, so the
offset rides in a companion string column (same trick as the reference
keeping ``IsoTimezone`` separate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_header_date(col: Column) -> Column:
    """``DD:MM:YYYY HH:MM`` → timestamp (header DateClause).

    try_to_timestamp, NOT to_timestamp: under ANSI mode (default in
    Spark 4) a regex-valid but calendar-invalid value ('30:02:2021 …')
    would otherwise throw and kill the whole stage — the contract here is
    quarantine/NULL, never fail the job."""
    return F.try_to_timestamp(col, F.lit("dd:MM:yyyy HH:mm"))


def format_header_date(col: Column) -> Column:
    return F.date_format(col, "dd:MM:yyyy HH:mm")


def creation_date_kind(col: Column) -> Column:
    """'date' | 'datetime' | 'datetime_tz' | NULL (unparseable)."""
    return (
        F.when(col.rlike(r"^\d{4}-\d{2}-\d{2}$"), F.lit("date"))
        .when(col.rlike(r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?$"), F.lit("datetime"))
        .when(
            col.rlike(r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:?\d{2})$"),
            F.lit("datetime_tz"),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def creation_date_tz(col: Column) -> Column:
    """Original timezone suffix ('Z', '+02:00', ...) or NULL for naive."""
    tz = F.regexp_extract(col, r"([Zz]|[+-]\d{2}:?\d{2})$", 1)
    return F.when((creation_date_kind(col) == "datetime_tz") & (tz != ""), tz)


def parse_creation_date(col: Column) -> Column:
    """ISO date/datetime (naive or zoned) → timestamp.

    Plain dates become midnight; zoned datetimes are converted to session
    UTC (keep :func:`creation_date_tz` alongside to round-trip the
    original offset).
    """
    kind = creation_date_kind(col)
    # normalize BOTH separators the kind regex accepts: [Tt] → space and a
    # lowercase z suffix → Z (the cast only understands uppercase); and
    # try_to_timestamp so calendar-invalid values ('2021-02-30') yield
    # NULL instead of an ANSI DateTimeException killing the node build
    norm = F.regexp_replace(F.regexp_replace(col, "[Tt]", " "), "z$", "Z")
    return (
        F.when(kind == "date", F.try_to_timestamp(col, F.lit("yyyy-MM-dd")))
        .when(kind == "datetime", F.try_to_timestamp(norm))
        .when(kind == "datetime_tz", F.try_to_timestamp(norm))
    )
