"""Driver-contract helper: run a Spark query and its DuckDB oracle
side-by-side and compare (row count, schema width, values) the way the
driver does — columns sorted by name, rows sorted, values compared after
normalization. Used by tests and by bench sanity checks."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from fastobo_py_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            def _f(x):
                if x is None or (isinstance(x, float) and math.isnan(x)):
                    return None
                r = round(float(x), 9)
                return int(r) if r == int(r) else r
            df[c] = s.map(_f).astype(object)
        elif s.dtype == object:
            def _o(x):
                if x is None:
                    return None
                if isinstance(x, (bool, np.bool_)):
                    return str(bool(x))
                if isinstance(x, (int, np.integer)):
                    return int(x)
                if isinstance(x, (float, np.floating)):
                    if math.isnan(x):
                        return None
                    r = round(float(x), 9)
                    return int(r) if r == int(r) else r
                return str(x)
            df[c] = s.map(_o)
        else:
            try:
                df[c] = s.astype("int64").map(int).astype(object)
            except (TypeError, ValueError):
                df[c] = s.map(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    got = _normalize(spark_df.toPandas())
    want = _normalize(con.sql(sql).df())
    if list(got.columns) != list(want.columns):
        return False, f"schema mismatch: {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return False, f"row count mismatch: {len(got)} vs {len(want)}"
    if not got.equals(want):
        diff = (got != want) & ~(got.isna() & want.isna())
        bad = diff.any(axis=1)
        n = int(bad.sum())
        sample = pd.concat([got[bad].head(3).assign(_side="spark"), want[bad].head(3).assign(_side="oracle")])
        return False, f"{n} mismatched rows; sample:\n{sample}"
    return True, "ok"
