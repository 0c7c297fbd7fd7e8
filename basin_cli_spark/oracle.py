"""DuckDB differential-oracle harness.

Mirrors the driver's correctness gate (SURVEY.md §5 item 3): run the Spark
query and the DuckDB oracle SQL over the same parquet fixtures, normalize
both results to canonical value tuples, compare order-insensitively.

Our normalization is *stricter* than a hash compare needs to be — exact
canonical-string equality — so anything passing here also hash-matches.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math

import duckdb
import numpy as np
import pandas as pd

from basin_cli_spark.sources import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with the fixture tables registered as views —
    the same contract the driver gives oracle_sql()."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def canon_value(v):
    """Canonicalize one cell so Spark and DuckDB outputs compare equal when
    the values are equal."""
    if v is None:
        return "NULL"
    if not isinstance(v, (list, tuple, dict, np.ndarray)) and pd.isna(v):
        # None / float NaN / pd.NaT / pd.NA all mean SQL NULL; pandas maps a
        # NULL in a float/timestamp column to NaN/NaT, so treat them alike
        # on both sides.
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, _decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(x)}" for k, x in sorted(v.items())) + "}"
    if v != v:  # residual NaN-likes (pd.NA/NaT)
        return "NULL"
    return str(v)


def canon_frame(df: pd.DataFrame, *, ordered: bool = False) -> list[tuple]:
    """Columns sorted by name; rows as canonical tuples; rows sorted unless
    the comparison is order-sensitive."""
    cols = sorted(df.columns)
    rows = [
        tuple(canon_value(df.iloc[i][c]) for c in cols) for i in range(len(df))
    ]
    return rows if ordered else sorted(rows)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    """Compare a Spark DataFrame result against the oracle's pandas result."""
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        return False, f"column mismatch: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    a, b = canon_frame(spdf), canon_frame(oracle_pdf)
    if len(a) != len(b):
        return False, f"row count mismatch: spark={len(a)} oracle={len(b)}"
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs (spark vs oracle): {diffs}"
    return True, "ok"
