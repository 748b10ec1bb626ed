"""Order-insensitive Spark↔DuckDB result comparison — a local mirror of the
driver's correctness gate so regressions surface in pytest before a round
ends.

Comparison: sort columns by name, canonicalize cell values (timestamps →
ISO microseconds, floats → repr of the IEEE double, Decimal → normalized),
sort rows, compare. Floats must be BIT-identical — that is the contract the
engine's exact-decimal discipline (redix_stream_spark.numeric) guarantees.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

import numpy as np
import pandas as pd


def _canon_cell(v: Any) -> str:
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "∅"
        return repr(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon_cell(x) for x in seq) + "]"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        out.append(tuple(_canon_cell(row[c]) for c in cols))
    out.sort()
    return out


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"column mismatch: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
        )
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    s_rows = canon_rows(spark_df)
    d_rows = canon_rows(duck_df)
    if s_rows != d_rows:
        diff_s = [r for r in s_rows if r not in set(d_rows)][:5]
        diff_d = [r for r in d_rows if r not in set(s_rows)][:5]
        problems.append(
            f"value mismatch ({len(diff_s)}+ spark-only / {len(diff_d)}+ duck-only rows); "
            f"spark-only sample: {diff_s[:2]}; duck-only sample: {diff_d[:2]}"
        )
    return problems
