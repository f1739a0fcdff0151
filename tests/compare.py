"""Order-insensitive result comparison between Spark and the DuckDB oracle.

Mirrors the driver's check (row count + column names + value multiset). We
normalize conservatively: columns sorted by name, floats rounded, timestamps
to naive UTC, then compare sorted row tuples exactly. Queries are expected to
round their own float outputs so that exact comparison is meaningful.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pandas as pd


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # Guard digit: queries round their own floats; this only catches
        # representation noise (e.g. 2.675000000000001).
        return round(v, 9)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _norm_cell(v.item())
        if isinstance(v, np.ndarray):
            return tuple(_norm_cell(x) for x in v.tolist())
    except ImportError:
        pass
    if isinstance(v, datetime):
        return v.replace(tzinfo=None) if v.tzinfo else v
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day)
    return v


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows, key=repr)


def _assert_driver_hashable(df: pd.DataFrame, name: str, side: str) -> None:
    """The grading driver sort_values()s the raw frame over every column
    before hashing — unhashable cells (arrays/maps) hard-error there even
    though our tuple-izing comparator would accept them. Fail loudly here."""
    import numpy as np

    for col in df.columns:
        for v in df[col].head(20):
            if isinstance(v, (list, dict, set, np.ndarray)):
                raise AssertionError(
                    f"{name}: {side} column {col!r} contains {type(v).__name__} "
                    "cells — the driver hasher cannot sort these; serialize with "
                    "to_json/concat_ws in both the query and the oracle"
                )


def assert_oracle_types_strict(arrow_table, name: str = "") -> None:
    """Reject DuckDB HUGEINT / DECIMAL oracle outputs at the Arrow layer.

    The grading driver hashes dtype-sensitively, but pandas silently coerces
    HUGEINT (DuckDB's SUM-over-BIGINT result) to float64, where 42 == 42.0 —
    so an un-cast oracle passes this local gate yet turns the driver row red.
    Fetch the oracle via .arrow() and fail the class before it can recur:
    every final integer aggregate must be CAST(... AS BIGINT).
    """
    import pyarrow as pa

    for field in arrow_table.schema:
        t = field.type
        if pa.types.is_decimal(t) or str(t) == "int128":
            raise AssertionError(
                f"{name}: oracle column {field.name!r} has Arrow type {t} "
                "(DuckDB HUGEINT/DECIMAL) — the driver's hash is dtype-"
                "sensitive while pandas coerces this to float64 locally. "
                "Wrap the final aggregate in CAST(... AS BIGINT)."
            )


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    _assert_driver_hashable(spark_pdf, name, "spark")
    _assert_driver_hashable(oracle_pdf, name, "oracle")
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
