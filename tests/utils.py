"""Oracle-comparison helper mirroring the driver's check: row count,
column names, and order-insensitive values."""

from __future__ import annotations

import math

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif pd.api.types.is_bool_dtype(out[c]):
            out[c] = out[c].astype(bool)
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].round(9)
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = ""):
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            diffs = [
                (x, y)
                for x, y in zip(a[c], b[c])
                if not (
                    (math.isnan(x) and math.isnan(y))
                    or math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
                )
            ]
            assert not diffs, f"{name}.{c}: value mismatches (first 5): {diffs[:5]}"
        else:
            mism = a[c][a[c].ne(b[c])]
            assert mism.empty, (
                f"{name}.{c}: {len(mism)} mismatches, first at idx {mism.index[0]}: "
                f"{a[c][mism.index[0]]!r} vs {b[c][mism.index[0]]!r}"
            )
