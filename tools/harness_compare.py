"""The driver-shaped result comparison, as a pure importable module.

Extracted from tools/drive_harness.py (round 8, VERDICT r7 #6) so the
oracle-harness gate has a liveness pin: tests/test_gate_liveness.py
feeds deliberately wrong frames through `compare` and asserts each
corruption class is actually detected. The harness script imports from
here — there is exactly one implementation of the gate.

Deliberately NOT shared with tests/utils.assert_frames_match: this
mirrors the DRIVER's check (sort columns by name, round floats,
order-insensitive value hash) and has tracked the real driver 1:1
since round 1; the pytest gate is the STRICTER local gate (isclose
rel/abs 1e-9 per cell with index-aligned sorting). The two can
disagree by design — a float drifting ~1e-7 passes here and fails
pytest, which is the desired failure ORDER (the strict gate trips
first, locally). Keep changes to this normalization in lockstep with
observed driver behavior only.
"""

import hashlib

import pandas as pd


def norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        elif pd.api.types.is_bool_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(bool)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def vhash(pdf: pd.DataFrame) -> str:
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> str:
    """Driver-shaped verdict string: "MATCH" or "MISMATCH cols=... "."""
    a, b = norm(sdf), norm(odf)
    ok_cols = list(a.columns) == list(b.columns)
    ok_rows = len(a) == len(b)
    ok_hash = vhash(a) == vhash(b)
    if ok_cols and ok_rows and ok_hash:
        return "MATCH"
    return f"MISMATCH cols={ok_cols} rows={len(a)}vs{len(b)} hash={ok_hash}"
