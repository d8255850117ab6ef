"""Local mirror of the driver's DuckDB-oracle comparison.

For each registered query: run the Spark DataFrame and the oracle SQL
on the same parquet, sort columns by name, sort rows, compare values
(exact for non-floats, tight tolerance for floats — the queries
themselves round aggregates so both engines agree to the hash).
"""

from __future__ import annotations

import math
import struct

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
            if getattr(out[c].dt, "tz", None) is not None:
                out[c] = out[c].dt.tz_localize(None)
    # Sort rows by non-float columns first (stable group keys), floats
    # only as tie-breakers — a last-ulp float divergence between engines
    # must not re-pair rows.
    non_float = [c for c in out.columns if not pd.api.types.is_float_dtype(out[c])]
    floats = [c for c in out.columns if pd.api.types.is_float_dtype(out[c])]
    sort_cols = non_float + floats
    out = out.sort_values(by=sort_cols, kind="mergesort", na_position="last")
    return out.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            # Both-float dtype families must agree: a Spark DECIMAL
            # column arrives as object dtype and hashes differently at
            # the driver even when values print the same (seen on
            # lsh_recall_audit r04: decimal 1.0000 vs double 1.0).
            assert pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv), (
                f"{name}.{c}: dtype family mismatch spark={av.dtype} duck={bv.dtype}"
            )
            for i, (x, y) in enumerate(zip(av.tolist(), bv.tolist())):
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                if xn or yn:
                    assert xn and yn, f"{name}.{c}[{i}]: {x!r} vs {y!r}"
                else:
                    # BIT-exact, including the sign of zero — the
                    # driver hashes values, so -0.0 vs 0.0 is a miss
                    # (seen on moment_stats r04). Queries are expected
                    # to round/normalize floats to engine-portable
                    # values; isclose would hide exactly the failures
                    # the driver flags.
                    assert struct.pack("<d", float(x)) == struct.pack("<d", float(y)), (
                        f"{name}.{c}[{i}]: {x!r} vs {y!r} (bit-exact float check)"
                    )
        else:
            same = av.astype(object).where(pd.notna(av), None).tolist() == bv.astype(
                object
            ).where(pd.notna(bv), None).tolist()
            assert same, f"{name}.{c}: value mismatch\nspark={av.head(20)}\nduck={bv.head(20)}"
