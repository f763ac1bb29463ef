"""Local DuckDB differential-oracle harness.

Mimics the driver's correctness gate: run a registered Spark query and its
DuckDB oracle SQL twin on the same parquet fixtures, then compare row count,
column names, and order-insensitive values.  Used by tests/test_parity.py at
sf0.001 so every registered query is verified before the driver ever sees it.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from hadoopmapreduce_spark.catalog import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows.

    Row order is established on non-float columns first, with float columns
    (rounded to 9 significant digits for the key only) as tie-breakers — so a
    last-ulp representation difference between engines cannot reorder rows and
    misalign the pairwise comparison.
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype(float)
        else:
            df[c] = s.map(lambda v: None if v is None or v is pd.NA else v)
    float_cols = [c for c in df.columns if pd.api.types.is_float_dtype(df[c])]
    key_parts = {}
    for c in df.columns:
        if c in float_cols:
            key_parts[c] = df[c].map(
                lambda v: "nan" if pd.isna(v) else format(float(v), ".9e")
            )
        else:
            key_parts[c] = df[c].astype(str)
    key = pd.DataFrame(key_parts, index=df.index)
    by = [c for c in df.columns if c not in float_cols] + float_cols
    order = key.sort_values(by=by, kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


@dataclass
class ParityReport:
    name: str
    ok: bool
    row_count_match: bool
    columns_match: bool
    exact_values: bool
    close_values: bool
    detail: str = ""
    mismatches: list = field(default_factory=list)


def assert_no_hugeint(con: duckdb.DuckDBPyConnection, sql: str, name: str = "") -> None:
    """Fail fast on DuckDB HUGEINT (int128) output columns.

    DuckDB widens integer SUMs to HUGEINT; pandas flattens int128 to int64/
    object, so the local comparator cannot distinguish it from BIGINT — but
    the driver's value hash CAN, and this exact class caused every hash
    mismatch in rounds 1 and 3.  Guarding on the relation's declared types
    (never materialized) makes the class impossible to ship again.
    """
    rel = con.sql(sql)
    bad = [
        c for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper() or "INT128" in str(t).upper()
    ]
    if bad:
        raise AssertionError(
            f"oracle SQL for {name or '<query>'} produces HUGEINT column(s) "
            f"{bad}: add CAST(... AS BIGINT) around the integer SUM — the "
            "driver's value hash sees int128 where pandas does not"
        )


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str,
            rtol: float = 1e-9, exact_required: bool = True) -> ParityReport:
    assert_no_hugeint(con, sql, name)
    pdf_s = spark_df.toPandas()
    pdf_o = con.execute(sql).df()

    cols_s, cols_o = sorted(pdf_s.columns), sorted(pdf_o.columns)
    if cols_s != cols_o:
        return ParityReport(name, False, len(pdf_s) == len(pdf_o), False, False,
                            False, f"columns spark={cols_s} oracle={cols_o}")
    if len(pdf_s) != len(pdf_o):
        return ParityReport(name, False, False, True, False, False,
                            f"rows spark={len(pdf_s)} oracle={len(pdf_o)}")

    a, b = _canon(pdf_s), _canon(pdf_o)
    exact = True
    close = True
    mism = []
    for c in a.columns:
        va, vb = a[c], b[c]
        if pd.api.types.is_float_dtype(va) or pd.api.types.is_float_dtype(vb):
            for i, (x, y) in enumerate(zip(va.astype(float), vb.astype(float))):
                xn, yn = isinstance(x, float) and math.isnan(x), isinstance(y, float) and math.isnan(y)
                if xn or yn:
                    if xn != yn:
                        close = exact = False
                        mism.append((c, i, x, y))
                    continue
                if x != y:
                    exact = False
                    if not math.isclose(x, y, rel_tol=rtol, abs_tol=1e-12):
                        close = False
                        if len(mism) < 5:
                            mism.append((c, i, x, y))
        else:
            neq = ~(va.astype(str) == vb.astype(str))
            if neq.any():
                exact = close = False
                idx = list(neq[neq].index[:5])
                mism.extend((c, int(i), va[i], vb[i]) for i in idx)
    # The driver's gate is an exact value hash, so local green must mean
    # exact — "close" alone is a failure unless the caller opts out.
    ok = exact if exact_required else close
    return ParityReport(name, ok, True, True, exact, close,
                        "" if ok else f"value mismatches: {mism}", mism)
