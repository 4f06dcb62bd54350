"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet tables,
compare row count + column names + order-insensitive values (columns sorted
by name, floats must already be rounded by the queries themselves)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from .operators.common import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
        elif out[c].dtype.kind == "f":
            out[c] = out[c].astype("float64").round(9)
        elif out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)


def compare_one(spark, con, name: str, fn, sql: str, sf_dir: str) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir).toPandas()
    odf = con.execute(sql).df()
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return False, f"row count differs: spark={len(sdf)} oracle={len(odf)}"
    a, b = _normalize(sdf), _normalize(odf)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
    except AssertionError as e:
        head = "\n".join(str(e).splitlines()[:6])
        return False, f"values differ:\n{head}\nspark:\n{a.head(3)}\noracle:\n{b.head(3)}"
    return True, f"ok ({len(sdf)} rows)"


def check_all(spark, sf_dir: str, only: list[str] | None = None) -> dict[str, tuple[bool, str]]:
    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    con = duck_connect(sf_dir)
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in osql:
            try:
                n = fn(spark, sf_dir).count()
                results[name] = (n >= 0, f"rows-only ({n} rows, no oracle)")
            except Exception as e:  # noqa: BLE001
                results[name] = (False, f"EXC {e}")
            continue
        try:
            results[name] = compare_one(spark, con, name, fn, osql[name], sf_dir)
        except Exception as e:  # noqa: BLE001
            results[name] = (False, f"EXC {type(e).__name__}: {str(e)[:300]}")
    return results
