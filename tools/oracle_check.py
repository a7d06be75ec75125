"""Local stand-in for the driver's correctness gate.

Runs every QUERIES entry on Spark and its ORACLES twin on DuckDB over the
same parquet tables, then compares row count, column names, and
order-insensitive canonicalized values (strictest: exact equality,
including doubles).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
            s = s.astype(str)
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        out[c] = s
    res = pd.DataFrame(out)
    res = res.sort_values(by=list(res.columns), ignore_index=True)
    return res


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    # Driver-faithful dtype parity: the driver hashes serialized values, so a
    # DuckDB HUGEINT/Decimal (object dtype) vs Spark int64 is a hash mismatch
    # even when every value is numerically equal. Compare raw dtype kinds
    # BEFORE canon() normalizes them away.
    for c in sorted(spark_pdf.columns):
        sk = spark_pdf[c].dtype.kind
        ok = oracle_pdf[c].dtype.kind
        if sk != ok:
            problems.append(
                f"col {c}: dtype kind mismatch (driver hash risk): "
                f"spark={spark_pdf[c].dtype} oracle={oracle_pdf[c].dtype}"
            )
    a, b = canon(spark_pdf), canon(oracle_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av):
                eq = (av.values == bv.values) | (np.isnan(av.values) & np.isnan(bv.values))
            else:
                eq = (av.values == bv.values) | (av.isna().values & bv.isna().values)
            n_bad = int((~eq).sum())
            if n_bad:
                i = int(np.argmax(~eq))
                problems.append(
                    f"col {c}: {n_bad} mismatched values, first at row {i}: "
                    f"spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
                )
    return problems


def run_check(
    spark, sf_dir: str, only: set[str] | None = None, verbose: bool = True
) -> dict:
    """Run every QUERIES entry against its DuckDB oracle twin; return
    ``{"ok": N, "rows_only": N, "fail": N, "fail_names": [...],
    "rows_only_names": [...], "sf_dir": ...}``. This is the full-surface
    stand-in for the driver's capped gate — bench.py embeds the summary
    in its artifact as ``past_cap_oracle`` so the official round record
    carries all registry entries, not just the first 50."""
    from local_pubchem_db_spark.queries import ORACLES, QUERIES, TABLES

    say = print if verbose else (lambda *a, **k: None)
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )
    n_pass = n_fail = n_rows_only = 0
    fail_names: list[str] = []
    rows_only_names: list[str] = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as err:  # noqa: BLE001
            say(f"FAIL {name}: spark error {err}")
            n_fail += 1
            fail_names.append(name)
            continue
        if name not in ORACLES:
            say(f"rows-only {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            rows_only_names.append(name)
            continue
        try:
            oracle_pdf = con.execute(ORACLES[name]).df()
        except Exception as err:  # noqa: BLE001
            say(f"FAIL {name}: oracle error {err}")
            n_fail += 1
            fail_names.append(name)
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            say(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                say(f"   - {p}")
            n_fail += 1
            fail_names.append(name)
        else:
            say(f"ok   {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    con.close()
    return {
        "ok": n_pass,
        "rows_only": n_rows_only,
        "fail": n_fail,
        "fail_names": fail_names,
        "rows_only_names": rows_only_names,
        "sf_dir": sf_dir,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from local_pubchem_db_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    res = run_check(spark, sf_dir, only=only or None)
    print(f"\n{res['ok']} ok, {res['rows_only']} rows-only, {res['fail']} FAIL")
    return 1 if res["fail"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
