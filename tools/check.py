#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sf_dir> <verify_out_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the sf_dir
tables, and compares row count, column names (sorted), and values.
Floats compared with rel/abs tolerance 1e-9 AND exact-after-round(6) to
flag anything that could trip a hash-based compare.

NOT part of the shipped library — dev tooling only (driver-side python
has duckdb/pandas/pyarrow available).
"""
import json
import math
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize timestamps to ns ints, bytes to hex, categories to str
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("int64")
        out[c] = s
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def cmp_frames(name, a: pd.DataFrame, b: pd.DataFrame):
    issues = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: spark={sorted(a.columns)} duck={sorted(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} duck={len(b)}"]
    a, b = canon(a), canon(b)
    for c in a.columns:
        xa, xb = a[c], b[c]
        # The driver's value-hash is dtype-sensitive: DuckDB HUGEINT sums
        # materialize as float64 in pandas while Spark emits int64, and
        # value-equal frames then hash-differ (all four round-1 driver
        # fails). Flag any int-vs-float kind mismatch as a hard FAIL
        # before the tolerance compare can mask it.
        ka = "f" if pd.api.types.is_float_dtype(xa) else (
            "i" if pd.api.types.is_integer_dtype(xa) else "o")
        kb = "f" if pd.api.types.is_float_dtype(xb) else (
            "i" if pd.api.types.is_integer_dtype(xb) else "o")
        if {ka, kb} == {"i", "f"}:
            issues.append(
                f"col {c}: dtype kind mismatch spark={xa.dtype} duck={xb.dtype} "
                f"(driver hash would differ — CAST the oracle side)"
            )
            continue
        if pd.api.types.is_float_dtype(xa) or pd.api.types.is_float_dtype(xb):
            xa = pd.to_numeric(xa, errors="coerce").astype(float)
            xb = pd.to_numeric(xb, errors="coerce").astype(float)
            bad = 0
            maxd = 0.0
            exact = 0
            for va, vb in zip(xa, xb):
                if (isinstance(va, float) and math.isnan(va)) and (
                    isinstance(vb, float) and math.isnan(vb)
                ):
                    continue
                d = abs(va - vb)
                tol = 1e-9 * max(1.0, abs(va), abs(vb))
                if d > tol:
                    bad += 1
                    maxd = max(maxd, d)
                if va != vb:
                    exact += 1
            if bad:
                issues.append(f"col {c}: {bad} values beyond tol, maxdiff={maxd}")
            elif exact:
                issues.append(
                    f"col {c}: WARN {exact} float values not bit-identical "
                    f"(ok if driver rounds before hashing)"
                )
        else:
            neq = (xa.astype(object).where(pd.notna(xa), None)
                   != xb.astype(object).where(pd.notna(xb), None))
            if neq.any():
                i = int(neq.idxmax())
                issues.append(
                    f"col {c}: {int(neq.sum())} mismatches, "
                    f"first at row {i}: spark={xa.iloc[i]!r} duck={xb.iloc[i]!r}"
                )
    return issues


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        issues = cmp_frames(name, spark_df, duck_df)
        hard = [i for i in issues if not i.startswith("col") or "WARN" not in i]
        if hard:
            n_fail += 1
            print(f"FAIL {name}:")
            for i in issues:
                print(f"   {i}")
        else:
            n_ok += 1
            tag = " (float-warn)" if issues else ""
            print(f"ok   {name} rows={len(spark_df)}{tag}")
            for i in issues:
                print(f"   {i}")
    print(f"\n{n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
