#!/usr/bin/env python3
"""Aggregate-checksum variant of check.py for very large outputs.

Usage: python3 tools/check_agg.py <sf_dir> <verify_out_dir> <query> [query...]

For outputs too large to sort/compare row-by-row in pandas (e.g. pair
enumerations at sf1), compares Spark output vs the DuckDB oracle wholly
inside DuckDB: row count + per-column checksums (sum of BIGINT casts for
numerics, sum of hash() for strings) — order-independent and exact.

NOT part of the shipped library — dev tooling only.
"""
import json
import sys

import duckdb


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name in names:
        spark_rel = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        cols = [r[0] for r in con.execute(
            f"DESCRIBE {spark_rel}").fetchall()]
        sums = ", ".join(
            f"sum(hash(CAST(\"{c}\" AS VARCHAR))) AS h_{i}"
            for i, c in enumerate(cols))
        agg = f"SELECT count(*) AS n, {sums} FROM"
        a = con.execute(f"{agg} ({spark_rel})").fetchone()
        b = con.execute(f"{agg} ({oracle[name]})").fetchone()
        if a == b:
            print(f"ok   {name} rows={a[0]} (aggregate checksums match)")
        else:
            n_fail += 1
            print(f"FAIL {name}: spark={a} oracle={b}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
