#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the matching oracle_sql.json SQL in DuckDB over views of the sfDir
parquet tables, normalize (columns sorted by name, rows sorted by all
columns), and diff exactly. Exit non-zero on any mismatch.

Results larger than GRAFT_DIGEST_ROWS rows (default 20M — only the
sf100 semi-join output crosses it today) are compared by an in-DuckDB
multiset digest instead of a pandas materialized diff: count(*) +
sum/min/max of hash(<all columns, name-sorted, cast to VARCHAR>) over
both the Spark parquet and the oracle SQL. Equal digests ⇒ equal row
multisets up to a 64-bit hash-sum collision; nothing is materialized
on the Python side. The VARCHAR cast canonicalizes integer width
differences (Spark int64 vs DuckDB int32/hugeint) the same way the
pandas path's check_dtype=False does; queries compared this way print
"OK (digest)" so the record shows which rows were digest-checked.
"""
import json, os, sys
import duckdb
import pandas as pd

DIGEST_ROWS = int(os.environ.get("GRAFT_DIGEST_ROWS", "20000000"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # canonicalize dtypes for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark directory layout (e.g. the ScaleGen-derived sf1)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures, checked, rows_only = 0, 0, 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_src = f"SELECT * FROM read_parquet('{qdir}/*.parquet')"
        n_spark = con.execute(
            f"SELECT count(*) FROM ({spark_src})").fetchone()[0]
        if name not in oracles:
            rows_only += 1
            print(f"  [rows-only] {name}: {n_spark} rows")
            continue
        checked += 1
        if n_spark > DIGEST_ROWS:
            cols = sorted(r[0] for r in con.execute(
                f"DESCRIBE {spark_src}").fetchall())
            collist = ", ".join(
                f'CAST("{c}" AS VARCHAR)' for c in cols)
            dig = (f"SELECT count(*) AS n, sum(hash({collist})) AS h, "
                   f"min(hash({collist})) AS lo, "
                   f"max(hash({collist})) AS hi FROM (%s)")
            try:
                ocols = sorted(r[0] for r in con.execute(
                    f"DESCRIBE ({oracles[name]})").fetchall())
                if ocols != cols:
                    print(f"FAIL {name}: columns spark={cols} duck={ocols}")
                    failures += 1
                    continue
                sd = con.execute(dig % spark_src).fetchone()
                dd = con.execute(dig % oracles[name]).fetchone()
            except Exception as e:
                print(f"FAIL {name}: digest error: {e}")
                failures += 1
                continue
            if sd == dd:
                print(f"  OK (digest) {name}: {sd[0]} rows")
            else:
                print(f"FAIL {name}: digest spark={sd} duck={dd}")
                failures += 1
            continue
        spark_df = con.execute(spark_src).df()
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
            print(f"  OK {name}: {len(s)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}")
            failures += 1
    print(f"\n{checked} oracle-checked, {rows_only} rows-only, {failures} failures")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
