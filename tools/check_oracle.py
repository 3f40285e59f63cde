#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the matching oracle_sql.json SQL in DuckDB over views of the sfDir
parquet tables, normalize (columns sorted by name, rows sorted by all
columns), and diff exactly. Exit non-zero on any mismatch.

Results larger than GRAFT_DIGEST_ROWS rows (default 20M — only the
sf100 semi-join output crosses it today) on EITHER side (Spark or
oracle — an under-producing engine must not drag a 100M-row oracle
through pandas) are compared by an in-DuckDB multiset digest instead
of a pandas materialized diff: count(*) + sum/min/max of
hash(<all columns, name-sorted, cast to VARCHAR>) over both the Spark
parquet and the oracle SQL. Equal digests ⇒ equal row multisets up to
a 64-bit hash-sum collision; nothing is materialized on the Python
side. The VARCHAR cast canonicalizes integer width differences (Spark
int64 vs DuckDB int32/hugeint); it is STRICTER than the pandas path's
check_dtype=False for fractional types — DECIMAL '1.50' vs DOUBLE
'1.5' and -0.0 vs 0.0 differ as strings — so numeric columns are cast
through DOUBLE first to align the two paths. Queries compared this
way print "OK (digest)" so the record shows which rows were
digest-checked.

Oracles too heavy for DuckDB to replay in one query (sf100 q93: the
whole delta-vs-standing minhash funnel exhausts the allocator even
with spill) can be STAGED: an optional oracle_stages.json next to
oracle_sql.json maps query name -> {"stages": [SQL, ...], "main": SQL};
each stage is materialized as TEMP TABLE stage_<name>_<i> in order
(later stages reference earlier ones), then `main` — which references
the staged tables — replaces the monolithic oracle_sql entry for the
compare. Same math (both forms come from the same SQL builders in
graft.OraclePipeline), bounded working set per statement.
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
    stages_path = os.path.join(out_dir, "oracle_stages.json")
    stages = json.load(open(stages_path)) if os.path.exists(stages_path) else {}
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
        # staged oracles: materialize each stage as a temp table, then
        # compare against the staged `main` instead of the monolithic
        # SQL, so DuckDB never holds the whole funnel's working set in
        # one query (sf100 q93 allocator OOM)
        oracle_sql = oracles[name]
        if name in stages:
            try:
                for i, ssql in enumerate(stages[name]["stages"]):
                    con.execute(f"CREATE OR REPLACE TEMP TABLE "
                                f"stage_{name}_{i} AS {ssql}")
            except Exception as e:
                print(f"FAIL {name}: stage error: {e}")
                failures += 1
                drop_stages(con, name, stages)
                continue
            oracle_sql = stages[name]["main"]
        try:
            failures += compare_one(con, name, spark_src, n_spark,
                                    oracle_sql)
        finally:
            # staged temp tables must not stay resident for the rest of
            # the batch (the dedup-family oracles that sort after q93
            # would otherwise run at sf100 with the whole staged corpus
            # still in the allocator)
            drop_stages(con, name, stages)
    print(f"\n{checked} oracle-checked, {rows_only} rows-only, {failures} failures")
    sys.exit(1 if failures else 0)

def drop_stages(con, name, stages):
    if name in stages:
        for i in range(len(stages[name]["stages"])):
            con.execute(f"DROP TABLE IF EXISTS stage_{name}_{i}")

def compare_one(con, name, spark_src, n_spark, oracle_sql):
    """Compare one query's Spark parquet vs its oracle SQL. Returns 0
    on match, 1 on failure (and prints the verdict either way)."""
    # n_spark alone decides the digest path when it crosses the bound;
    # otherwise fetch the oracle ONCE with a LIMIT guard — if the guard
    # trips, the oracle side is oversized and we fall to the digest
    # (re-running it there is the rare case, not every query's tax)
    duck_df = None
    if n_spark <= DIGEST_ROWS:
        try:
            duck_df = con.execute(
                f"SELECT * FROM ({oracle_sql}) LIMIT {DIGEST_ROWS + 1}"
            ).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            return 1
    if n_spark > DIGEST_ROWS or len(duck_df) > DIGEST_ROWS:
        coltypes = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE {spark_src}").fetchall()}
        cols = sorted(coltypes)
        # fractional types render differently as VARCHAR
        # (DECIMAL '1.50' vs DOUBLE '1.5', -0.0 vs 0.0): align
        # through DOUBLE first, like the pandas path's numeric
        # coercion. Integer widths are already canonical as text.
        def canon(c, t):
            t = t.upper()
            if "DECIMAL" in t or "DOUBLE" in t or "FLOAT" in t or "REAL" in t:
                return f'CAST(CAST("{c}" AS DOUBLE) AS VARCHAR)'
            return f'CAST("{c}" AS VARCHAR)'
        try:
            ocoltypes = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE ({oracle_sql})").fetchall()}
            ocols = sorted(ocoltypes)
            if ocols != cols:
                print(f"FAIL {name}: columns spark={cols} duck={ocols}")
                return 1
            def dig(src, types):
                collist = ", ".join(canon(c, types[c]) for c in cols)
                return con.execute(
                    f"SELECT count(*) AS n, sum(hash({collist})) AS h, "
                    f"min(hash({collist})) AS lo, "
                    f"max(hash({collist})) AS hi FROM ({src})").fetchone()
            sd = dig(spark_src, coltypes)
            dd = dig(oracle_sql, ocoltypes)
        except Exception as e:
            print(f"FAIL {name}: digest error: {e}")
            return 1
        if sd == dd:
            print(f"  OK (digest) {name}: {sd[0]} rows")
            return 0
        print(f"FAIL {name}: digest spark={sd} duck={dd}")
        return 1
    spark_df = con.execute(spark_src).df()
    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        return 1
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        return 1
    try:
        pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
        print(f"  OK {name}: {len(s)} rows")
        return 0
    except AssertionError as e:
        print(f"FAIL {name}: {str(e)[:500]}")
        return 1

if __name__ == "__main__":
    main()
