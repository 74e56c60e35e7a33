#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs graft.Verify output.

Mimics the driver's correctness gate: for each query parquet written by
`sbt "runMain graft.Verify <sfDir> <outDir>"`, run the oracle SQL in DuckDB
over the same parquet tables, sort columns by name, sort rows, and compare
value-by-value (floats exact, since queries are written float-safe).

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"[MISS] {name}: no spark output"); n_fail += 1; continue
        try:
            sdf = canon(pq.read_table(spark_files[0]).to_pandas())
            odf = canon(con.sql(sql).df())
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); n_fail += 1; continue
        if list(sdf.columns) != list(odf.columns):
            print(f"[FAIL] {name}: cols spark={list(sdf.columns)} oracle={list(odf.columns)}")
            n_fail += 1; continue
        if len(sdf) != len(odf):
            print(f"[FAIL] {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1; continue
        mismatch = None
        for c in sdf.columns:
            a, b = sdf[c].tolist(), odf[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y and str(x) != str(y):
                    mismatch = (c, i, x, y); break
            if mismatch: break
        if mismatch:
            c, i, x, y = mismatch
            print(f"[FAIL] {name}: col={c} row={i} spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(sdf)} rows")
            n_pass += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle: continue
        files = glob.glob(f"{d}/*.parquet")
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files) if files else 0
        print(f"[ROWS] {name}: {rows} rows {'OK' if rows > 0 else 'EMPTY!'}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
