#!/usr/bin/env python3
"""Dev-only local stand-in for the driver's correctness gate.

Reads the parquet dumps written by `sbt "runMain graft.Verify <sfDir> <outDir>"`
plus outDir/oracle_sql.json, runs each oracle in DuckDB over the same
fixture tables, and compares: row count, column names (sorted), and a
hash over the sorted rows. NOT part of the library (driver-side python).

Usage: python3 tools/oracle_check.py <sfDir> <outDir> [name ...]
"""
import sys, json, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir")
            n_bad += 1
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        problems = []
        sc = sorted(spark_df.columns)
        dc = sorted(duck_df.columns)
        if sc != dc:
            problems.append(f"cols spark={sc} duck={dc}")
        if len(spark_df) != len(duck_df):
            problems.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
        if not problems:
            a = spark_df[sc].sort_values(sc, kind="mergesort").reset_index(drop=True)
            b = duck_df[dc].sort_values(dc, kind="mergesort").reset_index(drop=True)
            try:
                import pandas as pd
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
            except AssertionError as e:
                problems.append("values: " + str(e).split("\n")[0])
                # show first differing rows for debugging
                neq = (a.astype(str) != b.astype(str)).any(axis=1)
                idx = neq[neq].index[:3]
                for i in idx:
                    problems.append(f"  row{i} spark={a.loc[i].tolist()} duck={b.loc[i].tolist()}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_bad += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
