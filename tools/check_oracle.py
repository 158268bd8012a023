#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate:
run graft.Verify first (writes <out>/<query>/ parquet + oracle_sql.json),
then compare each query result against DuckDB on the same sf dir.

Usage: python3 tools/check_oracle.py [sfdir] [outdir]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in files]))
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
            continue
        # exact value compare (the driver hashes; we diff for debuggability)
        try:
            unequal = (got.astype(object).where(pd.notnull(got), None).values
                       != want.astype(object).where(pd.notnull(want), None).values)
            bad = unequal.any(axis=1)
        except Exception as e:
            print(f"FAIL {name}: compare error {e}")
            n_bad += 1
            continue
        if bad.any():
            i = bad.argmax()
            print(f"FAIL {name}: {bad.sum()}/{len(got)} rows differ; first diff row {i}:")
            print("  spark :", got.iloc[i].to_dict())
            print("  duckdb:", want.iloc[i].to_dict())
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
