#!/usr/bin/env python3
"""Replicate the driver's correctness gate locally.

Usage:
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out

For every query dumped by graft.Verify: if it has an entry in
oracle_sql.json, run the SQL in DuckDB over the sf parquet tables and compare
rows / schema / hash exactly like the driver (columns sorted by name, rows
lexsorted, csv-hash); otherwise assert the parquet output is non-empty.
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def h(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.6g").encode()).hexdigest()


def main(sf: str, out: str) -> int:
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    fails = []
    n_queries = 0
    for name in sorted(os.listdir(out)):
        d = os.path.join(out, name)
        if not os.path.isdir(d):
            continue
        n_queries += 1
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in glob.glob(os.path.join(d, "*.parquet"))])
        if name not in oracle:
            if len(spark_df) == 0:
                print(f"{name}: ZERO ROWS (rows-only query)")
                fails.append(name)
            continue
        try:
            sdf = canon(spark_df)
            odf = canon(con.execute(oracle[name]).df())
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name}: ERR {str(e)[:200]}")
            fails.append(name)
            continue
        ok = (len(sdf) == len(odf)
              and list(sdf.columns) == list(odf.columns)
              and h(sdf) == h(odf))
        if not ok:
            print(f"{name}: MISMATCH rows {len(sdf)}/{len(odf)} "
                  f"schema={list(sdf.columns) == list(odf.columns)}")
            fails.append(name)
    print(f"queries: {n_queries}, oracles: {len(oracle)}, FAILS: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
