#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

For each query in oracle_sql.json: run the SQL in DuckDB against views over
the sf_dir parquet tables, load the Spark parquet result, canonicalize both
(sort columns by name, sort rows, stringify values), and diff.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)
    out = df.apply(lambda c: c.map(cell))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            mine = pd.read_parquet(spark_dir)
            oracle = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        cm, co = canon(mine), canon(oracle)
        if list(cm.columns) != list(co.columns):
            print(f"FAIL {name}: columns {list(cm.columns)} vs {list(co.columns)}")
            n_fail += 1
        elif len(cm) != len(co):
            print(f"FAIL {name}: rows {len(cm)} vs {len(co)}")
            n_fail += 1
        elif not cm.equals(co):
            diff = (cm != co).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: {int(diff.sum())} differing rows, e.g.")
            for i in idx:
                print("  spark :", dict(cm.iloc[i]))
                print("  oracle:", dict(co.iloc[i]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(cm)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
