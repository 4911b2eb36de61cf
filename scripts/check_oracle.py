#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare (dev tool only —
shipped engine code is pure Scala/Spark). Usage:
    python3 scripts/check_oracle.py <sfDir> <outDir>
Reads outDir/<name>/ parquet (Spark results) + outDir/oracle_sql.json,
runs each SQL in DuckDB over the sfDir tables, compares schema + values
(columns sorted by name, rows in emitted order and also as sorted sets).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm_cell(x) for x in v)
    return v

def frame_rows(df):
    df = df[sorted(df.columns)]
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
            n_fail += 1
            continue
        g, w = frame_rows(got), frame_rows(want)
        if g == w:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        elif sorted(map(repr, g)) == sorted(map(repr, w)):
            print(f"WARN {name}: set-equal but row order differs")
            n_fail += 1
        else:
            print(f"FAIL {name}: values differ ({len(g)} vs {len(w)} rows)")
            for i, (a, b) in enumerate(zip(g, w)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                    break
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
