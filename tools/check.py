#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL from ``outDir/oracle_sql.json`` in DuckDB (tables =
views over the sf parquet dir), loads the Spark result parquet written by
``graft.Verify`` from ``outDir/<name>/``, sorts columns by name and rows
by value on both sides, and diffs. Exit code = number of mismatches.

Usage: tools/check.py <sfDir> <outDir>
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith(("datetime", "object")):
            df[c] = s.astype(str)
        elif str(s.dtype).startswith("float"):
            # exact-compare floats as repr strings; rounding happened in SQL
            df[c] = s.map(lambda v: "NaN" if v is None or (isinstance(v, float) and math.isnan(v)) else repr(float(v)))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            oracle = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        spark = pd.concat([pd.read_parquet(p) for p in sorted(files)])
        o, s = normalize(oracle), normalize(spark)
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s.columns)}")
            failures += 1
        elif len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            failures += 1
        elif not o.equals(s):
            diff = (o != s) & ~(o.isna() & s.isna())
            rows = diff.any(axis=1)
            print(f"FAIL {name}: {int(rows.sum())} differing rows; first few:")
            print(pd.concat({"oracle": o[rows].head(3), "spark": s[rows].head(3)}, axis=1))
            failures += 1
        else:
            print(f"PASS {name} ({len(o)} rows)")
    print(f"{len(oracles) - failures}/{len(oracles)} queries match")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
