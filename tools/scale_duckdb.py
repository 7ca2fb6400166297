#!/usr/bin/env python3
"""DuckDB twin of the ScaleCurve harness (round-10 verdict #1): time
the named oracle SQLs over the SAME scaled parquet dirs ScaleCurve
wrote, same session, N runs each, medians.

Usage: tools/scale_duckdb.py <oracle_sql.json> <scaleRoot> <factors> <q1,q2,...> [runs]
e.g.:  tools/scale_duckdb.py /tmp/vout/oracle_sql.json /tmp/graft-scale 1,3,10 \
          dedup_substring,dedup_substring_keepfirst 3
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    oracle_path, root, factors, queries = sys.argv[1:5]
    runs = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    with open(oracle_path) as f:
        oracles = json.load(f)
    base = "/root/testdata/sf0.1"
    for m in [int(x) for x in factors.split(",")]:
        con = duckdb.connect()
        for t in TABLES:
            # scaled dirs carry only the corpus tables; the rest fall
            # back to the base sf dir (the spans queries touch only
            # `documents`, so the fallback is never on the hot path)
            src = f"{root}/x{m}/{t}.parquet/*.parquet" \
                if t in ("documents", "embeddings") else f"{base}/{t}.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        for q in queries.split(","):
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                con.execute(oracles[q]).df()
                ts.append(time.perf_counter() - t0)
            print(json.dumps({"scale": m, "q": q,
                              "sec": [round(t, 2) for t in ts],
                              "median_sec": round(statistics.median(ts), 2)}),
                  flush=True)
        con.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
