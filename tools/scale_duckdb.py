#!/usr/bin/env python3
"""DuckDB twin of the ScaleCurve harness (round-10 verdict #1): time
the named oracle SQLs over the SAME scaled parquet dirs ScaleCurve
wrote, same session, N runs each, medians.

Usage: tools/scale_duckdb.py <oracle_sql.json> <scaleRoot> <factors> <q1,q2,...> [runs]
e.g.:  tools/scale_duckdb.py /tmp/vout/oracle_sql.json /tmp/graft-scale 1,3,10 \
          dedup_substring,dedup_substring_keepfirst 3
"""
import json
import os
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
        # fail LOUDLY on an absent or partially-written scale dir: a
        # silent fallback to the 1x corpus would publish flat "curves"
        # at wrong scale labels (ScaleCurve stamps _DONE/_DONE_events
        # only after a complete materialization)
        if not os.path.isdir(f"{root}/x{m}"):
            raise SystemExit(f"scale dir {root}/x{m} does not exist — "
                             "run tools/ScaleCurve first")
        con = duckdb.connect()
        fallbacks = []
        for t in TABLES:
            # a table ScaleCurve replicated reads from the scaled dir;
            # the rest fall back to the base sf dir (never on the hot
            # path — queries under a curve only touch scaled tables)
            scaled = f"{root}/x{m}/{t}.parquet"
            if os.path.isdir(scaled):
                marker = {"events": "_DONE_events",
                          "orders": "_DONE_rel",
                          "lineitem": "_DONE_rel"}.get(t, "_DONE")
                if not os.path.exists(f"{root}/x{m}/{marker}"):
                    raise SystemExit(
                        f"{scaled} exists without {marker}: partial "
                        "ScaleCurve write — regenerate the scale dir")
                src = f"{scaled}/*.parquet"
            else:
                fallbacks.append(t)
                src = f"{base}/{t}.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        print(json.dumps({"scale": m,
                          "unscaled_base_tables": fallbacks}), flush=True)
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
