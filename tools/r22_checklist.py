#!/usr/bin/env python3
"""Generate the OPTIMIZATION_r22.md per-operator checklist table from
the regenerated bench_medians.json (r22 medians) against the r21
committed medians (read from git), with the round's per-row action.

Usage: tools/r22_checklist.py   (prints markdown to stdout)
"""
import json
import subprocess

TOUCHED = {
    "graph_triangles": "§1 packed edge build + broadcast degrees + packed close",
    "streaming_sessionize": "§2 shared split + one-job sentinels + sized compaction",
    "streaming_daily_metrics": "§2 sized compaction (shares runToCompactedChangelog)",
    "dedup_fuzzy": "§3 ASCII byte-banded DP kernel",
    "record_linkage": "§3 (same kernel family; oracle re-gated)",
    "outlier_mad": "§4 one-pass array med/MAD",
    "percentiles": "§6 fetchHist lock (perf-neutral)",
    "binning_equidepth": "§6 fetchHist lock (perf-neutral)",
}
ADJUDICATED = {
    "mix_temperature": "§5 two NARROW scans beat a full-row window shuffle",
    "graph_pagerank": "§7 round-latency-bound at 30x; width already data-sized",
    "bpe_encode": "§7 iterative merge rounds, latency-bound at 30x",
    "text_collocations": "§7 job-floor at 30x (2s row)",
}


def main():
    r22 = json.load(open("bench_medians.json"))
    r21_raw = subprocess.run(
        ["git", "show", "bd4319f:bench_medians.json"],
        capture_output=True, text=True, check=True).stdout
    r21 = json.loads(r21_raw)
    rows = []
    for q in sorted(r22["queries"]):
        new = r22["queries"][q]["spark_sec"]
        old = r21["queries"].get(q, {}).get("spark_sec")
        if q in TOUCHED:
            act = "touched: " + TOUCHED[q]
        elif q in ADJUDICATED:
            act = "adjudicated: " + ADJUDICATED[q]
        else:
            act = "left: r19-r21 class standing (job-floor / data-dominated / " \
                  "streaming-machinery / write-lifecycle adjudications)"
        rows.append((new, q, old, act))
    print("| query | r21 med (s) | r22 med (s) | r22 action |")
    print("|---|---|---|---|")
    for new, q, old, act in sorted(rows, reverse=True):
        o = f"{old:.2f}" if old is not None else "-"
        print(f"| {q} | {o} | {new:.2f} | {act} |")
    print()
    print(f"r21 total {r21['spark_total_sec']:.1f}s  r22 total "
          f"{r22['spark_total_sec']:.1f}s  duckdb r22 "
          f"{r22['duckdb_total_sec']:.1f}s ratio {r22['ratio']:.3f}")


if __name__ == "__main__":
    main()
