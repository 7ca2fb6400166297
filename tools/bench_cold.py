#!/usr/bin/env python3
"""Cold-pass bench (round-16 verdict #8): one FRESH JVM per query
batch, every query timed on its first-ever run in that JVM.

The full-sweep bench amortizes JVM warmup, codegen caches, broadcast
machinery and family-shared state across 169 queries; CacheHygieneSpec
already pins CacheManager reuse, but that in-session warmth still
flatters repeated runs. This pass bounds that bias: queries are packed
into batches (whole prefix-families stay together so family-internal
ordering matches the full sweep), each batch runs in a fresh
`sbt runMain graft.Bench` JVM with SPARK_GRAFT_BENCH_ONLY, and the
recorded number is the first run.

What it does NOT bound: the OS page cache — the parquet inputs stay
warm across JVMs. That bias is shared with the DuckDB twin, which also
reads warm files, so the cold/warm comparison is still apples to
apples. Bench's own untimed warmups (parquet reader init, canary
codegen, streaming engine init) still run per JVM, so "cold" here
means cold QUERY state, not a cold harness.

Usage: tools/bench_cold.py [sfdir] [batch_size]
Writes bench_cold.json at the repo root. Do not run other heavy work
concurrently.
"""
import json
import os
import subprocess
import sys
import time


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    med = json.load(open("bench_medians.json"))
    qs = sorted(med["queries"].keys())
    fams = {}
    for q in qs:
        fams.setdefault(q.split("_")[0], []).append(q)
    batches, cur = [], []
    for fam in sorted(fams):
        if cur and len(cur) + len(fams[fam]) > batch_size:
            batches.append(cur)
            cur = []
        cur += fams[fam]
    if cur:
        batches.append(cur)
    out, canaries, degraded, failed = {}, [], [], []
    t0 = time.time()
    for i, b in enumerate(batches):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS="32",
                   SPARK_GRAFT_BENCH_ONLY=",".join(b))
        r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                           env=env, capture_output=True, text=True)
        lines = [l for l in r.stdout.splitlines() if '"metric"' in l]
        if not lines:
            print(f"batch {i}: NO METRIC LINE (rc={r.returncode})",
                  file=sys.stderr)
            print(r.stdout[-2000:], file=sys.stderr)
            return 1
        parsed = json.loads(lines[-1][lines[-1].index("{"):])
        out.update(parsed["queries"])
        canaries.append(parsed["canary_sec"])
        if parsed.get("degraded"):
            degraded.append(i)
        failed += json.loads(json.dumps(parsed.get("failed", [])))
        print(f"batch {i + 1}/{len(batches)} ({len(b)} queries) done, "
              f"{time.time() - t0:.0f}s elapsed", flush=True)
    result = {
        "protocol": "fresh JVM per batch (whole prefix-families), first "
                    "run recorded; OS page cache NOT dropped (shared with "
                    "the DuckDB twin); Bench harness warmups still run",
        "sf": sf,
        "batch_size": batch_size,
        "n_batches": len(batches),
        "canary_sec": canaries,
        "degraded_batches": degraded,
        "failed": failed,
        "queries": out,
    }
    with open("bench_cold.json", "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    total = sum(v for v in out.values() if v > 0)
    print(f"cold total {total:.1f}s over {len(out)} queries; "
          f"degraded batches: {degraded}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
