#!/usr/bin/env python3
"""Cold persisted-build series (VERDICT r21 what's-wrong #1 / next #5):
the driver's warm bench never observes a persisted-artifact build
(`persisted_pre_start: 18`, every index-backed row timed as a warm
probe). This tool runs the FULL graft.Bench sweep with a FRESH
`spark.graft.persisted.root` per rep, so every once-per-corpus build
cost lands inside its row and the artifact self-stamps exactly which
rows paid one (`built > 0`).

The warm bench stays the declared recurring-path measurement; this
series puts the build costs on the record beside it.

Writes bench_cold_persisted.json at the repo root:

    {"reps": N, "built_rows": {name: {...}},
     "per_query_median_sec": {...}, "warm_ref": "bench_medians.json"}

Usage: tools/bench_cold_persisted.py [sfDir] [reps]
Run from the repo root; nothing heavy concurrent. The fresh root is
injected as a JVM system property (SparkConf loads spark.* sysprops),
passed through sbt via SBT_OPTS.
"""
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time


def run_bench(sf_dir: str, root: str):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = env.get("SPARK_GRAFT_CPUS", "32")
    # run/fork:=true - a -D on the sbt JVM never reaches the forked
    # session; GraftSession.prepare maps this env var onto
    # spark.graft.persisted.root
    env["SPARK_GRAFT_PERSISTED_ROOT"] = f"file:{root}"
    p = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       capture_output=True, text=True, env=env)
    if p.returncode != 0:
        raise RuntimeError(f"bench failed (exit {p.returncode}):\n"
                           + p.stdout[-2000:] + p.stderr[-2000:])
    for line in p.stdout.splitlines():
        if '"metric"' in line:
            return json.loads(line[line.index("{"):])
    raise RuntimeError("no bench JSON line:\n" + p.stdout[-2000:])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    arts = []
    for r in range(reps):
        root = tempfile.mkdtemp(prefix="graft-cold-root-")
        try:
            art = run_bench(sf_dir, root)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        if art["persisted_pre_start"] != 0:
            raise RuntimeError(
                "cold rep started warm (pre_start != 0) - the fresh root "
                "was not honored")
        arts.append(art)
        print(f"rep {r}: total {art['value']:.1f}s built="
              f"{sorted(art['persisted_index_state'])} "
              f"host {art['host_factor']:.2f} fs {art['fs_factor']:.2f}",
              flush=True)
    qs = sorted(arts[0]["queries"])
    out = {
        "sf": sf_dir, "reps": reps, "generated_unix": int(time.time()),
        "warm_ref": "bench_medians.json",
        "built_rows": arts[0]["persisted_index_state"],
        "totals": [a["value"] for a in arts],
        "host_factor": [a["host_factor"] for a in arts],
        "fs_factor": [a["fs_factor"] for a in arts],
        "degraded": [a["degraded"] for a in arts],
        "per_query_median_sec": {
            q: statistics.median(a["queries"][q] for a in arts) for q in qs},
    }
    with open("bench_cold_persisted.json", "w") as f:
        json.dump(out, f, indent=1)
    built = set()
    for a in arts:
        built |= set(a["persisted_index_state"])
    print("built rows:", sorted(built))
    return 0


if __name__ == "__main__":
    sys.exit(main())
