"""Scaling-efficiency evidence (BASELINE.json metric: >=0.8 between N and 4N).

No real cluster exists in this sandbox, so per the task directive the same
job runs at two parallelism levels — local[8] (N) and local[32] (4N) — on
identical input, and we report throughput at both plus
efficiency = (T_4N / T_N) / 4. Results land in BENCH/BASELINE.md.

Usage: python tools/scaling_run.py [frontier_rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cores: int, frontier_rows: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env["GRAWLER_BENCH_FRONTIER"] = str(frontier_rows)
    env["GRAWLER_BENCH_IMAGES"] = os.environ.get("GRAWLER_BENCH_IMAGES",
                                                 "6000")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    results = {}
    for cores in (8, 32):
        t0 = time.time()
        results[cores] = run_at(cores, rows)
        print(f"local[{cores}]: {results[cores]}", file=sys.stderr)

    r8, r32 = results[8], results[32]
    eff_frontier = (r32["frontier_urls_per_sec"]
                    / r8["frontier_urls_per_sec"]) / 4
    eff_store = (r32["store_rows_per_sec"] / r8["store_rows_per_sec"]) / 4

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling-efficiency evidence

BASELINE.json requires throughput scaling efficiency >= 0.8 between N and
4N executors. No real cluster exists in this sandbox (task directive), so
the identical job ran at `local[8]` (N) and `local[32]` (4N) on the same
input: a {rows:,}-row synthetic skewed frontier (hot host with 20% of rows,
30% seen overlap) through the real scheduling pipeline (allowlist filter ->
seen anti-join -> salted per-host politeness top-k -> two-phase global
sequence), plus the image decode+phash store path.

| metric | local[8] (N) | local[32] (4N) | efficiency (T4N/TN)/4 |
|---|---|---|---|
| frontier URLs scheduled+deduped /sec | {r8['frontier_urls_per_sec']:,} | {r32['frontier_urls_per_sec']:,} | {eff_frontier:.2f} |
| store image-rows /sec | {r8['store_rows_per_sec']:,} | {r32['store_rows_per_sec']:,} | {eff_store:.2f} |

Headline query timings (sec) at each size:

| query | local[8] | local[32] |
|---|---|---|
""")
        for q in r8["queries"]:
            f.write(f"| {q} | {r8['queries'][q]} | {r32['queries'][q]} |\n")
        f.write(f"""
Raw JSON:

```
{json.dumps(r8)}
{json.dumps(r32)}
```
""")
    print(json.dumps({"eff_frontier": round(eff_frontier, 3),
                      "eff_store": round(eff_store, 3)}))


if __name__ == "__main__":
    main()
