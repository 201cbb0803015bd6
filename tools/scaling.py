"""Scaling-efficiency evidence: the same benchmark at N and 4N cores.

The north rule requires >=0.8 throughput scaling efficiency between N
and 4N executors.  This sandbox has one machine, so (per BASELINE.md
protocol) we run bench.py as separate processes at local[8] and
local[32] on the SAME input and report

    efficiency = (T_8 / T_32) / 4            (per query and overall)

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python tools/scaling.py [--sf-dir /root/testdata/sf0.1]
                               [--cores-low 8 --cores-high 32] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_bench(sf_dir: str, cpus: int, pages: int = 0, queries: str = "") -> dict:
    # SPARK_GRAFT_REPS=1: bench.py's internal rep loop is redundant here —
    # this tool interleaves LEVELS and takes minima across invocations,
    # which is the stronger protocol for cross-level comparison
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_REPS="1")
    if pages:
        env["SPARK_GRAFT_PAGES"] = str(pages)
    if queries:
        env["SPARK_GRAFT_QUERIES"] = queries
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800, cwd=str(REPO),
    )
    lines = [x for x in out.stdout.splitlines() if x.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench.py (cpus={cpus}) failed rc={out.returncode}; "
            f"stderr tail: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores-low", type=int, default=8)
    ap.add_argument("--cores-high", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--pages", type=int, default=2_000_000,
                    help="page count for the scaling runs (compute-dominated)")
    ap.add_argument("--queries", default="",
                    help="comma list restricting the timed queries")
    args = ap.parse_args()

    # interleave levels and take per-query minima across reps: this host
    # shows 3-10x co-tenant noise windows; min-of-reps estimates the true
    # (uncontended) cost of each query at each level
    all_runs: dict[int, list[dict]] = {args.cores_low: [], args.cores_high: []}
    for _ in range(args.reps):
        for cpus in (args.cores_low, args.cores_high):
            all_runs[cpus].append(run_bench(args.sf_dir, cpus, args.pages, args.queries))
    results = {}
    for cpus, runs in all_runs.items():
        best = dict(runs[0])
        best["queries"] = {
            q: min(r["queries"][q] for r in runs) for q in runs[0]["queries"]
        }
        best["value"] = round(sum(best["queries"].values()), 3)
        # keep derived fields consistent with the min-merged times
        # (rep 1's throughput must not contradict rep 2's min)
        if "spatial_join" in best["queries"]:
            best["pages_per_sec_spatial_join"] = round(
                best["n_pages"] / best["queries"]["spatial_join"], 1)
        results[cpus] = best

    lo, hi = results[args.cores_low], results[args.cores_high]
    factor = args.cores_high / args.cores_low
    eff = {
        q: round((lo["queries"][q] / hi["queries"][q]) / factor, 3)
        for q in lo["queries"]
    }
    eff_total = round((lo["value"] / hi["value"]) / factor, 3)
    n_pages = hi["n_pages"]
    summary = {
        "metric": "scaling_efficiency",
        "cores": [args.cores_low, args.cores_high],
        "value": eff_total,
        "per_query": eff,
        "seconds": {str(c): results[c]["value"] for c in results},
        "pages_per_sec_spatial_join": {
            str(c): round(n_pages / results[c]["queries"]["spatial_join"], 1)
            for c in results} if "spatial_join" in lo["queries"] else None,
        "n_pages": n_pages,
        "sf": hi["sf"],
    }
    print(json.dumps(summary))

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    spsj = summary["pages_per_sec_spatial_join"] or {}
    qrows = "\n".join(
        f"| {q} | {lo['queries'][q]:.2f} | {hi['queries'][q]:.2f} | {eff[q]:.2f} |"
        for q in lo["queries"]
    )
    (bench_dir / "BASELINE.md").write_text(f"""# Scaling evidence — N vs 4N parallelism

Protocol (BASELINE.md / north rule): same benchmark job, same input
({n_pages:,} synthetic Common-Crawl-style pages, polygon layer of
{os.environ.get('SPARK_GRAFT_POLYS', '1500')}+8 features (5 hot city
cells, {os.environ.get('SPARK_GRAFT_KNN_FEATS', '256')} kNN features),
run in separate processes at local[{args.cores_low}] and
local[{args.cores_high}] — the sandbox stand-in for N and 4N executors.
Levels interleaved, per-query MINIMUM over {args.reps} reps per level
(this host has minutes-long co-tenant noise windows — see
BENCH/ANALYSIS.md for the full noise/bandwidth analysis and a
controlled quiet-window measurement; python-worker warm-up excluded by
an untimed pass).

efficiency = (T_{args.cores_low} / T_{args.cores_high}) / {factor:.0f}

| query | local[{args.cores_low}] s | local[{args.cores_high}] s | efficiency |
|---|---|---|---|
{qrows}
| **total** | **{lo['value']:.2f}** | **{hi['value']:.2f}** | **{eff_total:.2f}** |

Spatial-join throughput: {spsj.get(str(args.cores_low), 'n/a')} pages/s
at local[{args.cores_low}] -> {spsj.get(str(args.cores_high), 'n/a')}
pages/s at local[{args.cores_high}].

Generated by tools/scaling.py on {time.strftime('%Y-%m-%d %H:%M:%S')}.
Raw JSON: see BENCH/scaling.json.
""")
    (bench_dir / "scaling.json").write_text(json.dumps(
        {"summary": summary, "runs": {str(c): results[c] for c in results}},
        indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
