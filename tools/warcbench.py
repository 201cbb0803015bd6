"""WARC-source decode throughput at two parallelism levels.

Same protocol as tools/scaling.py (north-rule evidence): the identical
job run as a SEPARATE PROCESS per (level, rep, mode), levels
interleaved so a co-tenant noise window cannot inflate one level only,
per-level MINIMUM across reps, an untimed warm-up pass inside each
process.  Raw JSON → BENCH/warcbench.json, one JSON line printed.

Two chain modes, both cdx index scan + parallel span-read gzip-member
decode + text + aggregate:

- ``full``: decode emits html binary through Arrow, html→text runs
  JVM-side (read_warc_pages + extract_text_col) — the byte-identity
  pipeline shape;
- ``text``: decode extracts text INSIDE the mapper (extract_text_py)
  and never ships html through Arrow (read_warc_pages_text) — the
  projection a text-only pipeline should use; about half the Arrow
  transfer, which is what limited chain scaling in round 3
  (BENCH/warcbench.json history: 0.5-0.6 at 2→8 vs 0.83-0.90 for the
  pure decode kernel).

Usage: python tools/warcbench.py [n_pages] [reps] [levels e.g. 2,8]
       python tools/warcbench.py --child <cores> <mode> <path>  (internal)
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

LEVELS = (2, 8)
MODES = ("full", "text")


def child(cores: int, mode: str, path: str) -> None:
    from pyspark.sql import functions as F

    from osm_spark.operators import textops as TX
    from osm_spark.session import get_spark
    from osm_spark.sources import warc

    spark = get_spark(f"warcbench{cores}", cores=cores,
                      shuffle_partitions=cores)

    def job() -> float:
        t0 = time.perf_counter()
        if mode == "text":
            pages = warc.read_warc_pages_text(spark, path)
            out = pages.select(F.length("text").alias("n"))
        else:
            pages = warc.read_warc_pages(spark, path)
            out = pages.select(
                F.length(TX.extract_text_col(F.col("html"))).alias("n"))
        out.agg(F.sum("n"), F.count("*")).collect()
        return time.perf_counter() - t0

    job()                                    # untimed warm-up
    print(json.dumps({"sec": job()}))
    spark.stop()


def run_child(cores: int, mode: str, path: str) -> float:
    out = subprocess.run(
        [sys.executable, __file__, "--child", str(cores), mode, path],
        capture_output=True, text=True, timeout=900, cwd=str(REPO))
    lines = [x for x in out.stdout.splitlines() if x.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(f"warcbench child failed rc={out.returncode}: "
                           f"{out.stderr[-1500:]}")
    return json.loads(lines[-1])["sec"]


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    levels = (tuple(int(x) for x in sys.argv[3].split(","))
              if len(sys.argv) > 3 else LEVELS)
    if len(levels) != 2 or levels[0] >= levels[1]:
        # validate BEFORE any child runs — a bad pair would otherwise
        # crash at the final unpack after minutes of benchmarking
        raise SystemExit(f"levels must be 'low,high' with low < high, "
                         f"got {sys.argv[3]!r}")

    from osm_spark.sources import warc_fixture

    path = REPO / "data" / f"warcbench_{n_pages}.warc.gz"
    if not path.exists():
        warc_fixture.write_scaled(str(path), n_pages)

    best: dict[tuple, float] = {}
    for rep in range(reps):
        for mode in MODES:
            for cores in levels:             # interleaved levels
                t = run_child(cores, mode, str(path))
                k = (mode, cores)
                best[k] = min(best.get(k, float("inf")), t)
                print(f"rep {rep} {mode} local[{cores}]: {t:.3f} s",
                      file=sys.stderr)
    lo, hi = levels
    result: dict = {"n_pages": n_pages, "reps": reps,
                    "levels": list(levels)}
    for mode in MODES:
        eff = (best[(mode, lo)] / best[(mode, hi)]) / (hi / lo)
        result[mode] = {
            f"local{lo}_sec": round(best[(mode, lo)], 3),
            f"local{hi}_sec": round(best[(mode, hi)], 3),
            f"pages_per_sec_local{lo}": round(n_pages / best[(mode, lo)], 1),
            f"pages_per_sec_local{hi}": round(n_pages / best[(mode, hi)], 1),
            f"scaling_efficiency_{lo}_to_{hi}": round(eff, 3),
        }
    import time as _t
    runs = REPO / "BENCH" / "warcbench_runs"
    runs.mkdir(parents=True, exist_ok=True)
    (runs / (_t.strftime("%Y%m%dT%H%M%S") + ".json")).write_text(
        json.dumps(result, indent=2))
    (REPO / "BENCH" / "warcbench.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        raise SystemExit(0)
    raise SystemExit(main())
