"""WARC-source decode throughput at two parallelism levels.

Same protocol as tools/scaling.py (north-rule evidence): the identical
job — cdx index scan + parallel span-read gzip-member decode + JVM
html→text + aggregate — run as a SEPARATE PROCESS per (level, rep),
levels interleaved so a co-tenant noise window cannot inflate one level
only, per-level MINIMUM across reps, an untimed warm-up pass inside
each process.  Raw JSON → BENCH/warcbench.json, one JSON line printed.

Usage: python tools/warcbench.py [n_pages] [reps]
       python tools/warcbench.py --child <cores> <path>   (internal)
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


def child(cores: int, path: str) -> None:
    from pyspark.sql import functions as F

    from osm_spark.operators import textops as TX
    from osm_spark.session import get_spark
    from osm_spark.sources import warc

    spark = get_spark(f"warcbench{cores}", cores=cores,
                      shuffle_partitions=cores)

    def job() -> float:
        t0 = time.perf_counter()
        pages = warc.read_warc_pages(spark, path)
        out = pages.select(
            F.length(TX.extract_text_col(F.col("html"))).alias("n"))
        out.agg(F.sum("n"), F.count("*")).collect()
        return time.perf_counter() - t0

    job()                                    # untimed warm-up
    print(json.dumps({"sec": job()}))
    spark.stop()


def run_child(cores: int, path: str) -> float:
    out = subprocess.run(
        [sys.executable, __file__, "--child", str(cores), path],
        capture_output=True, text=True, timeout=900, cwd=str(REPO))
    line = [x for x in out.stdout.splitlines() if x.startswith("{")][-1]
    return json.loads(line)["sec"]


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from osm_spark.sources import warc_fixture

    path = REPO / "data" / f"warcbench_{n_pages}.warc.gz"
    if not path.exists():
        warc_fixture.write_scaled(str(path), n_pages)

    best: dict[int, float] = {}
    for rep in range(reps):
        for cores in LEVELS:                 # interleaved levels
            t = run_child(cores, str(path))
            best[cores] = min(best.get(cores, float("inf")), t)
            print(f"rep {rep} local[{cores}]: {t:.3f} s", file=sys.stderr)
    lo, hi = LEVELS
    eff = (best[lo] / best[hi]) / (hi / lo)
    result = {
        "n_pages": n_pages, "reps": reps,
        f"local{lo}_sec": round(best[lo], 3),
        f"local{hi}_sec": round(best[hi], 3),
        f"pages_per_sec_local{lo}": round(n_pages / best[lo], 1),
        f"pages_per_sec_local{hi}": round(n_pages / best[hi], 1),
        f"scaling_efficiency_{lo}_to_{hi}": round(eff, 3),
    }
    (REPO / "BENCH" / "warcbench.json").write_text(json.dumps(result))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
        raise SystemExit(0)
    raise SystemExit(main())
