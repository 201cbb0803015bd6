"""WARC-source decode throughput at two parallelism levels.

Same protocol as tools/scaling.py (north-rule evidence): the identical
job — index + parallel gzip-member decode + JVM html→text + count —
run in separate Spark sessions at local[2] and local[8], per-level
MINIMUM over N interleaved reps (host co-tenant noise robustness), an
untimed warm-up pass per level.  Prints one JSON line and appends the
table to BENCH/ANALYSIS.md is left to the caller; raw JSON is written
to BENCH/warcbench.json.

Usage: python tools/warcbench.py [n_pages] [reps]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_level(cores: int, path: str, reps: int) -> float:
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
    best = min(job() for _ in range(reps))
    spark.stop()
    return best


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from osm_spark.sources import warc_fixture

    path = REPO / "data" / f"warcbench_{n_pages}.warc.gz"
    if not path.exists():
        warc_fixture.write_scaled(str(path), n_pages)

    t2 = run_level(2, str(path), reps)
    t8 = run_level(8, str(path), reps)
    eff = (t2 / t8) / 4
    result = {
        "n_pages": n_pages, "reps": reps,
        "local2_sec": round(t2, 3), "local8_sec": round(t8, 3),
        "pages_per_sec_local2": round(n_pages / t2, 1),
        "pages_per_sec_local8": round(n_pages / t8, 1),
        "scaling_efficiency_2_to_8": round(eff, 3),
    }
    (REPO / "BENCH" / "warcbench.json").write_text(json.dumps(result))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
