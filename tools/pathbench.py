"""Compare the two spatial-join physical paths (broadcast index vs
salted cell-cogroup) on the same inputs — evidence for the auto-switch
(PLANS.md): the cogroup path must stay within ~2x of broadcast at a
layer size where both are viable.

Usage: python tools/pathbench.py [--pages 2000000] [--polys 20000]
       [--cores 8] [--salt 8] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--polys", type=int, default=20_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--salt", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from osm_spark import fixtures as FX
    from osm_spark.operators.geocode import geocode_pages
    from osm_spark.operators.spatial_join import (broadcast_polygon_index,
                                                 spatial_join)
    from osm_spark.session import get_spark

    spark = get_spark("pathbench", cores=args.cores,
                      shuffle_partitions=args.cores * 2)
    base = Path(__file__).resolve().parent.parent / "data"
    pages_path = base / f"bench_pages_{args.pages}"
    if not (pages_path / "_SUCCESS").exists():
        FX.pages_df_distributed(spark, args.pages,
                                max(args.pages // 50_000, 8)).write.mode(
            "overwrite").parquet(str(pages_path))
    polys_path = base / f"bench_polys_{args.polys}"
    if not (polys_path / "_SUCCESS").exists():
        FX.polygons_df(spark, args.polys).repartition(64).write.mode(
            "overwrite").parquet(str(polys_path))
    geo = geocode_pages(spark.read.parquet(str(pages_path))).select(
        "page_id", "lat", "lon")
    polys = spark.read.parquet(str(polys_path))

    idx = broadcast_polygon_index(polys)
    spatial_join(geo.limit(2000), polys, index=idx).count()  # warm-up

    def t_broadcast():
        return spatial_join(geo, polys, index=idx).count()

    def t_cogroup():
        return spatial_join(geo, polys, broadcast_polys=False,
                            salt=args.salt).count()

    out = {}
    for name, fn in [("broadcast", t_broadcast), ("cogroup", t_cogroup)]:
        best, rows = float("inf"), None
        for _ in range(args.reps):
            t0 = time.time()
            rows = fn()
            best = min(best, time.time() - t0)
        out[name] = {"sec": round(best, 3), "rows": rows,
                     "pages_per_sec": round(args.pages / best)}
    out["ratio_cogroup_over_broadcast"] = round(
        out["cogroup"]["sec"] / out["broadcast"]["sec"], 2)
    out["match_sets_equal"] = out["cogroup"]["rows"] == out["broadcast"]["rows"]
    out.update(pages=args.pages, polys=args.polys, cores=args.cores,
               salt=args.salt)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
