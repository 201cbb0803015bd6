"""Generate golden result tables for the fixture-driven queries whose
algorithms are iterative/geometric and not directly SQL-expressible
(g12_dp, g13_clip, l_linear_tiles, g20_mp_assembly, x5_ch_shortcuts).

All five queries read ONLY deterministic in-repo fixtures (no sf tables),
so their outputs are scale-factor-independent constants; the driver's
DuckDB oracle can therefore be a literal VALUES table.  This script

1. runs each query once and records (columns, dtypes, rows) to
   ``data/goldens/<name>.json``;
2. cross-checks each result against an INDEPENDENT scalar
   re-computation / invariant suite (recursive-definition DP, pure-dict
   Dijkstra distance preservation for CH, ring-closure + orientation for
   multipolygons, on-the-line endpoints for clip, in-bounds monotone
   spans for linear tiles) so the golden is not a self-fulfilling copy.

Re-run after any semantic change to the underlying kernels:
    python tools/make_goldens.py
"""

from __future__ import annotations

import heapq
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "data" / "goldens"


# ---------------------------------------------------------------------------
# independent scalar re-computations


def scalar_dp_keep_count(eps: int, xs, ys) -> int:
    """Recursive-definition integer Douglas-Peucker (independent of the
    vectorized stack kernel in osm_spark.geo.kernels): count kept
    vertices under the reference's exact arithmetic rules
    (douglas_peucker.ml:73-127)."""
    import math

    def dist2_to_seg(px, py, ax, ay, bx, by):
        dx, dy = bx - ax, by - ay
        d2 = dx * dx + dy * dy
        nx, ny = px - ax, py - ay
        t = nx * dx + ny * dy
        if d2 == 0 or t <= 0:
            return nx * nx + ny * ny
        if t >= d2:
            ex, ey = px - bx, py - by
            return ex * ex + ey * ey
        cross = nx * dy - ny * dx
        return math.trunc(float(cross) * float(cross) / float(d2))

    n = len(xs)
    if n <= 2:
        return n
    keep = [False] * n
    keep[0] = keep[-1] = True

    def rec(i, j):
        if j <= i + 1:
            return
        best, bd = -1, eps * eps
        for k in range(i + 1, j):
            d = dist2_to_seg(xs[k], ys[k], xs[i], ys[i], xs[j], ys[j])
            if d > bd:
                best, bd = k, d
        if best >= 0:
            keep[best] = True
            rec(i, best)
            rec(best, j)

    rec(0, n - 1)
    return sum(keep)


def dijkstra(adj: dict, src) -> dict:
    dist = {src: 0.0}
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


# ---------------------------------------------------------------------------


def record(name: str, sdf, checks) -> None:
    pdf = sdf.toPandas()
    cols = list(pdf.columns)
    dtypes = []
    for c in cols:
        k = str(pdf[c].dtype)
        if k.startswith(("int", "uint")):
            dtypes.append("BIGINT")
        elif k.startswith("float"):
            dtypes.append("DOUBLE")
        elif k == "bool":
            dtypes.append("BOOLEAN")
        else:
            dtypes.append("VARCHAR")
    rows = [
        [None if (v is None or (isinstance(v, float) and np.isnan(v)))
         else (bool(v) if isinstance(v, (bool, np.bool_))
               else int(v) if isinstance(v, (int, np.integer))
               else float(v) if isinstance(v, (float, np.floating))
               else str(v))
         for v in r]
        for r in pdf.itertuples(index=False)
    ]
    checks(pdf)
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    out = GOLDEN_DIR / f"{name}.json"
    out.write_text(json.dumps({"columns": cols, "types": dtypes, "rows": rows}))
    print(f"wrote {out} ({len(rows)} rows)")


def main() -> int:
    import __spark_entry__ as entry
    from osm_spark import fixtures as FX
    from osm_spark.operators import routing as RT
    from osm_spark.operators import tiles as T
    from osm_spark.session import get_spark

    spark = get_spark("make-goldens", cores=8, shuffle_partitions=8)
    sf = "/root/testdata/sf0.01"  # unused by these queries (fixture-only)
    qs = entry.queries()

    # --- g12_dp: independent recursive DP count per feature -------------
    def check_dp(pdf):
        ratio = T.band_params(10)[1]
        got = {int(r.feature_id): (int(r.n_in), int(r.n_kept))
               for r in pdf.itertuples()}
        for p in FX.city_polygons():
            n_in = n_kept = 0
            for ring in p["rings"]:
                xs, ys = list(ring["lon"]), list(ring["lat"])
                n_in += len(xs)
                n_kept += scalar_dp_keep_count(ratio, xs, ys)
            assert got[p["feature_id"]] == (n_in, n_kept), (
                p["feature_id"], got[p["feature_id"]], (n_in, n_kept))
        print("  g12_dp: independent recursive DP agrees")

    record("g12_dp", qs["g12_dp"](spark, sf), check_dp)

    # --- g13_clip: endpoint invariants ----------------------------------
    def check_clip(pdf):
        cut = FX.LON0 + FX.SPAN // 2
        for r in pdf.itertuples():
            # every piece lies strictly on one side; interior cut points
            # land exactly on the clip line
            if r.side == 0:
                assert r.lon_first <= cut and r.lon_last <= cut
            else:
                assert r.lon_first >= cut and r.lon_last >= cut
            assert r.n_pts >= 2
        print("  g13_clip: side/endpoint invariants hold")

    record("g13_clip", qs["g13_clip"](spark, sf), check_clip)

    # --- l_linear_tiles: bounds + coverage ------------------------------
    def check_lt(pdf):
        for z in pdf["z"].unique():
            sub = pdf[pdf.z == z]
            assert (sub.x >= 0).all() and (sub.x < 2 ** z).all()
            assert (sub.y >= 0).all() and (sub.y < 2 ** z).all()
        assert not pdf.duplicated(["way_id", "z", "x", "y"]).any()
        print("  l_linear_tiles: tile-range invariants hold")

    record("l_linear_tiles", qs["l_linear_tiles"](spark, sf), check_lt)

    # --- g20_mp_assembly: closure + parenting invariants ----------------
    def check_mp(pdf):
        assert (pdf.n_pts >= 4).all()  # closed rings repeat first point
        outers = pdf[pdf.role == 0]
        inners = pdf[pdf.role == 1]
        assert len(outers) > 0
        for r in inners.itertuples():
            assert r.parent in set(outers[outers.relation == r.relation].ring_idx)
        print("  g20_mp_assembly: closure/parenting invariants hold")

    record("g20_mp_assembly", qs["g20_mp_assembly"](spark, sf), check_mp)

    # --- x5_ch_shortcuts: CH graph preserves Dijkstra distances ---------
    def check_ch(pdf):
        nodes_df, refs = FX.road_network_dfs(spark, grid=6)
        base = RT.extract_edges(refs, nodes_df).select(
            "src", "dst", "weight").collect()
        adj = {}
        for r in base:
            adj.setdefault(r.src, []).append((r.dst, r.weight))
        aug = {}
        for r in pdf.itertuples():
            aug.setdefault(int(r.src), []).append((int(r.dst), float(r.weight_r)))
        srcs = sorted(adj)[:6]
        for s in srcs:
            d0 = dijkstra(adj, s)
            d1 = dijkstra(aug, s)
            for k, v in d0.items():
                assert abs(d1.get(k, float("inf")) - v) < 1e-4, (s, k, v, d1.get(k))
        print("  x5_ch_shortcuts: pure-python Dijkstra distances preserved")

    record("x5_ch_shortcuts", qs["x5_ch_shortcuts"](spark, sf), check_ch)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
