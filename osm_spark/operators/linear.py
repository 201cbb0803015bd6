"""Linear-feature (polyline) tiling — reference osm/linear.ml parity.

The reference routes roads/waterways into per-zoom R-trees with
category-based zoom filters (large_1/2/3 selections,
/root/reference/osm/linear.ml:437-464, 588-600) and Douglas-Peucker
simplification at the band ratio (linear.ml:513-514 uses a /50 scale of
the surfaces ratio).  Here: one mapInPandas pass over the way table →
(way_id, category, z, covering tile span), exploded to a (z, x, y) tile
table JVM-side.  Clipping features at tile borders uses the G13 kernel
(kernels.clip_polyline_halfplane).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo import kernels as K
from osm_spark.operators.tiles import ZOOM_BANDS, band_params

# category -> lowest zoom band that includes it; the analog of the
# reference's large_1/2/3 category filters (linear.ml:437-464):
# trunk categories render at every zoom, minor ones only when zoomed in.
CATEGORY_MIN_ZOOM = {0: 0, 1: 0, 2: 8, 3: 8, 4: 10, 5: 12, 6: 12}
DEFAULT_MIN_ZOOM = 12

LINE_TILE_SCHEMA = (
    "way_id long, category int, z int, "
    "x_min long, x_max long, y_min long, y_max long, n_pts long"
)


def _line_tiles_pandas(zooms: tuple[int, ...]):
    params = [(z, band_params(z)[1]) for z in zooms]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("way_id", "category", "z", "x_min",
                                   "x_max", "y_min", "y_max", "n_pts")}
            for wid, cat, lats, lons in zip(
                pdf["way_id"], pdf["category"], pdf["lats"], pdf["lons"]
            ):
                la = np.asarray(lats, np.int64)
                lo = np.asarray(lons, np.int64)
                if len(la) < 2:       # degenerate way: no line, and DP
                    continue          # would crash on an empty array
                min_z = CATEGORY_MIN_ZOOM.get(int(cat), DEFAULT_MIN_ZOOM)
                for z, ratio in params:
                    if z < min_z:
                        continue
                    keep = K.douglas_peucker_int(ratio, lo, la)
                    sla, slo = la[keep], lo[keep]
                    if len(sla) < 2:
                        continue
                    # clamp to the valid tile range: mercator y diverges
                    # at the poles (lat -90 -> row 26836 at z=12) and
                    # lon=+180 gives x=2^z — without the clamp the
                    # explode downstream fabricates thousands of
                    # nonexistent tiles per way
                    n = (1 << z) - 1
                    out["way_id"].append(wid)
                    out["category"].append(cat)
                    out["z"].append(z)
                    out["x_min"].append(min(max(int(K.tile_x(slo.min(), z)), 0), n))
                    out["x_max"].append(min(max(int(K.tile_x(slo.max(), z)), 0), n))
                    out["y_min"].append(min(max(int(K.tile_y_float(sla.max(), z)), 0), n))
                    out["y_max"].append(min(max(int(K.tile_y_float(sla.min(), z)), 0), n))
                    out["n_pts"].append(len(sla))
            yield pd.DataFrame(out)

    return fn


def linear_tile_spans(lines: DataFrame,
                      zooms: tuple[int, ...] = ZOOM_BANDS) -> DataFrame:
    """lines(way_id, category, lats, lons) -> per-(way, zoom) covering
    tile span after category filter + DP simplification."""
    return lines.select("way_id", "category", "lats", "lons").mapInPandas(
        _line_tiles_pandas(tuple(zooms)), LINE_TILE_SCHEMA)


def linear_tiles(lines: DataFrame,
                 zooms: tuple[int, ...] = ZOOM_BANDS) -> DataFrame:
    """Exploded (way_id, category, z, x, y) tile assignment table."""
    spans = linear_tile_spans(lines, zooms)
    return (
        spans.withColumn("x", F.explode(F.sequence("x_min", "x_max")))
        .withColumn("y", F.explode(F.sequence("y_min", "y_max")))
        .select("way_id", "category", "z", "x", "y")
    )


CLIP_SCHEMA = ("way_id long, category int, side int, piece int, "
               "lats array<long>, lons array<long>")


def clip_lines_at(lines: DataFrame, lon0: int) -> DataFrame:
    """Split every polyline at the vertical line lon=lon0 (G13 kernel);
    side 0 = west (lon<=lon0), 1 = east.  The coastline-subdivision
    primitive (/root/reference/osm/clipping.ml:149-169)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("way_id", "category", "side", "piece",
                                   "lats", "lons")}
            for wid, cat, lats, lons in zip(
                pdf["way_id"], pdf["category"], pdf["lats"], pdf["lons"]
            ):
                la = np.asarray(lats, np.int64)
                lo = np.asarray(lons, np.int64)
                for side, keep_left in ((0, True), (1, False)):
                    for k, (plo, pla) in enumerate(
                        K.clip_polyline_halfplane(lon0, keep_left, lo, la)
                    ):
                        out["way_id"].append(wid)
                        out["category"].append(cat)
                        out["side"].append(side)
                        out["piece"].append(k)
                        out["lats"].append(pla.tolist())
                        out["lons"].append(plo.tolist())
            yield pd.DataFrame(out)

    return lines.select("way_id", "category", "lats", "lons").mapInPandas(
        fn, CLIP_SCHEMA)
