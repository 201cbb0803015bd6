"""Deterministic shapefile fixture for the S3 driver query: coastline
segments (antimeridian pieces, an Antarctica chain, closed rings)."""

from __future__ import annotations

from osm_spark.sources import shapefile as SHP


def sample_shapes():
    """[(shape_type, [part, ...])] with parts in (lon_deg, lat_deg)."""
    west_a = [(-179.99995, 10.0 + i * 0.01) for i in range(5)]
    west_b = [west_a[-1]] + [(-179.5 - i * 0.05, 10.1 + i * 0.01)
                             for i in range(4)]
    west_b.append((-179.99992, 10.2))
    antarctica = [(-180.0, -70.0), (-90.0, -71.0), (0.0, -70.5),
                  (90.0, -71.2), (180.0, -70.0)]
    square = [(5.0, 5.0), (5.0, 6.0), (6.0, 6.0), (6.0, 5.0), (5.0, 5.0)]
    two_part = [
        [(20.0, 20.0), (20.0, 21.0), (21.0, 21.0), (20.0, 20.0)],
        [(30.0, 30.0), (30.0, 31.0), (31.0, 31.0), (30.0, 30.0)],
    ]
    return [
        (SHP.POLYLINE, [west_a]),
        (SHP.POLYLINE, [west_b]),
        (SHP.POLYLINE, [antarctica]),
        (SHP.POLYGON, [square]),
        (SHP.POLYGON, two_part),
    ]


def write_sample_shp(path: str) -> None:
    SHP.write_shp(path, sample_shapes())


def expected_rings():
    """Ground-truth rings: fixed-point conversion of the shapes run
    through the pure-python ring builder (no file, no Spark) in the
    same seg order the Spark query sorts to."""
    import numpy as np

    from osm_spark.operators import coastline as CL

    segs = []
    for num, (_, parts) in enumerate(sample_shapes(), start=1):
        for p_idx, part in enumerate(parts):
            lo = np.rint(np.array([x for x, _ in part]) * SHP.FIXED).astype(np.int64)
            la = np.rint(np.array([y for _, y in part]) * SHP.FIXED).astype(np.int64)
            segs.append((num * 100 + p_idx, lo, la))
    segs.sort(key=lambda t: t[0])
    rings = CL.build_rings([(lo, la) for _, lo, la in segs])
    return [(i, len(lo), int(la[0]), int(lo[0]))
            for i, (lo, la) in enumerate(rings)]
