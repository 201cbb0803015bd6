"""G19 coastline closure: ±180° snap, Antarctica cap, chaining."""

from __future__ import annotations

import numpy as np
import pytest

from osm_spark.operators import coastline as CL


def ring_set(rings):
    return sorted((len(lo), int(lo[0]), int(la[0])) for lo, la in rings)


def test_closed_passthrough():
    lo = np.array([0, 10, 10, 0, 0], np.int64)
    la = np.array([0, 0, 10, 10, 0], np.int64)
    rings = CL.build_rings([(lo, la)])
    assert len(rings) == 1
    assert np.array_equal(rings[0][0], lo)


def test_west_antimeridian_snap_and_close():
    # two chained segments, both chain endpoints within 1e-4° of -180°
    a = (np.array([-1_799_999_500, -1_790_000_000], np.int64),
         np.array([100, 200], np.int64))
    b = (np.array([-1_790_000_000, -1_799_999_300], np.int64),
         np.array([200, 300], np.int64))
    rings = CL.build_rings([a, b])
    assert len(rings) == 1
    lo, la = rings[0]
    assert lo[0] == -CL.LON_180 and lo[-1] == -CL.LON_180
    assert la[0] == la[-1]              # explicitly closed
    assert len(lo) == 4                 # 3 chained vertices + closure


def test_antarctica_cap():
    lo = np.array([-CL.LON_180, -500_000_000, 500_000_000, CL.LON_180], np.int64)
    la = np.array([-700_000_000, -710_000_000, -705_000_000, -700_000_000], np.int64)
    rings = CL.build_rings([(lo, la)])
    assert len(rings) == 1
    ro, ra = rings[0]
    # reference cap: ... (+180, +85), (-180, +85), back to start
    assert ro[-3] == CL.LON_180 and ra[-3] == CL.CAP_LAT
    assert ro[-2] == -CL.LON_180 and ra[-2] == CL.CAP_LAT
    assert ro[-1] == ro[0] and ra[-1] == ra[0]


def test_antarctica_cap_reversed_orientation():
    """A +180 -> -180 chain closes to the identical ring as the
    canonical orientation (reversed first, then capped)."""
    lo = np.array([CL.LON_180, 500_000_000, -500_000_000, -CL.LON_180], np.int64)
    la = np.array([-700_000_000, -705_000_000, -710_000_000, -700_000_000], np.int64)
    rings = CL.build_rings([(lo, la)])
    assert len(rings) == 1
    ro, ra = rings[0]
    assert ro[-3] == CL.LON_180 and ra[-3] == CL.CAP_LAT
    assert ro[-2] == -CL.LON_180 and ra[-2] == CL.CAP_LAT
    assert ro[-1] == ro[0] and ra[-1] == ra[0]
    assert ro[0] == -CL.LON_180            # canonical start after reversal


def test_circular_chain_closes():
    a = (np.array([0, 100], np.int64), np.array([0, 0], np.int64))
    b = (np.array([100, 100], np.int64), np.array([0, 100], np.int64))
    c = (np.array([100, 0], np.int64), np.array([100, 0], np.int64))
    rings = CL.build_rings([a, b, c])
    assert len(rings) == 1
    lo, la = rings[0]
    assert lo[0] == lo[-1] and la[0] == la[-1]
    assert len(lo) == 4                 # 3 distinct vertices + closure


def test_unclosable_raises():
    with pytest.raises(ValueError):
        CL.build_rings([(np.array([0, 1000], np.int64),
                         np.array([0, 1000], np.int64))])


def test_spark_surface(spark):
    rows = [
        (1, [0, 0, 10, 10, 0], [0, 10, 10, 0, 0]),                       # closed
        (2, [-700_000_000, -700_000_000], [-CL.LON_180, CL.LON_180]),    # antarctica
        (3, [100, 200], [-1_799_999_500, -1_790_000_000]),
        (4, [200, 300], [-1_790_000_000, -1_799_999_100]),
    ]
    segs = spark.createDataFrame(
        rows, "seg_id long, lats array<long>, lons array<long>")
    out = CL.assemble_coastline(segs).collect()
    assert len(out) == 3
    for r in out:
        assert r.lats[0] == r.lats[-1] and r.lons[0] == r.lons[-1]
