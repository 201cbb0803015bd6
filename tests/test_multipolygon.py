"""Multipolygon assembly golden tests (SURVEY.md §5.2c): per-relation
assembled polygon groups must reproduce the fixture rings exactly —
same vertex cycles, outer/hole classification, and orientation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_spark import fixtures as FX
from osm_spark.operators import multipolygon as MP


def _canon(la, lo):
    """Canonical form of a closed ring: drop closing dup, rotate to the
    lexicographically smallest vertex (orientation preserved)."""
    la, lo = list(la[:-1]), list(lo[:-1])
    k = min(range(len(la)), key=lambda i: (la[i], lo[i]))
    return tuple(la[k:] + la[:k]), tuple(lo[k:] + lo[:k])


@pytest.fixture(scope="module")
def assembled(spark):
    members_df, refs_df, nodes_df = FX.relation_tables_dfs(spark)
    m = MP.gather_members(members_df, refs_df, nodes_df)
    return MP.assemble_multipolygons(m).collect()


def test_rings_reconstructed_exactly(assembled):
    got = {}
    for r in assembled:
        assert r.valid
        got.setdefault(r.relation, []).append(r)
    want = {p["feature_id"]: p for p in FX.city_polygons()}
    assert set(got) == set(want)
    for rel, rows in got.items():
        rings = want[rel]["rings"]
        assert len(rows) == len(rings)
        want_canon = {
            (r["role"], *_canon(r["lat"], r["lon"])) for r in rings
        }
        got_canon = {(r.role, *_canon(r.lats, r.lons)) for r in rows}
        assert got_canon == want_canon, rel


def test_hole_parenting(assembled):
    # city 2 has one hole; its parent must be the outer ring
    rows = [r for r in assembled if r.relation == 2]
    outers = [r for r in rows if r.role == 0]
    holes = [r for r in rows if r.role == 1]
    assert len(outers) == 1 and len(holes) == 1
    assert holes[0].parent == outers[0].ring_idx


def test_orientation_normalized(assembled):
    from osm_spark.geo import kernels as K

    for r in assembled:
        area = K.polygon_area(np.asarray(r.lons), np.asarray(r.lats))
        assert (area > 0) if r.role == 0 else (area < 0), (r.relation, r.ring_idx)


def test_open_chain_rejected(spark):
    members_df, refs_df, nodes_df = FX.relation_tables_dfs(spark)
    # drop one way entirely -> its ring cannot close
    drop = members_df.limit(1).select("way")
    members_broken = members_df.join(drop, "way", "left_anti")
    m = MP.gather_members(members_broken, refs_df, nodes_df)
    out = MP.assemble_multipolygons(m)
    bad = out.filter(~F.col("valid")).collect()
    assert len(bad) == 1 and bad[0].ring_idx == -1


def test_polygon_tags(spark):
    rel_tags = spark.createDataFrame(
        [(1, "type", "multipolygon"), (1, "name", "rel-name")],
        "relation long, key string, val string")
    way_tags = spark.createDataFrame(
        [(10, "landuse", "forest"), (11, "landuse", "forest"),
         (10, "name", "way-name"), (11, "name", "way-name"),
         (10, "surface", "dirt")],
        "way long, key string, val string")
    outer = spark.createDataFrame(
        [(1, 10), (1, 11)], "relation long, way long")
    got = {(r.key, r.val) for r in
           MP.polygon_tags(rel_tags, way_tags, outer).collect()}
    # relation tags win (name), landuse common to all outer ways kept,
    # surface only on one way dropped
    assert got == {("type", "multipolygon"), ("name", "rel-name"),
                   ("landuse", "forest")}


def test_touching_hole_shared_vertex(spark):
    """A hole sharing a vertex with its outer ring (common in real OSM)
    must still classify as role=1 with the outer as parent — the
    containment probe has to skip boundary vertices."""
    import osm_spark.operators.multipolygon as MP

    S = 1_000_000
    outer = ([0, 0, 10 * S, 10 * S, 0], [0, 10 * S, 10 * S, 0, 0])
    hole = ([0, 1 * S, 2 * S, 0], [0, 2 * S, 1 * S, 0])  # vertex (0,0) shared
    members = spark.createDataFrame(
        [(5, 1, "outer", outer[0], outer[1]),
         (5, 2, "inner", hole[0], hole[1])],
        "relation long, way long, role string, lats array<long>, lons array<long>",
    )
    out = {r.ring_idx: r for r in
           MP.assemble_multipolygons(members).collect()}
    roles = sorted((r.role, r.parent) for r in out.values())
    assert roles == [(0, -1), (1, [k for k, v in out.items() if v.role == 0][0])]


# ------------------------------------------------- review regressions

def _assemble_raw(spark, members, refs, nodes):
    m = MP.gather_members(
        spark.createDataFrame(members, "relation long, way long, role string"),
        spark.createDataFrame(refs, "way long, seq int, node long"),
        spark.createDataFrame(nodes, "node long, lat long, lon long"))
    return MP.assemble_multipolygons(m).collect()


def test_missing_member_way_invalidates(spark):
    """A relation whose member way is absent from way_refs must come
    out valid=False, not as a polygon silently missing its hole."""
    sq = [(1, i, n) for i, n in enumerate([10, 11, 12, 13, 10])]
    rows = _assemble_raw(
        spark,
        [(5, 1, "outer"), (5, 2, "inner")],      # way 2 has no refs
        sq,
        [(10, 0, 0), (11, 0, 10**6), (12, 10**6, 10**6), (13, 10**6, 0)])
    assert len(rows) == 1 and rows[0].valid is False


def test_missing_node_invalidates(spark):
    """A way with one node absent from the nodes table must invalidate
    the relation instead of emitting a vertex-skipped ring."""
    sq = [(1, i, n) for i, n in enumerate([10, 11, 12, 13, 10])]
    rows = _assemble_raw(
        spark, [(5, 1, "outer")], sq,
        [(10, 0, 0), (11, 0, 10**6), (13, 10**6, 0)])   # node 12 missing
    assert len(rows) == 1 and rows[0].valid is False


def test_degenerate_two_vertex_ring_invalid(spark):
    """[A,A] and the pair [A,B]+[B,A] chain into zero-area 'rings' and
    must be rejected."""
    rows = _assemble_raw(
        spark, [(5, 1, "outer")],
        [(1, 0, 10), (1, 1, 10)],
        [(10, 0, 0)])
    assert len(rows) == 1 and rows[0].valid is False
    rows2 = _assemble_raw(
        spark, [(6, 1, "outer"), (6, 2, "outer")],
        [(1, 0, 10), (1, 1, 11), (2, 0, 11), (2, 1, 10)],
        [(10, 0, 0), (11, 0, 10**6)])
    assert len(rows2) == 1 and rows2[0].valid is False
