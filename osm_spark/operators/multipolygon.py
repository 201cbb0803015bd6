"""Multipolygon / ring assembly (SURVEY.md §2.2 G19-G21).

Spark-first re-expression of /root/reference/osm/multipolygons.ml:
the heavy lifting (member resolution, way geometry gather) is plain
joins + grouped collects; the per-relation assembly — chaining ways
into closed rings by shared endpoints, rejecting nodes shared by ≠2
way-ends, orienting rings, and grouping outer/hole rings by containment
— runs in ``applyInPandas`` per relation (relations are small; the
parallelism axis is the number of relations, reference
multipolygons.ml:395-714).

Containment uses the reference's first-vertex-not-on-boundary rule
(geometry.ml:282-312) with ring-depth parity for outer/hole
classification; ring orientation is normalized outer-CCW / hole-CW by
signed area (surfaces.ml:749-764).  Tag computation: polygon tags =
relation tags plus the intersection of all outer-member way tags
(multipolygons.ml:636-676) — pure relational, see ``polygon_tags``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.geo import kernels as K


def gather_members(relation_members: DataFrame, way_refs: DataFrame,
                   nodes: DataFrame) -> DataFrame:
    """Join the normalized base tables into per-member way geometry.

    relation_members(relation, way, role) + way_refs(way, seq, node) +
    nodes(node, lat, lon) -> (relation, way, role, lats, lons) with
    vertex arrays in seq order.  Mirrors the join/sort/permute chain of
    multipolygons.ml:126-218 as three DataFrame ops.
    """
    way_geom = (
        # LEFT joins: a missing node or member way (clipped extract)
        # must surface as a NULL-geometry member so the assembler marks
        # the relation invalid — an inner join would silently skip the
        # vertex (or drop the hole) and emit wrong geometry as valid
        way_refs.join(nodes, "node", "left")
        .groupBy("way")
        .agg(
            F.sort_array(F.collect_list(F.struct("seq", "lat", "lon"))).alias("vs"),
            (F.count("*") > F.count("lat")).alias("incomplete"),
        )
        .select(
            "way",
            F.when(F.col("incomplete"), F.lit(None))
             .otherwise(F.col("vs.lat")).alias("lats"),
            F.when(F.col("incomplete"), F.lit(None))
             .otherwise(F.col("vs.lon")).alias("lons"),
        )
    )
    return relation_members.join(way_geom, "way", "left").select(
        "relation", "way", "role", "lats", "lons")


_ASM_SCHEMA = (
    "relation long, ring_idx int, role int, parent int, valid boolean, "
    "n_ways int, lats array<long>, lons array<long>"
)


def _ring_contains(la_a, lo_a, la_b, lo_b) -> bool:
    """Does ring a contain ring b?  Probe with b's first vertex NOT on
    a's boundary (points_in_ring is unspecified for boundary points);
    fall back to b's segment midpoints when rings share every vertex,
    as the reference does (geometry.ml polygon_in_polygon)."""
    for px, py in ((lo_b, la_b),
                   ((lo_b[:-1] + lo_b[1:]) // 2, (la_b[:-1] + la_b[1:]) // 2)):
        onb = K.points_on_ring_boundary(px, py, lo_a, la_a)
        off = np.nonzero(~onb)[0]
        if len(off):
            i = off[0]
            return bool(
                K.points_in_ring(px[i:i + 1], py[i:i + 1], lo_a, la_a)[0])
    return False


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Assemble one relation's member ways into oriented, classified
    rings.  Invalid relations (open chains, nodes shared by ≠2 way-ends,
    multipolygons.ml:425-441) emit a single valid=false row."""
    rel = int(pdf["relation"].iloc[0])
    if "way" in pdf.columns:    # deterministic ring numbering: group row
        pdf = pdf.sort_values("way")  # order from Spark is arbitrary

    def invalid():
        return pd.DataFrame(
            {"relation": [rel], "ring_idx": [-1], "role": [-1], "parent": [-1],
             "valid": [False], "n_ways": [len(pdf)], "lats": [[]], "lons": [[]]}
        )

    # endpoint chaining (multipolygons.ml:403-470): each way-end keyed by
    # its endpoint vertex; every endpoint must join exactly 2 way-ends.
    # Already-closed ways are complete rings and stay OUT of the chaining
    # graph — otherwise two rings touching at a shared vertex would count
    # 4 way-ends there and wrongly invalidate the relation.
    ways = []
    rings = []
    for lats, lons in zip(pdf["lats"], pdf["lons"]):
        if lats is None or lons is None:
            return invalid()    # missing member way or node (see
                                # gather_members) — incomplete relation
        la = np.asarray(lats, np.int64)
        lo = np.asarray(lons, np.int64)
        if len(la) < 2:
            return invalid()
        # a closed RING needs >= 4 points (triangle + repeat); a closed
        # 3-point way [A,B,A] is a zero-area spike and chains below to
        # an invalid short ring instead
        if len(la) >= 4 and la[0] == la[-1] and lo[0] == lo[-1]:
            rings.append((la, lo, 1))
        else:
            ways.append((la, lo))
    ends: dict[tuple[int, int], list[tuple[int, bool]]] = {}
    for i, (la, lo) in enumerate(ways):
        ends.setdefault((int(la[0]), int(lo[0])), []).append((i, False))
        ends.setdefault((int(la[-1]), int(lo[-1])), []).append((i, True))
    if any(len(v) != 2 for v in ends.values()):
        return invalid()

    used = [False] * len(ways)
    for start in range(len(ways)):
        if used[start]:
            continue
        chain_la, chain_lo = [], []
        i, rev = start, False
        n_ways_ring = 0
        while True:
            used[i] = True
            n_ways_ring += 1
            la, lo = ways[i]
            if rev:
                la, lo = la[::-1], lo[::-1]
            if chain_la:
                chain_la.append(la[1:])
                chain_lo.append(lo[1:])
            else:
                chain_la.append(la)
                chain_lo.append(lo)
            tail = (int(la[-1]), int(lo[-1]))
            nxt = [(j, at_end) for j, at_end in ends[tail] if not used[j]]
            if not nxt:
                break
            i, at_end = nxt[0]
            rev = at_end  # arriving at the way's end -> traverse reversed
        la = np.concatenate(chain_la)
        lo = np.concatenate(chain_lo)
        if la[0] != la[-1] or lo[0] != lo[-1] or len(la) < 4:
            return invalid()    # open chain, or a degenerate ring like
                                # [A,A] / [A,B,A] with zero area
        rings.append((la, lo, n_ways_ring))

    # containment depth by PIP of a NON-boundary probe point
    # (geometry.ml:282-312): points_in_ring is unspecified for points on
    # the boundary, so a probe vertex shared with the candidate ring
    # (touching rings — common in real OSM) must be skipped; fall back
    # to segment midpoints like the reference if every vertex touches
    n = len(rings)
    contains = np.zeros((n, n), dtype=bool)
    for a, (la_a, lo_a, _) in enumerate(rings):
        for b, (la_b, lo_b, _) in enumerate(rings):
            if a == b:
                continue
            contains[a, b] = _ring_contains(la_a, lo_a, la_b, lo_b)
    depth = contains.sum(axis=0)
    out = {"relation": [], "ring_idx": [], "role": [], "parent": [],
           "valid": [], "n_ways": [], "lats": [], "lons": []}
    for r, (la, lo, nw) in enumerate(rings):
        role = int(depth[r] % 2)  # 0 outer, 1 hole
        parent = -1
        if role == 1:
            containing = [a for a in range(n) if contains[a, r]]
            parent = max(containing, key=lambda a: depth[a])
        # orientation normalize: outer CCW (area>0 in x=lon,y=lat), hole CW
        area = K.polygon_area(lo, la)
        if (role == 0 and area < 0) or (role == 1 and area > 0):
            la, lo = la[::-1], lo[::-1]
        out["relation"].append(rel)
        out["ring_idx"].append(r)
        out["role"].append(role)
        out["parent"].append(parent)
        out["valid"].append(True)
        out["n_ways"].append(nw)
        out["lats"].append(la.tolist())
        out["lons"].append(lo.tolist())
    return pd.DataFrame(out)


def assemble_multipolygons(members: DataFrame) -> DataFrame:
    """(relation, way, role, lats, lons) -> assembled ring table
    (relation, ring_idx, role, parent, valid, n_ways, lats, lons)."""
    return members.groupBy("relation").applyInPandas(_assemble_group, _ASM_SCHEMA)


def polygon_tags(relation_tags: DataFrame, way_tags: DataFrame,
                 outer_ways: DataFrame) -> DataFrame:
    """Polygon tag table: relation tags win; plus tags present on EVERY
    outer member way (multipolygons.ml:636-676).

    relation_tags(relation, key, val); way_tags(way, key, val);
    outer_ways(relation, way).  Returns (relation, key, val).
    """
    n_outer = outer_ways.groupBy("relation").agg(F.count("*").alias("n_ways"))
    common = (
        outer_ways.join(way_tags, "way")
        .groupBy("relation", "key", "val")
        .agg(F.count("*").alias("c"))
        .join(n_outer, "relation")
        .filter(F.col("c") == F.col("n_ways"))
        .select("relation", "key", "val")
    )
    rel_keys = relation_tags.select("relation", "key")
    common_minus_rel = common.join(rel_keys, ["relation", "key"], "left_anti")
    return relation_tags.select("relation", "key", "val").unionByName(
        common_minus_rel)
