"""Geospatial radius join: grid-cell bucketing + haversine verify.

The resample tier (`operators/resample.py`) joins points to FIXED
grids; this is the free-form variant — "every point within R km of
any site" (store catchment, sensor coverage, POI tagging) — which
Spark has no native join type for and a naive formulation plans as a
BroadcastNestedLoopJoin over the haversine inequality.

Spark-first shape (same family as `extensions/net.py:cidr_enrich`):
sites explode onto a 3x3 neighborhood of integer grid cells and
broadcast; points compute their single cell; the match is an EQUI
hash join on the cell id with the haversine as a residual filter.
Cell sizing makes the +/-1 neighborhood sufficient: the latitude cell
is ``R / 110 km-per-degree`` and the longitude cell is sized at the
WORST supported latitude (``lat_cap``), where one degree of longitude
is shortest — so any two points within R km and below the cap differ
by at most one cell in each dimension. Near the equator the oversized
longitude cells admit extra candidates (verified away by the residual
filter), never missed matches.

Points above ``|lat_cap|`` are dropped with a documented contract —
polar-cap joins need a dedicated scheme (all within one bucket); keep
``lat_cap`` at or below ~85 and well above the data's latitude range.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["haversine_km", "geo_radius_join", "point_in_polygon"]

_EARTH_KM = 6371.0088  # IUGG mean Earth radius
_KM_PER_DEG_LAT = 110.0  # minimum km per degree of latitude (slack side)
_KM_PER_DEG_LON_EQ = 111.32  # km per degree of longitude at the equator


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km — the standard haversine, written
    as one expression tree so Spark and the SQL oracle evaluate the
    identical float chain."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / 2
    dlam = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(p1) * F.cos(p2) * F.sin(dlam) * F.sin(dlam)
    )
    return 2 * _EARTH_KM * F.asin(F.sqrt(a))


def geo_radius_join(
    points: DataFrame,
    sites: DataFrame,
    radius_km: float,
    point_cols: tuple[str, str] = ("lat", "lon"),
    site_cols: tuple[str, str] = ("site_lat", "site_lon"),
    lat_cap: float = 75.0,
) -> DataFrame:
    """All (point, site) pairs within ``radius_km``, with ``dist_km``
    appended. ``sites`` is the small side (broadcast after a bounded
    9x explode); ``points`` never shuffles. Both inputs keep all
    their columns; the coordinate column names must not collide.
    """
    cell_lat_deg = radius_km / _KM_PER_DEG_LAT
    cell_lon_deg = radius_km / (
        _KM_PER_DEG_LON_EQ * math.cos(math.radians(lat_cap))
    )
    plat, plon = F.col(point_cols[0]), F.col(point_cols[1])
    slat, slon = F.col(site_cols[0]), F.col(site_cols[1])

    if cell_lon_deg >= 90.0:
        raise ValueError(
            "radius/lat_cap give a longitude cell >= 90 deg; the 3x3 "
            "neighborhood scheme needs cells well under a hemisphere"
        )
    # antimeridian: a site near +/-180 also registers a ghost copy
    # shifted by 360 deg so points on the other side of the seam land
    # in its neighborhood. Haversine is invariant under the shift
    # (sin^2((x - 360)/2) == sin^2(x/2)), and the ghost's cells can
    # never collide with the original's (360 deg >> 3 cells).
    grid = (
        sites.where(F.abs(slat) <= lat_cap)
        .withColumn(
            "__shift",
            F.explode(F.array(F.lit(-360.0), F.lit(0.0), F.lit(360.0))),
        )
        .where(F.abs(slon + F.col("__shift")) <= 180.0 + 2 * cell_lon_deg)
        .withColumn("__dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("__dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn(
            "__cell",
            F.struct(
                (F.floor(slat / cell_lat_deg) + F.col("__dy")).alias("cy"),
                (
                    F.floor((slon + F.col("__shift")) / cell_lon_deg)
                    + F.col("__dx")
                ).alias("cx"),
            ),
        )
        .drop("__dy", "__dx", "__shift")
    )
    pts = points.where(F.abs(plat) <= lat_cap).withColumn(
        "__cell",
        F.struct(
            F.floor(plat / cell_lat_deg).alias("cy"),
            F.floor(plon / cell_lon_deg).alias("cx"),
        ),
    )
    dist = haversine_km(plat, plon, slat, slon)
    return (
        pts.join(F.broadcast(grid), "__cell")
        .where(dist <= radius_km)
        .drop("__cell")
        .withColumn("dist_km", dist)
    )


def point_in_polygon(
    points: DataFrame,
    polygons: dict[str, list[list[tuple[int, int]]]],
    x_col: str = "lon",
    y_col: str = "lat",
    scale: int = 4,
) -> DataFrame:
    """Point-in-polygon tagging by ray-cast crossing parity, compiled
    to ZERO-shuffle scan-stage Column algebra.

    ``polygons`` maps id -> rings of INTEGER vertices (extra rings are
    holes; parity handles them for free). Points whose scaled
    coordinates land on an integer lattice (e.g. quarter-degree
    offsets with ``scale=4``) make the crossing test all-integer —
    the half-open straddle rule plus a cross-multiplied side test with
    no division — so the result is engine-exact, no float flap on
    boundaries.

    Scale shape: the polygon set is a dim (fence/zone catalogs are
    thousands of edges at most), so it compiles INTO the plan as
    literal terms: per-point cost is O(total edges) inside whole-stage
    codegen, no broadcast, no join, no shuffle — the row never leaves
    its scan partition. The matched ids come out of one array
    filter + explode.

    Matching is INNER-join-shaped: the explode drops points inside no
    polygon (use ``explode_outer`` downstream if unmatched points
    must survive with NULL poly_id — here the operator's contract is
    "tag the contained points"). A polygon whose rings are entirely
    horizontal edges encloses zero area and raises ``ValueError``
    up front instead of failing mid-plan."""
    px = F.round(F.col(x_col) * scale, 0).cast("long")
    py = F.round(F.col(y_col) * scale, 0).cast("long")
    tags = []
    for pid, rings in polygons.items():
        terms = []
        for ring in rings:
            n = len(ring)
            for i in range(n):
                x1, y1 = ring[i]
                x2, y2 = ring[(i + 1) % n]
                x1, y1, x2, y2 = (v * scale for v in (x1, y1, x2, y2))
                if y1 == y2:
                    continue  # horizontal edge never straddles
                straddle = (F.lit(y1) > py) != (F.lit(y2) > py)
                side = (px - F.lit(x1)) * F.lit(y2 - y1) - F.lit(
                    x2 - x1
                ) * (py - F.lit(y1))
                cross = straddle & (
                    side * F.lit(1 if y2 > y1 else -1) < 0
                )
                terms.append(cross.cast("int"))
        if not terms:
            raise ValueError(
                f"polygon {pid!r} has no non-horizontal edges — it "
                "encloses zero area; fix or drop the ring set"
            )
        parity = terms[0]
        for t in terms[1:]:
            parity = parity + t
        tags.append(F.when(parity % 2 == 1, F.lit(pid)))
    matched = F.array_compact(F.array(*tags))
    return points.withColumn("poly_id", F.explode(matched))


def spatial_join_points_in_polygons(
    points: DataFrame,
    polys: DataFrame,
    cell: float,
    x_col: str = "x",
    y_col: str = "y",
    ring_col: str = "ring",
    poly_id_col: str = "poly_id",
) -> DataFrame:
    """Table-to-table point-in-polygon join — the scale path when the
    polygon set is DATA (parcels, admin zones, geofences by the
    million), where :func:`point_in_polygon`'s compile-into-the-plan
    literals stop applying.

    Plan: each polygon explodes onto the integer grid cells its bbox
    covers (``cell`` sized to the typical polygon — fan-out is
    O(bbox area / cell²)); each point lands in exactly ONE cell, so
    the candidate join is a plain EQUI join on (cx, cy) with no
    cartesian anywhere and each (point, polygon) pair generated at
    most once. The exact ray-cast verify then runs as a pure Column
    higher-order fold over the ring array (same half-open straddle +
    cross-multiplied side rule as the literal operator — no division,
    so quarter-aligned fixtures replay exactly). Inner-join
    semantics: unmatched points drop (explode_outer downstream if
    they must survive).

    ``polys`` rows: (poly_id, ring) with ring an
    ``array<struct<x double, y double>>`` CLOSED ring (first ==
    last). Degenerate rings (< 4 positions) FAIL the task loudly
    in the scan stage (an `assert_true` fused into the cover
    computation — no driver-side pre-scan, no silent non-match)."""
    inv = 1.0 / float(cell)
    px, py = F.col(x_col), F.col(y_col)
    xs = F.transform(F.col(ring_col), lambda v: v["x"])
    ys = F.transform(F.col(ring_col), lambda v: v["y"])
    ring_ok = F.coalesce(
        F.assert_true(
            F.size(F.col(ring_col)) >= 4,
            "spatial_join_points_in_polygons: ring has < 4 positions",
        ).cast("long"),
        F.lit(0),
    )
    cover = polys.select(
        poly_id_col,
        ring_col,
        F.explode(
            F.sequence(
                F.floor(F.array_min(xs) * inv) + ring_ok,
                F.floor(F.array_max(xs) * inv),
            )
        ).alias("__cx"),
        F.array_min(ys).alias("__ylo"),
        F.array_max(ys).alias("__yhi"),
    ).select(
        poly_id_col,
        ring_col,
        "__cx",
        F.explode(
            F.sequence(
                F.floor(F.col("__ylo") * inv),
                F.floor(F.col("__yhi") * inv),
            )
        ).alias("__cy"),
    )
    pts = points.withColumn("__cx", F.floor(px * inv)).withColumn(
        "__cy", F.floor(py * inv)
    )
    cand = pts.join(cover, ["__cx", "__cy"])
    ring = F.col(ring_col)
    crossings = F.aggregate(
        F.sequence(F.lit(0), F.size(ring) - 2),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (
                (ring[i]["y"] > py) != (ring[i + 1]["y"] > py)
            )
            & (
                (
                    (px - ring[i]["x"]) * (ring[i + 1]["y"] - ring[i]["y"])
                    - (ring[i + 1]["x"] - ring[i]["x"])
                    * (py - ring[i]["y"])
                )
                * F.signum(ring[i + 1]["y"] - ring[i]["y"])
                < 0
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return (
        cand.withColumn("__cr", crossings)
        .where(F.col("__cr") % 2 == 1)
        .drop("__cx", "__cy", "__cr", ring_col)
    )
