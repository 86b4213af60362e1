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

__all__ = ["haversine_km", "geo_radius_join"]

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
