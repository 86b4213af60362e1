"""GeoJSON (RFC 7946) feature intake.

Geospatial corpora ship as GeoJSON FeatureCollections (open-data
portals, OSM extracts, annotation tools). The engineering here is the
GEOMETRY layer, not the JSON: per feature this reader computes the
recursive bbox over any geometry type, ring metrics for polygons —
point counts, ring closure, the shoelace signed area, and the RFC
7946 winding audit (exterior rings SHOULD be counter-clockwise;
legacy data frequently is not, and a pipeline wants that flagged, not
silently "fixed") — plus canonical sorted-key properties JSON.

Geometry types covered: Point, MultiPoint, LineString,
MultiLineString, Polygon, MultiPolygon, GeometryCollection
(recursed). Malformed documents or features (bad JSON, unknown type,
unclosed/short rings, non-numeric coordinates) yield ONE quarantine
row per document with ``error`` set — the loud-failure taxonomy of
the other intakes.

Spark shape: one Arrow ``mapInPandas`` pass; everything downstream of
the byte boundary is Column algebra over the typed output table.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame, types as T

__all__ = ["read_geojson", "feature_metrics", "GEOJSON_ROWS_SCHEMA"]

GEOJSON_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feat_idx", T.IntegerType()),
        T.StructField("gtype", T.StringType()),
        T.StructField("n_points", T.IntegerType()),
        T.StructField("n_rings", T.IntegerType()),
        T.StructField("bbox_xmin", T.DoubleType()),
        T.StructField("bbox_ymin", T.DoubleType()),
        T.StructField("bbox_xmax", T.DoubleType()),
        T.StructField("bbox_ymax", T.DoubleType()),
        T.StructField("area", T.DoubleType()),
        T.StructField("ccw", T.IntegerType()),
        T.StructField("props", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)

_GEOM_TYPES = {
    "Point",
    "MultiPoint",
    "LineString",
    "MultiLineString",
    "Polygon",
    "MultiPolygon",
    "GeometryCollection",
}


def _positions(geom: dict):
    """Yield every coordinate position of a geometry, validated."""
    gt = geom.get("type")
    if gt not in _GEOM_TYPES:
        raise ValueError(f"unknown geometry type {gt!r}")
    if gt == "GeometryCollection":
        for g in geom.get("geometries", []):
            yield from _positions(g)
        return
    coords = geom.get("coordinates")

    def walk(c, depth):
        if depth == 0:
            if (
                not isinstance(c, (list, tuple))
                or len(c) < 2
                or not all(isinstance(v, (int, float)) for v in c[:2])
            ):
                raise ValueError(f"bad position {c!r}")
            yield float(c[0]), float(c[1])
        else:
            for item in c:
                yield from walk(item, depth - 1)

    depth = {
        "Point": 0,
        "MultiPoint": 1,
        "LineString": 1,
        "MultiLineString": 2,
        "Polygon": 2,
        "MultiPolygon": 3,
    }[gt]
    yield from walk(coords, depth)


def _shoelace(ring) -> float:
    """Signed shoelace area; positive = counter-clockwise. Sequential
    fold in ring order — deterministic on every engine."""
    s = 0.0
    n = len(ring)
    for i in range(n - 1):  # ring is closed: last == first
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[i + 1][0], ring[i + 1][1]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def _rings(geom: dict):
    """Yield (is_outer, ring): the first ring of each polygon is the
    exterior, the rest are holes (RFC 7946 §3.1.6)."""
    gt = geom.get("type")
    if gt == "Polygon":
        for k, ring in enumerate(geom.get("coordinates", [])):
            yield k == 0, ring
    elif gt == "MultiPolygon":
        for poly in geom.get("coordinates", []):
            for k, ring in enumerate(poly):
                yield k == 0, ring
    elif gt == "GeometryCollection":
        for g in geom.get("geometries", []):
            yield from _rings(g)


def feature_metrics(feature: dict) -> dict:
    geom = feature.get("geometry")
    if not isinstance(geom, dict):
        raise ValueError("feature has no geometry object")
    pts = list(_positions(geom))
    if not pts:
        raise ValueError("geometry has no positions")
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    n_rings = 0
    area = 0.0
    ccw = None
    for k, (is_outer, ring) in enumerate(_rings(geom)):
        if len(ring) < 4:
            raise ValueError(f"ring {k} has {len(ring)} positions (<4)")
        if ring[0][:2] != ring[-1][:2]:
            raise ValueError(f"ring {k} is not closed")
        signed = _shoelace(ring)
        if is_outer:
            # RFC 7946 exterior check over EVERY exterior ring (a
            # MultiPolygon has one per polygon): 1 only if all CCW
            ring_ccw = 1 if signed > 0 else 0
            ccw = ring_ccw if ccw is None else (ccw & ring_ccw)
        area += abs(signed) if is_outer else -abs(signed)
        n_rings += 1
    props = feature.get("properties") or {}
    return {
        "gtype": geom["type"],
        "n_points": len(pts),
        "n_rings": n_rings,
        "bbox_xmin": min(xs),
        "bbox_ymin": min(ys),
        "bbox_xmax": max(xs),
        "bbox_ymax": max(ys),
        "area": area,
        "ccw": ccw,
        "props": json.dumps(
            props, sort_keys=True, separators=(",", ":")
        ),
    }


def read_geojson(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Parse a GeoJSON FeatureCollection text column: one typed row
    per feature (+ one quarantine row per unreadable document)."""

    def kernel(batches) -> Iterator:
        import pandas as pd

        cols = [f.name for f in GEOJSON_ROWS_SCHEMA.fields]
        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                try:
                    doc = json.loads(text)
                    if doc.get("type") != "FeatureCollection":
                        raise ValueError(
                            f"not a FeatureCollection: {doc.get('type')!r}"
                        )
                    feats = [
                        feature_metrics(f) for f in doc.get("features", [])
                    ]
                except (ValueError, KeyError, TypeError) as e:
                    out.append(
                        (did, None) + (None,) * 10
                        + (f"{type(e).__name__}: {e}",)
                    )
                    continue
                for i, m in enumerate(feats):
                    out.append(
                        (
                            did,
                            i,
                            m["gtype"],
                            m["n_points"],
                            m["n_rings"],
                            m["bbox_xmin"],
                            m["bbox_ymin"],
                            m["bbox_xmax"],
                            m["bbox_ymax"],
                            m["area"],
                            m["ccw"],
                            m["props"],
                            None,
                        )
                    )
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(kernel, GEOJSON_ROWS_SCHEMA)
