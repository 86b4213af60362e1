"""Density clustering at corpus scale: grid-bucketed DBSCAN.

Completes the clustering tier next to the k-means family
(`similarity.py`: Lloyd training, SemDeDup cells) with the classic
density algorithm (Ester et al. 1996, public): points with ≥
``min_pts`` neighbors within ``eps`` are CORE; core points within
``eps`` of each other share a cluster; non-core points within
``eps`` of a core point join as BORDER; everything else is NOISE.

Scale shape — the same economics as
`operators/geo.py::spatial_join_points_in_polygons`:

- the neighbor search never goes quadratic: points bucket into
  eps-sized grid cells, ONE side explodes to its 3×3 cell
  neighborhood, and candidates come from a plain EQUI join on the
  cell key with the exact distance filter applied in the joined
  stage. Pair fan-out is bounded by local density (what DBSCAN
  assumes anyway), not corpus size.
- cluster resolution reuses `dedup.py::connected_components`
  (min-label propagation, localCheckpoint per round) over CORE-CORE
  edges only — border points attach afterwards with one min-agg
  join, so the iterative part runs on the (small) core graph.
- cluster ids are DETERMINISTIC: the minimum point id in the
  cluster's core set; border points take the smallest cluster id
  among their core neighbors (ties can't flap — min is total).

Output: (id, x, y, is_core, cluster_id) with cluster_id NULL for
noise. Exact-arithmetic contract: distances compare as squared sums
against eps² — no sqrt — so quarter-aligned fixtures replay
bit-identically on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["dbscan_grid"]


def dbscan_grid(
    points: DataFrame,
    eps: float,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Grid-bucketed exact DBSCAN (see module docstring)."""
    if eps <= 0 or min_pts < 1:
        raise ValueError(f"bad eps={eps!r} / min_pts={min_pts!r}")
    inv = 1.0 / float(eps)
    eps2 = float(eps) * float(eps)
    pts = points.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
        F.floor(F.col(x_col) * inv).alias("__cx"),
        F.floor(F.col(y_col) * inv).alias("__cy"),
    ).localCheckpoint()
    # one side explodes to its 3x3 neighborhood; equi join on the cell
    offs = F.array(*[F.lit(o) for o in (-1, 0, 1)])
    a = pts.select(
        F.col("__id").alias("__ia"),
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
        F.explode(offs).alias("__dx"),
        "__cx",
        "__cy",
    ).select(
        "__ia",
        "__xa",
        "__ya",
        (F.col("__cx") + F.col("__dx")).alias("__jcx"),
        F.explode(offs).alias("__dy"),
        "__cy",
    ).select(
        "__ia",
        "__xa",
        "__ya",
        "__jcx",
        (F.col("__cy") + F.col("__dy")).alias("__jcy"),
    )
    b = pts.select(
        F.col("__id").alias("__ib"),
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
        F.col("__cx").alias("__jcx"),
        F.col("__cy").alias("__jcy"),
    )
    d2 = (F.col("__xa") - F.col("__xb")) ** 2 + (
        F.col("__ya") - F.col("__yb")
    ) ** 2
    nbr = (
        a.join(b, ["__jcx", "__jcy"])
        .where((F.col("__ia") != F.col("__ib")) & (d2 <= F.lit(eps2)))
        .select("__ia", "__ib")
        .localCheckpoint()
    )
    deg = nbr.groupBy("__ia").agg(F.count(F.lit(1)).alias("__deg"))
    core = (
        pts.join(deg, pts["__id"] == deg["__ia"], "left")
        .select(
            "__id",
            (
                F.coalesce(F.col("__deg"), F.lit(0)) + 1 >= min_pts
            ).alias("__core"),
        )
        .localCheckpoint()
    )
    core_ids = core.where("__core").select(F.col("__id"))
    # core-core edges drive the component resolution
    cc_edges = (
        nbr.join(
            core_ids.select(F.col("__id").alias("__ia")), "__ia",
            "left_semi",
        )
        .join(
            core_ids.select(F.col("__id").alias("__ib")), "__ib",
            "left_semi",
        )
        .select(F.col("__ia").alias("id_a"), F.col("__ib").alias("id_b"))
    )
    from trollflow2_spark.extensions.dedup import connected_components

    comp = connected_components(cc_edges)  # (id, cluster_id)
    # isolated core points (no core neighbor) form singleton clusters
    core_clusters = (
        core_ids.join(
            comp, core_ids["__id"] == comp["id"], "left"
        )
        .select(
            F.col("__id"),
            F.coalesce(F.col("cluster_id"), F.col("__id")).alias(
                "__cluster"
            ),
        )
        .localCheckpoint()
    )
    # border points: smallest cluster among their CORE neighbors
    border = (
        nbr.join(
            core_clusters.select(
                F.col("__id").alias("__ib"),
                F.col("__cluster").alias("__bc"),
            ),
            "__ib",
        )
        .groupBy("__ia")
        .agg(F.min("__bc").alias("__border_cluster"))
    )
    return (
        pts.join(core, "__id")
        .join(
            core_clusters.select(
                "__id", F.col("__cluster").alias("__own")
            ),
            "__id",
            "left",
        )
        .join(
            border.select(
                F.col("__ia").alias("__id"), "__border_cluster"
            ),
            "__id",
            "left",
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__x").alias(x_col),
            F.col("__y").alias(y_col),
            F.col("__core").cast("int").alias("is_core"),
            F.when(F.col("__core"), F.col("__own"))
            .otherwise(F.col("__border_cluster"))
            .alias("cluster_id"),
        )
    )
