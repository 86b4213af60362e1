"""Semantics tests for grid-bucketed DBSCAN."""

import pytest
from pyspark.sql import Row

from trollflow2_spark.extensions.clustering import dbscan_grid


def _run(spark, pts, eps, min_pts):
    df = spark.createDataFrame(
        [Row(id=i, x=float(x), y=float(y)) for i, (x, y) in enumerate(pts)]
    )
    out = dbscan_grid(df, eps=eps, min_pts=min_pts)
    return {r.id: (r.is_core, r.cluster_id) for r in out.collect()}


def test_two_clusters_and_noise(spark):
    line1 = [(i * 0.5, 0.0) for i in range(5)]        # ids 0-4
    line2 = [(100 + i * 0.5, 0.0) for i in range(5)]  # ids 5-9
    noise = [(50.0, 50.0)]                            # id 10
    got = _run(spark, line1 + line2 + noise, eps=0.6, min_pts=3)
    # cluster id = min CORE id (endpoints are border, so 1 and 6)
    assert all(got[i] == (1, 1) for i in range(1, 4))
    assert all(got[i] == (1, 6) for i in range(6, 9))
    assert got[10] == (0, None)
    # line endpoints: only 1 neighbor + self = 2 < 3 -> border, not
    # core, but adjacent to a core point -> join the cluster
    assert got[0] == (0, 1) and got[4] == (0, 1)


def test_border_point_attaches_to_smallest_cluster(spark):
    # two tight quads (each point has 3 neighbors + self = min_pts)
    # and a bridge within eps of ONE core from each quad but only 2
    # neighbors total: border, attaches to the smaller cluster id,
    # and does NOT merge the clusters (core-core edges only)
    quad1 = [(0.0, 0.0), (0.3, 0.0), (0.0, 0.3), (0.3, 0.3)]  # 0-3
    quad2 = [(1.0, 0.0), (1.3, 0.0), (1.0, 0.3), (1.3, 0.3)]  # 4-7
    bridge = [(0.65, -0.25)]                                  # id 8
    got = _run(spark, quad1 + quad2 + bridge, eps=0.5, min_pts=4)
    assert all(got[i] == (1, 0) for i in range(4))
    assert all(got[i] == (1, 4) for i in range(4, 8))
    assert got[8] == (0, 0)  # border; min cluster id wins

    # a chain point with enough neighbors IS core and density-
    # connects its neighbors' clusters — classic DBSCAN chaining
    tri1 = [(0.0, 0.0), (0.4, 0.0), (0.2, 0.3)]
    got = _run(
        spark,
        tri1 + [(0.8, 0.0)] + [(1.2, 0.0), (1.6, 0.0), (1.4, 0.3)],
        eps=0.5,
        min_pts=3,
    )
    assert {v[1] for v in got.values()} == {0}  # one chained cluster


def test_duplicate_points_count_as_neighbors(spark):
    got = _run(spark, [(1.0, 1.0)] * 4, eps=0.1, min_pts=4)
    assert all(v == (1, 0) for v in got.values())


def test_isolated_core_singleton_cluster(spark):
    # min_pts=1: every point is core even with no neighbors
    got = _run(spark, [(0.0, 0.0), (10.0, 10.0)], eps=1.0, min_pts=1)
    assert got[0] == (1, 0) and got[1] == (1, 1)


def test_bad_params_raise(spark):
    df = spark.createDataFrame([Row(id=1, x=0.0, y=0.0)])
    with pytest.raises(ValueError):
        dbscan_grid(df, eps=0.0, min_pts=3)
    with pytest.raises(ValueError):
        dbscan_grid(df, eps=1.0, min_pts=0)


def test_kd_guard_redirects_high_dims(spark):
    import pytest

    from trollflow2_spark.extensions.clustering import dbscan_grid_kd

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0, 0.0, 0.0, 0.0)],
        "id long, a double, b double, c double, d double, e double",
    )
    with pytest.raises(ValueError, match="k-means/IVF"):
        dbscan_grid_kd(
            pts, eps=1.0, min_pts=2,
            coord_cols=["a", "b", "c", "d", "e"],
        )


def test_3d_blobs_and_noise(spark):
    from trollflow2_spark.extensions.clustering import dbscan_grid_kd

    rows = []
    i = 0
    # a 2x2x2 blob at origin (spacing 0.5: every point has 3 axis +
    # 3 face-diagonal neighbors in eps=0.75 -> core at min_pts=4)
    for x in (0.0, 0.5):
        for y in (0.0, 0.5):
            for z in (0.0, 0.5):
                rows.append((i, x, y, z)); i += 1
    rows.append((100, 50.0, 50.0, 50.0))  # noise
    pts = spark.createDataFrame(
        rows, "id long, x double, y double, z double"
    )
    out = {
        r["id"]: r
        for r in dbscan_grid_kd(
            pts, eps=0.75, min_pts=4, coord_cols=["x", "y", "z"]
        ).collect()
    }
    assert all(out[i]["is_core"] == 1 for i in range(8))
    assert all(out[i]["cluster_id"] == 0 for i in range(8))
    assert out[100]["is_core"] == 0 and out[100]["cluster_id"] is None
