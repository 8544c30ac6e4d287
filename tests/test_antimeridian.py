"""Antimeridian routing through the PUBLIC knn_join / dwithin_join
entry points (round-2 verdict #8): planar metric must NOT wrap (the
planar oracle treats lon as plain x), metric='haversine' must find
cross-±180° neighbors."""

import math

import pytest

from workstealing_spatial_join_spark.operators.knn import (
    dwithin_join,
    knn_join,
)


@pytest.fixture(scope="module")
def antimeridian_points(spark):
    # q0 sits just west of the antimeridian; its true nearest
    # neighbors n1/n2 are just EAST of it (lon ≈ -179.9); n3 is a
    # same-side decoy ~55 km away; far* are a hemisphere away.
    rows = [
        ("q0", 179.95, 10.0),
        ("n1", -179.95, 10.0),   # ~11 km east across the line
        ("n2", -179.90, 10.05),  # ~17 km
        ("n3", 179.45, 10.0),    # ~55 km west, same side
        ("far1", 0.0, 10.0),
        ("far2", 90.0, 45.0),
    ]
    return spark.createDataFrame(rows, "pid string, lon double, lat double")


def test_knn_haversine_metric_wraps(antimeridian_points):
    pts = antimeridian_points
    q = pts.where("pid = 'q0'")
    out = knn_join(
        q, pts, k=3, query_id="pid", cand_id="pid",
        exclude_self=True, metric="haversine",
    ).collect()
    got = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert got == ["n1", "n2", "n3"]
    km = {r.neighbor_id: r.dist_km for r in out}
    assert km["n1"] < 12.0 and km["n2"] < 20.0  # wrapped distances


def test_knn_planar_metric_does_not_wrap(antimeridian_points):
    """Planar semantics: lon is x. n1/n2 are ~360 'units' away, so the
    planar top-3 is the same-side ordering — exactly what the planar
    DuckDB oracle computes."""
    pts = antimeridian_points
    q = pts.where("pid = 'q0'")
    out = knn_join(
        q, pts, k=3, query_id="pid", cand_id="pid", exclude_self=True,
    ).collect()
    got = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert got[0] == "n3"
    assert "n1" not in got[:1]
    dist = {r.neighbor_id: r.dist for r in out}
    assert dist["n3"] == pytest.approx(0.5)


def test_dwithin_haversine_metric_wraps(antimeridian_points):
    pts = antimeridian_points
    q = pts.where("pid = 'q0'")
    out = dwithin_join(
        q, pts, radius=30.0, left_id="pid", right_id="pid",
        exclude_self=True, metric="haversine",
    ).collect()
    got = {r.right_id for r in out}
    assert got == {"n1", "n2"}


def test_dwithin_planar_metric_does_not_wrap(antimeridian_points):
    pts = antimeridian_points
    q = pts.where("pid = 'q0'")
    out = dwithin_join(
        q, pts, radius=1.0, left_id="pid", right_id="pid",
        exclude_self=True,
    ).collect()
    got = {r.right_id for r in out}
    assert got == {"n3"}  # planar: cross-line points are ~360° away


def test_unknown_metric_raises(antimeridian_points):
    pts = antimeridian_points
    with pytest.raises(ValueError, match="metric"):
        knn_join(pts, pts, metric="euclid3d")
    with pytest.raises(ValueError, match="metric"):
        dwithin_join(pts, pts, radius=1.0, metric="euclid3d")


def test_haversine_metric_rejects_planar_ring_args(antimeridian_points):
    """Round-3 review: explicit planar-grid knobs must not be silently
    dropped when routing to the spherical variant."""
    pts = antimeridian_points
    with pytest.raises(ValueError, match="planar-grid"):
        knn_join(pts, pts, metric="haversine", max_ring=2)
    with pytest.raises(ValueError, match="planar-grid"):
        knn_join(pts, pts, metric="haversine", initial_ring=4)
    # stats now flows through to the spherical join
    st = {}
    knn_join(
        pts.where("pid='q0'"), pts, k=2, query_id="pid", cand_id="pid",
        metric="haversine", exclude_self=True, stats=st,
    ).collect()
    assert st["rounds"] >= 1 and "initial_radius_km" in st


def test_planar_mode_warning_documented():
    """The planar default clamps at ±180° by design; the API contract
    requires a loud docstring warning steering global-extent data to
    metric='haversine' (VERDICT r3 #9)."""
    from workstealing_spatial_join_spark.operators.knn import (
        dwithin_join,
        knn_join,
    )

    for fn in (knn_join, dwithin_join):
        doc = fn.__doc__ or ""
        assert "WARNING" in doc and "haversine" in doc and (
            "antimeridian" in doc
        ), f"{fn.__name__} docstring lost its planar-mode warning"
