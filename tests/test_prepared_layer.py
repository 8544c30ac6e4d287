"""PreparedGeometryLayer: repeated polygon_join calls against the
same layer must not re-collect / re-decode the broadcast dictionary
(round-2 verdict next-step #7)."""

import pytest

from workstealing_spatial_join_spark.operators import spatial_join as SJ
from workstealing_spatial_join_spark.operators.ingest import ingest_geometry
from workstealing_spatial_join_spark.operators.spatial_join import (
    PreparedGeometryLayer,
    polygon_join,
)
from workstealing_spatial_join_spark.sources import fixtures as FX


@pytest.fixture(scope="module")
def layers(spark):
    ppdf = FX.polygons_pdf(100)
    la = ppdf.iloc[:50].rename(columns={"polygon_id": "a_id"})
    lb = ppdf.iloc[50:].rename(columns={"polygon_id": "b_id"})
    da = ingest_geometry(spark.createDataFrame(la), "wkt", keep_cols=["a_id"]).cache()
    db = ingest_geometry(spark.createDataFrame(lb), "wkt", keep_cols=["b_id"]).cache()
    da.count(), db.count()
    return da, db


def test_prepared_layer_matches_plain_join(layers):
    da, db = layers
    want = {
        (r.lid, r.rid, r.num_points)
        for r in polygon_join(
            da, db, "a_id", "b_id", predicate="intersection_numpoints"
        ).collect()
    }
    pa = PreparedGeometryLayer(da, "a_id")
    pb = PreparedGeometryLayer(db, "b_id")
    got = {
        (r.lid, r.rid, r.num_points)
        for r in polygon_join(
            pa, pb, "a_id", "b_id", predicate="intersection_numpoints"
        ).collect()
    }
    assert got == want and len(want) > 0


def test_prepared_layer_skips_recollect(layers, monkeypatch):
    da, db = layers
    pa = PreparedGeometryLayer(da, "a_id")
    pb = PreparedGeometryLayer(db, "b_id")

    calls = {"n": 0}
    real = SJ._collect_geom_dict

    def counting(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(SJ, "_collect_geom_dict", counting)

    # two different predicates against the same prepared pair: zero
    # new collects (the dict, rect-verify, and tessellation are all
    # answered from the layer cache)
    for predicate in ("intersects", "union_numpoints"):
        n = polygon_join(
            pa, pb, "a_id", "b_id", predicate=predicate, mode="count"
        ).collect()[0][0]
        assert n > 0
    assert calls["n"] == 0

    # plain-DataFrame joins DO re-collect — one per side per call
    polygon_join(da, db, "a_id", "b_id", predicate="intersects", mode="count").collect()
    assert calls["n"] == 2


def test_prepared_layer_mixed_sides(layers):
    """One prepared side + one plain DataFrame side is allowed."""
    da, db = layers
    pa = PreparedGeometryLayer(da, "a_id")
    want = {
        (r.lid, r.rid)
        for r in polygon_join(da, db, "a_id", "b_id", predicate="intersects").collect()
    }
    got = {
        (r.lid, r.rid)
        for r in polygon_join(pa, db, "a_id", "b_id", predicate="intersects").collect()
    }
    assert got == want and len(want) > 0


def test_prepared_layer_cell_deg_mismatch(layers):
    da, db = layers
    pa = PreparedGeometryLayer(da, "a_id", cell_deg=1.0)
    with pytest.raises(ValueError, match="cell_deg"):
        polygon_join(pa, db, "a_id", "b_id", cell_deg=0.5)


def test_rect_union_split_plan_matches_udf_path(spark):
    """union_numpoints on rect layers splits generic pairs onto the
    Catalyst closed form and degenerate pairs onto the pair UDF; the
    combined result must equal the full-UDF (WKB transport) path on a
    layer mix that hits BOTH branches."""
    import pandas as pd

    from workstealing_spatial_join_spark.operators.ingest import ingest_geometry

    def layer(rows, pref):
        pdf = pd.DataFrame(
            [
                {"rid": f"{pref}{i}",
                 "wkt": f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
                        f"{x0} {y1}, {x0} {y0}))"}
                for i, (x0, y0, x1, y1) in enumerate(rows)
            ]
        )
        return ingest_geometry(spark.createDataFrame(pdf), "wkt", keep_cols=["rid"])

    la = layer([(0, 0, 2, 2), (10, 10, 13, 12), (5, 5, 7, 7),
                (20, 0, 22, 2)], "a")
    lb = layer([(1, 1, 3, 3),          # generic overlap with a0
                (12, 11, 14, 13.5),    # shared x=12? no: generic
                (7, 5, 9, 7),          # shared edge with a2 (degenerate)
                (22, 2, 24, 4),        # corner touch with a3 (degenerate)
                (0.5, 0.5, 1.5, 1.5)], "b")
    kw = dict(predicate="union_numpoints", mode="pairs", cell_deg=4.0)
    split = {
        (r.lid, r.rid, r.num_points)
        for r in polygon_join(la, lb, "rid", "rid", **kw).collect()
    }
    full = {
        (r.lid, r.rid, r.num_points)
        for r in polygon_join(
            la, lb, "rid", "rid", refine_transport="wkb", **kw
        ).collect()
    }
    assert split == full and len(split) >= 4
    # sanity: at least one degenerate pair (touch) actually present
    assert any(p[0] == "a2" and p[1] == "b2" for p in split)
    assert any(p[0] == "a3" and p[1] == "b3" for p in split)
