"""Optional-dependency GEOS convention gate.

The sandbox has no GEOS/shapely, so every numPoints expectation in the
fixtures is a hand-derived closed form or an exact local-counting
identity matching JTS/GEOS 3.8 OverlayOp conventions. A systematic
misreading of a convention (e.g. how OverlayOp nodes a touch point)
would be invisible here because both the fixtures and the engine would
share it. This module retires that risk class wherever real GEOS
exists: when ``shapely`` (>= 2.0) is importable, it replays the
concave, degenerate, and lines fixtures through
``shapely.intersection/union`` and asserts the STORED expected values
— i.e. it checks the fixtures against GEOS itself, not against the
engine. Skipped (not failed) in environments without shapely.

Run it where GEOS exists with:

    pip install shapely>=2.0
    python -m pytest tests/test_geos_convention_gate.py -v

(documented in TESTDATA.md). JTS ``getNumPoints()`` == GEOS
``GEOSGetNumCoordinates`` == ``shapely.get_num_coordinates`` (total
coordinate count, closing vertices included), which is exactly what
the reference's refine emits (src/thread_util.cpp:424-441).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

shapely = pytest.importorskip("shapely", minversion="2.0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BD = os.path.join(REPO, "bench_data")


def _geoms(path, id_col="poly_id"):
    df = pd.read_parquet(path)
    return {
        int(r[id_col]): shapely.from_wkb(bytes(r["geom_wkb"]))
        for _, r in df.iterrows()
    }


def _replay(pairs, left, right, op, lcol, rcol, ecol):
    mismatches = []
    for _, row in pairs.iterrows():
        exp = row[ecol]
        if pd.isna(exp):
            continue
        a = left[int(row[lcol])]
        b = right[int(row[rcol])]
        g = shapely.intersection(a, b) if op == "intersection" else (
            shapely.union(a, b)
        )
        got = int(shapely.get_num_coordinates(g))
        if got != int(exp):
            mismatches.append(
                (int(row[lcol]), int(row[rcol]), got, int(exp))
            )
    assert not mismatches, (
        f"GEOS disagrees with stored {op} expectations "
        f"(l_id, r_id, geos, stored): {mismatches[:20]}"
    )


@pytest.mark.skipif(
    not os.path.exists(os.path.join(BD, "concave")),
    reason="concave fixture not generated",
)
def test_concave_fixture_matches_geos():
    la = _geoms(os.path.join(BD, "concave", "layer_a.parquet"))
    lb = _geoms(os.path.join(BD, "concave", "layer_b.parquet"))
    lc = _geoms(os.path.join(BD, "concave", "layer_c.parquet"))
    ld = _geoms(os.path.join(BD, "concave", "layer_d.parquet"))
    exp_i = pd.read_parquet(os.path.join(BD, "concave", "expected_int.parquet"))
    exp_u = pd.read_parquet(
        os.path.join(BD, "concave", "expected_union.parquet")
    )
    _replay(exp_i, la, lb, "intersection", "a_id", "b_id", "expected")
    _replay(exp_u, lc, ld, "union", "a_id", "b_id", "expected")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(BD, "degenerate")),
    reason="degenerate fixture not generated",
)
def test_degenerate_fixture_matches_geos():
    le = _geoms(os.path.join(BD, "degenerate", "layer_e.parquet"))
    lf = _geoms(os.path.join(BD, "degenerate", "layer_f.parquet"))
    exp = pd.read_parquet(
        os.path.join(BD, "degenerate", "expected_degen.parquet")
    )
    _replay(exp, le, lf, "intersection", "a_id", "b_id", "expected_int")
    _replay(exp, le, lf, "union", "a_id", "b_id", "expected_union")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(BD, "lines")),
    reason="lines fixture not generated",
)
def test_lines_fixture_matches_geos():
    ll = _geoms(os.path.join(BD, "lines", "layer_lines.parquet"), "line_id")
    lp = _geoms(os.path.join(BD, "lines", "layer_polys.parquet"))
    exp = pd.read_parquet(os.path.join(BD, "lines", "expected_lines.parquet"))
    _replay(exp, ll, lp, "intersection", "line_id", "poly_id", "expected_int")
    _replay(exp, ll, lp, "union", "line_id", "poly_id", "expected_union")
