"""Grid-density spatial clustering (operators/cluster.py) and the
range-frame rolling window driver query. Unit semantics on crafted
inputs; scripts/check_contract.py covers the sf0.01 oracle parity."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Row
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.operators.cluster import (
    grid_density_clusters,
)

# ---------------------------------------------------------- cluster


def _pts(spark, coords):
    return spark.createDataFrame(
        [Row(lon=float(x), lat=float(y)) for x, y in coords]
    )


def _brute_clusters(coords, cell_deg=1.0, min_pts=2):
    """Union-find oracle over dense cells with 8-neighbor adjacency,
    using the engine's world-offset grid convention
    (functions/grid.cell_x_col: floor((lon+180)/deg), clamped)."""
    import math

    from collections import Counter

    nx = int(round(360.0 / cell_deg))
    ny = int(round(180.0 / cell_deg))

    def q(v, off, n):
        return min(max(math.floor((v + off) / cell_deg), 0), n - 1)

    cells = Counter(
        (q(x, 180.0, nx), q(y, 90.0, ny)) for x, y in coords
    )
    dense = {c for c, n in cells.items() if n >= min_pts}
    parent = {c: c for c in dense}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for (cx, cy) in dense:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb != (cx, cy) and nb in dense:
                    ra, rb = find((cx, cy)), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for c in dense:
        groups.setdefault(find(c), set()).add(c)
    return {frozenset(g) for g in groups.values()}, {
        c: cells[c] for c in dense
    }


def _spark_clusters(out_pdf):
    groups = {}
    for r in out_pdf.itertuples():
        groups.setdefault(r.cluster_id, set()).add((r.cx, r.cy))
    return {frozenset(g) for g in groups.values()}


def test_grid_cluster_basic_and_diagonal(spark):
    # cluster A: two touching dense cells (0,0) and (1,1) — DIAGONAL
    # contact must merge; cluster B: isolated dense cell (5,5);
    # (9,9) has one point only -> not dense, absent from output.
    coords = (
        [(0.2, 0.3), (0.7, 0.8)]          # cell (0,0) n=2
        + [(1.1, 1.5), (1.9, 1.2), (1.5, 1.8)]  # cell (1,1) n=3
        + [(5.5, 5.5), (5.1, 5.9)]        # cell (5,5) n=2
        + [(9.5, 9.5)]                    # sparse
    )
    out = grid_density_clusters(_pts(spark, coords)).toPandas()
    want_groups, want_counts = _brute_clusters(coords)
    assert _spark_clusters(out) == want_groups
    got_counts = {
        (r.cx, r.cy): r.n_points for r in out.itertuples()
    }
    assert got_counts == want_counts
    assert len(got_counts) == 3  # the sparse (9.5, 9.5) cell is absent


def test_grid_cluster_chain_and_negative_coords(spark):
    # chain of dense cells crossing the origin: (-1,-1),(0,0),(1,0),
    # (2,1) — all one component through successive 8-touches; floor
    # quantization (not trunc) is what puts (-0.5,-0.5) in (-1,-1).
    coords = []
    for cx, cy in [(-1, -1), (0, 0), (1, 0), (2, 1)]:
        coords += [(cx + 0.25, cy + 0.25), (cx + 0.75, cy + 0.75)]
    coords += [(4 + 0.5, 1 + 0.5)] * 2  # (4,1): gap of one cell -> own cluster
    out = grid_density_clusters(_pts(spark, coords)).toPandas()
    want_groups, _ = _brute_clusters(coords)
    got = _spark_clusters(out)
    assert got == want_groups
    assert len(got) == 2


def test_grid_cluster_min_pts_and_cell_deg(spark):
    coords = [(0.1, 0.1), (0.2, 0.2), (0.3, 0.3), (2.1, 0.1)]
    # min_pts=3: only cell (0,0) survives, alone
    out = grid_density_clusters(
        _pts(spark, coords), min_pts=3
    ).toPandas()
    assert len(out) == 1 and out.n_points.iloc[0] == 3
    # cell_deg=4: everything lands in one dense cell
    out2 = grid_density_clusters(
        _pts(spark, coords), cell_deg=4.0, min_pts=4
    ).toPandas()
    assert len(out2) == 1 and out2.n_points.iloc[0] == 4


def test_grid_cluster_no_dense_cells_empty(spark):
    out = grid_density_clusters(
        _pts(spark, [(0.1, 0.1), (3.5, 3.5)])
    ).toPandas()
    assert len(out) == 0


# ---------------------------------------------------------- rolling


def test_events_rolling_matches_bruteforce(spark):
    """Range-frame rolling hour vs a pandas brute force, with
    timestamp TIES inside one key — RANGE frames include peers, so
    two events at the same second must each see both."""
    import __spark_entry__ as E

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        # (event_id, type, offset_s, value)
        (1, "a", 0, 1.00),
        (2, "a", 10, 2.00),
        (3, "a", 10, 4.00),        # tie with event 2
        (4, "a", 3599, 8.00),      # exactly window edge from t=0
        (5, "a", 3600, 16.00),     # t=0 falls out (3599 preceding)
        (6, "a", 9000, 32.00),     # isolated
        (7, "b", 5, 100.00),       # other key unaffected
    ]
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "ts": [base + pd.Timedelta(seconds=r[2]) for r in rows],
            "value": [r[3] for r in rows],
        }
    )
    sdf = spark.createDataFrame(pdf)
    from pyspark.sql import Window

    epoch = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy(epoch)
        .rangeBetween(-(E.ROLL_WINDOW_S - 1), 0)
    )
    got = (
        sdf.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("roll_n"),
            F.sum(cents).over(w).alias("roll_cents"),
        )
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )

    # brute force
    want_n, want_c = {}, {}
    for r in rows:
        t = r[2]
        in_win = [
            s
            for s in rows
            if s[1] == r[1] and t - (E.ROLL_WINDOW_S - 1) <= s[2] <= t
        ]
        want_n[r[0]] = len(in_win)
        want_c[r[0]] = sum(round(s[3] * 100) for s in in_win)
    for eid in want_n:
        assert got.loc[eid, "roll_n"] == want_n[eid], eid
        assert got.loc[eid, "roll_cents"] == want_c[eid], eid
    # the tie pair sees each other symmetrically
    assert got.loc[2, "roll_n"] == got.loc[3, "roll_n"] == 3
