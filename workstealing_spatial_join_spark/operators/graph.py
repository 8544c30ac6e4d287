"""Distributed connected components — the near-duplicate CLUSTERING
step: pairwise near-dup edges (MinHash/SimHash/embedding LSH) become
duplicate clusters, and a pipeline keeps min-id representative per
cluster instead of dropping arbitrary pair members (dropping by pairs
alone under-deletes: a~b, b~c but not a~c leaves two of three).

Algorithm: hash-min label propagation. Every node starts labeled
with itself; each round, a node's label becomes the min of its own
and its neighbors' labels; fixpoint in O(max component diameter)
rounds. Near-dup graphs are dense small clusters (diameter ≤ ~3), so
2-4 rounds settle in practice. Each round is ONE shuffle (edge join +
min aggregation); labels are localCheckpoint-ed so the plan does not
grow with iterations, and the fixpoint test reuses the checkpointed
result. For adversarially long chains at 10^12 edges, swap the body
for the large-star/small-star contraction (Kiveris et al., MapReduce
CC), which converges in O(log n) rounds with the same per-round
join+min shape — the hash-min form is the clearer default and the
one the oracle's recursive closure verifies exactly.

Reference parity note: the reference engine has no graph stage; this
extends the engine's dedup family (operators/dedup.py) the way its
users chain DBSCAN-style grouping after a spatial self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """``(node, component)`` for every node incident to an edge,
    where ``component`` is the minimum node id reachable from it.
    Ids must be orderable (long/string). Deterministic: min-label is
    order-independent."""
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (
        und.unionByName(
            und.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        proposals = und.join(
            labels.withColumnRenamed("node", "a"), "a"
        ).select(F.col("b").alias("node"), "comp")
        new_labels = (
            labels.unionByName(proposals)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("comp", "prev"), "node"
            )
            .filter(F.col("comp") != F.col("prev"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def sql_connected_components(
    pairs_sql_body: str, a: str = "a", b: str = "b"
) -> str:
    """DuckDB twin: exact transitive closure by recursive CTE over
    the SAME edge list, min-reduced — independent of the iterative
    schedule. ``pairs_sql_body`` is a SELECT yielding columns
    ``(a, b)`` (may itself contain a nested WITH inside parens).

    ``pairs``/``e2`` are forced MATERIALIZED: both are reachable from
    the recursive term, and without the hint DuckDB may inline the
    whole upstream edge derivation into EVERY recursion iteration —
    with the MinHash pipeline as the edge source that turned a
    ~1-minute sf1 oracle into a 45+-minute one (observed; the hint
    bounds the edge pipeline to one evaluation)."""
    return (
        f"pairs AS MATERIALIZED ({pairs_sql_body}), "
        f"e2 AS MATERIALIZED (SELECT {a} AS a, {b} AS b FROM pairs "
        f"WHERE {a} <> {b} "
        f"UNION SELECT {b}, {a} FROM pairs WHERE {a} <> {b}), "
        "nodes AS (SELECT DISTINCT a AS n FROM e2), "
        "reach(src, dst) AS (SELECT n, n FROM nodes "
        "UNION SELECT r.src, e.b FROM reach r JOIN e2 e ON r.dst = e.a) "
    )


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 6,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Fixed-iteration PageRank with ALL-INTEGER fixed-point
    arithmetic — ``(node, rank)`` where ``rank`` is in units of
    ``1/scale`` of one initial page's mass.

    Why integers: float PageRank is order-dependent (partial sums
    change with partitioning), so two engines — or two RUNS — can
    rank-flip near-ties. Here every step is int64: a node's
    per-edge contribution is ``rank div outdeg`` (floor — ranks are
    non-negative by construction), the damped update is
    ``base + (damp_num * Σ contrib) div damp_den`` with
    ``base = scale * (damp_den − damp_num) div damp_den``, and
    integer sums are order-independent, so the result is bit-exact
    reproducible and oracle-comparable. Floor-division truncation
    (≤ outdeg−1 mass per node per round) and dangling-node leakage
    (nodes without out-edges contribute nothing) are the documented
    deviations from the textbook power method; both engines share
    them, and the RANKING is what the operator is for.

    Scale shape: the rank table is partitioned by node; each round is
    one join of ranks against the edge list on src (shuffle on src)
    plus one sum on dst (map-side combinable) and one left join back
    to the node set — the classic Pregel round as plain DataFrame
    ops, with ``localCheckpoint`` truncating the growing plan the
    same way connected_components does. Unrolled fixed iterations
    (no convergence test) keep the job count static and the DuckDB
    twin expressible as chained CTEs (a recursive CTE may reference
    the recursive table only once, which cannot express "every node
    every round" retention).

    Overflow bound: total mass ≤ n_nodes * scale; keep
    n_nodes * scale * damp_num below 2^63 (10^12 nodes at the
    default scale is fine: 10^12 · 10^6 · 85 < 2^63 fails — drop
    ``scale`` to 10^3 at that extreme; assert left to the caller).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ed = e.join(outd, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base = scale * (damp_den - damp_num) // damp_den
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(iters):
        contrib = ed.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"),
            F.expr("rank div od").alias("c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damp_num} * coalesce(s, 0L)) div {damp_den}"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def sql_pagerank_int(
    edges_sql_body: str,
    src: str = "src",
    dst: str = "dst",
    iters: int = 6,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
) -> str:
    """DuckDB twin of :func:`pagerank_int`: the same unrolled
    integer iteration as chained CTEs (``r0 … r{iters}``), one per
    round — NOT a recursive CTE, which can reference the recursive
    table only once and so cannot both propagate along edges and
    retain no-in-edge nodes. Returns a CTE chain fragment (caller
    wraps in ``WITH`` and selects from ``r{iters}``). Every rank is
    CAST back to BIGINT per round (DuckDB widens SUM to HUGEINT).
    """
    base = scale * (damp_den - damp_num) // damp_den
    parts = [
        f"e0 AS MATERIALIZED (SELECT DISTINCT {src} AS src, {dst} AS dst "
        f"FROM ({edges_sql_body}))",
        "outd AS MATERIALIZED (SELECT src, count(*) AS od FROM e0 GROUP BY src)",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e0 "
        "UNION SELECT dst FROM e0)",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT n.node, CAST({base} + ({damp_num} * "
            f"COALESCE(s.s, 0)) // {damp_den} AS BIGINT) AS rank "
            f"FROM nodes n LEFT JOIN (SELECT e.dst AS node, "
            f"SUM(p.rank // o.od) AS s FROM r{i-1} p "
            "JOIN outd o ON o.src = p.node "
            "JOIN e0 e ON e.src = p.node "
            "GROUP BY e.dst) s ON s.node = n.node)"
        )
    return ", ".join(parts)


def bfs_hops(
    edges: DataFrame,
    src_cols: tuple[str, str] = ("sx", "sy"),
    dst_cols: tuple[str, str] = ("dx", "dy"),
    max_hops: int = 8,
) -> DataFrame:
    """Multi-source-free BFS: exact hop distance from the
    lexicographically-least node to every node reachable within
    ``max_hops``, over an UNDIRECTED edge set keyed by 2-D integer
    node ids (the cell-adjacency graph of a spatial network — nodes
    stay (x, y) pairs end to end, no encode/decode round trip).

    Returns (nx, ny, hop) with hop = the true BFS distance (≤
    max_hops). Frontier algorithm: each round is ONE join of the
    frontier against the edge list on the source key (shuffle bounded
    by the frontier, not the graph) + one anti-join against the
    settled set — the textbook Pregel round as plain DataFrame ops,
    ``localCheckpoint`` truncating the growing plan exactly as
    pagerank_int does. The anti-join is what makes the hop EXACT: a
    node enters the settled set the first round it is seen, so its
    recorded hop is the minimum over all paths by construction, and
    later rediscoveries never shuffle again. Unrolled fixed rounds
    keep the job count static; rounds after the frontier empties are
    no-ops on zero-row frames (Spark plans them; they scan nothing).

    Seed: the min node is computed as one ``min(struct(...))``
    aggregate — a 1-row broadcast frame, never a collect.

    Scale shape: settled-set size ≤ nodes; each round shuffles
    |frontier ⋈ edges| candidate rows on the node key. At 10^12 edges
    this is the same plan GraphX/Pregel executes, minus the RDD
    overhead — and the bounded max_hops keeps the round count (hence
    scheduler load) static regardless of graph diameter.
    """
    sx, sy = src_cols
    dx, dy = dst_cols
    fwd = edges.select(
        F.col(sx).alias("ax"),
        F.col(sy).alias("ay"),
        F.col(dx).alias("bx"),
        F.col(dy).alias("by"),
    )
    rev = edges.select(
        F.col(dx).alias("ax"),
        F.col(dy).alias("ay"),
        F.col(sx).alias("bx"),
        F.col(sy).alias("by"),
    )
    und = (
        fwd.unionByName(rev)
        .where((F.col("ax") != F.col("bx")) | (F.col("ay") != F.col("by")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        und.select(F.col("ax").alias("nx"), F.col("ay").alias("ny"))
        .distinct()
    )
    seed = nodes.agg(
        F.min(F.struct("nx", "ny")).alias("m")
    ).select(F.col("m.nx").alias("nx"), F.col("m.ny").alias("ny"))
    settled = seed.withColumn("hop", F.lit(0)).localCheckpoint(eager=True)
    frontier = settled.select("nx", "ny")
    for r in range(1, max_hops + 1):
        nbrs = (
            frontier.join(
                und,
                (F.col("nx") == F.col("ax")) & (F.col("ny") == F.col("ay")),
            )
            .select(F.col("bx").alias("nx"), F.col("by").alias("ny"))
            .distinct()
        )
        fresh = nbrs.join(
            settled.select("nx", "ny"), ["nx", "ny"], "left_anti"
        ).withColumn("hop", F.lit(r))
        settled = settled.unionByName(fresh).localCheckpoint(eager=True)
        frontier = fresh.select("nx", "ny")
    return settled.select(
        "nx", "ny", F.col("hop").cast("int").alias("hop")
    )


def sql_bfs_hops(edges_sql_body: str, max_hops: int = 8) -> str:
    """DuckDB twin of :func:`bfs_hops`: a recursive CTE with UNION
    (distinct) semantics — every DISTINCT (node, hop) pair ≤ max_hops
    is enumerated (bounded by nodes × max_hops, never by path count —
    UNION ALL would explode exponentially on cyclic cell graphs) and
    the true BFS distance is MIN(hop). The edge CTE is MATERIALIZED:
    DuckDB inlines non-materialized CTEs referenced from a recursive
    term and would re-derive the edge set every iteration."""
    return (
        f"WITH RECURSIVE e0 AS MATERIALIZED (SELECT DISTINCT ax, ay, bx, by "
        f"FROM (SELECT sx AS ax, sy AS ay, dx AS bx, dy AS by "
        f"FROM ({edges_sql_body}) "
        f"UNION ALL SELECT dx, dy, sx, sy FROM ({edges_sql_body})) u "
        f"WHERE ax <> bx OR ay <> by), "
        f"seed AS (SELECT ax AS nx, ay AS ny FROM e0 "
        f"ORDER BY ax, ay LIMIT 1), "
        f"bfs (nx, ny, hop) AS ("
        f"SELECT nx, ny, 0 FROM seed "
        f"UNION "
        f"SELECT e.bx, e.by, b.hop + 1 FROM bfs b "
        f"JOIN e0 e ON e.ax = b.nx AND e.ay = b.ny "
        f"WHERE b.hop < {max_hops}) "
        f"SELECT nx, ny, CAST(MIN(hop) AS INT) AS hop "
        f"FROM bfs GROUP BY nx, ny"
    )


GRID_GRAPH_CELL = 8_192  # milli


def occupied_cell_edges(
    points: DataFrame,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Point layer → the 8-neighbor adjacency graph of its OCCUPIED
    grid cells (the geodesic structure of the density surface — the
    same cell graph spatial_cluster's component merge walks). Output
    (sx, sy, dx, dy): one row per ordered pair of adjacent occupied
    cells.

    Scale shape: one distinct on the cell key (map-side combinable),
    a bounded ×8 map-side explode of the neighbor offsets, and ONE
    equi-join back against the occupied set — never a spatial
    predicate, never a cross product."""
    fd_x = f"(({x_col}) - (((({x_col}) % {cell}) + {cell}) % {cell})) div {cell}"
    fd_y = f"(({y_col}) - (((({y_col}) % {cell}) + {cell}) % {cell})) div {cell}"
    cells = points.select(
        F.expr(fd_x).alias("cx"), F.expr(fd_y).alias("cy")
    ).distinct()
    offs = "array(-1, 0, 1)"
    nbrs = (
        cells.withColumn("ox", F.explode(F.expr(offs)))
        .withColumn("oy", F.explode(F.expr(offs)))
        .where("ox != 0 OR oy != 0")
        .select(
            F.col("cx").alias("sx"),
            F.col("cy").alias("sy"),
            (F.col("cx") + F.col("ox")).alias("dx"),
            (F.col("cy") + F.col("oy")).alias("dy"),
        )
    )
    occupied = cells.select(
        F.col("cx").alias("dx"), F.col("cy").alias("dy")
    )
    return nbrs.join(occupied, ["dx", "dy"])


def sql_occupied_cell_edges(
    points_sql: str,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> str:
    """DuckDB twin of :func:`occupied_cell_edges` (body fragment —
    selects (sx, sy, dx, dy))."""
    fd_x = f"(({x_col}) - (((({x_col}) % {cell}) + {cell}) % {cell})) // {cell}"
    fd_y = f"(({y_col}) - (((({y_col}) % {cell}) + {cell}) % {cell})) // {cell}"
    return (
        f"WITH pts AS ({points_sql}), "
        f"cells AS (SELECT DISTINCT {fd_x} AS cx, {fd_y} AS cy FROM pts), "
        f"nb AS (SELECT cx AS sx, cy AS sy, cx + ox AS dx, cy + oy AS dy "
        f"FROM cells, UNNEST([-1, 0, 1]) AS tx(ox), "
        f"UNNEST([-1, 0, 1]) AS ty(oy) WHERE ox <> 0 OR oy <> 0) "
        f"SELECT nb.sx, nb.sy, nb.dx, nb.dy FROM nb "
        f"JOIN cells o ON o.cx = nb.dx AND o.cy = nb.dy"
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Exact per-node triangle participation over an undirected graph
    given as DIRECTED (sx, sy, dx, dy) cell pairs (both directions
    present, as :func:`occupied_cell_edges` emits) — ``(cx, cy,
    n_triangles)``: how many triangles each occupied cell closes. The
    clustering-coefficient numerator, and on the density-surface cell
    graph a direct blob-compactness measure (interior cells close 6-8
    triangles, filament cells 0-2).

    Algorithm: canonicalize to u < v (lexicographic on the cell pair,
    halving the edge list), build wedges u<v<w by joining e1.v = e2.u
    (the ordering is free — e2 is canonical), close them against a
    third canonical edge (u, w). Two equi-join shuffles + one bounded
    ×3 corner explode + one groupBy; every join key is a cell pair,
    so skew is bounded by the max cell degree (≤ 8 here; cap or salt
    the key for general graphs with super-nodes)."""
    und = edges.where(
        (F.col("sx") < F.col("dx"))
        | ((F.col("sx") == F.col("dx")) & (F.col("sy") < F.col("dy")))
    ).select("sx", "sy", "dx", "dy")
    e1 = und.select(
        F.col("sx").alias("ux"), F.col("sy").alias("uy"),
        F.col("dx").alias("vx"), F.col("dy").alias("vy"),
    )
    e2 = und.select(
        F.col("sx").alias("vx"), F.col("sy").alias("vy"),
        F.col("dx").alias("wx"), F.col("dy").alias("wy"),
    )
    e3 = und.select(
        F.col("sx").alias("ux"), F.col("sy").alias("uy"),
        F.col("dx").alias("wx"), F.col("dy").alias("wy"),
    )
    tri = e1.join(e2, ["vx", "vy"]).join(e3, ["ux", "uy", "wx", "wy"])
    corners = tri.select(
        F.explode(
            F.array(
                F.struct(F.col("ux").alias("cx"), F.col("uy").alias("cy")),
                F.struct(F.col("vx").alias("cx"), F.col("vy").alias("cy")),
                F.struct(F.col("wx").alias("cx"), F.col("wy").alias("cy")),
            )
        ).alias("c")
    ).select("c.cx", "c.cy")
    return corners.groupBy("cx", "cy").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def sql_triangle_counts(edges_sql: str) -> str:
    """DuckDB twin of :func:`triangle_counts` over the same directed
    (sx, sy, dx, dy) edge-list SQL body."""
    return (
        f"WITH edges AS ({edges_sql}), "
        "und AS (SELECT sx, sy, dx, dy FROM edges "
        "WHERE sx < dx OR (sx = dx AND sy < dy)), "
        "tri AS (SELECT e1.sx AS ux, e1.sy AS uy, "
        "e1.dx AS vx, e1.dy AS vy, e2.dx AS wx, e2.dy AS wy "
        "FROM und e1 JOIN und e2 ON e1.dx = e2.sx AND e1.dy = e2.sy "
        "JOIN und e3 ON e3.sx = e1.sx AND e3.sy = e1.sy "
        "AND e3.dx = e2.dx AND e3.dy = e2.dy), "
        "corners AS (SELECT ux AS cx, uy AS cy FROM tri "
        "UNION ALL SELECT vx, vy FROM tri "
        "UNION ALL SELECT wx, wy FROM tri) "
        "SELECT cx, cy, COUNT(*) AS n_triangles "
        "FROM corners GROUP BY cx, cy"
    )


def multi_source_bfs(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 8,
) -> DataFrame:
    """Multi-source BFS — the DISTANCE TRANSFORM of a cell graph:
    exact hop distance from the NEAREST seed to every node reachable
    within ``max_hops``. seeds: (nx, ny) rows (hop 0 even if the
    seed is isolated — an isolated seed simply never expands). Same
    frontier/settled/anti-join rounds as :func:`bfs_hops` (which is
    the single-seed special case); the settled-first-wins anti-join
    is what makes the recorded hop the minimum over ALL seeds, not
    just all paths."""
    fwd = edges.select(
        F.col("sx").alias("ax"), F.col("sy").alias("ay"),
        F.col("dx").alias("bx"), F.col("dy").alias("by"),
    )
    rev = edges.select(
        F.col("dx").alias("ax"), F.col("dy").alias("ay"),
        F.col("sx").alias("bx"), F.col("sy").alias("by"),
    )
    und = (
        fwd.unionByName(rev)
        .where((F.col("ax") != F.col("bx")) | (F.col("ay") != F.col("by")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    settled = (
        seeds.select("nx", "ny")
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = settled.select("nx", "ny")
    for r in range(1, max_hops + 1):
        nbrs = (
            frontier.join(
                und,
                (F.col("nx") == F.col("ax")) & (F.col("ny") == F.col("ay")),
            )
            .select(F.col("bx").alias("nx"), F.col("by").alias("ny"))
            .distinct()
        )
        fresh = nbrs.join(
            settled.select("nx", "ny"), ["nx", "ny"], "left_anti"
        ).withColumn("hop", F.lit(r))
        settled = settled.unionByName(fresh).localCheckpoint(eager=True)
        frontier = fresh.select("nx", "ny")
    return settled.select(
        "nx", "ny", F.col("hop").cast("int").alias("hop")
    )


def sql_multi_source_bfs(
    edges_sql_body: str, seeds_sql_body: str, max_hops: int = 8
) -> str:
    """DuckDB twin — recursive CTE under UNION-distinct semantics
    seeded by the whole seed set; true distance = MIN(hop)."""
    return (
        f"WITH RECURSIVE e0 AS MATERIALIZED (SELECT DISTINCT ax, ay, "
        f"bx, by FROM (SELECT sx AS ax, sy AS ay, dx AS bx, dy AS by "
        f"FROM ({edges_sql_body}) "
        f"UNION ALL SELECT dx, dy, sx, sy FROM ({edges_sql_body})) u "
        f"WHERE ax <> bx OR ay <> by), "
        f"seeds AS MATERIALIZED (SELECT DISTINCT nx, ny "
        f"FROM ({seeds_sql_body})), "
        f"bfs (nx, ny, hop) AS ("
        f"SELECT nx, ny, 0 FROM seeds "
        f"UNION "
        f"SELECT e.bx, e.by, b.hop + 1 FROM bfs b "
        f"JOIN e0 e ON e.ax = b.nx AND e.ay = b.ny "
        f"WHERE b.hop < {max_hops}) "
        f"SELECT nx, ny, CAST(MIN(hop) AS INT) AS hop "
        f"FROM bfs GROUP BY nx, ny"
    )
