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
