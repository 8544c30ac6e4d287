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
