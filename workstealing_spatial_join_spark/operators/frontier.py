"""Pareto-front (skyline) selection — the "best tradeoff set" query
a training-data pipeline runs to pick documents/users/images that are
not beaten on BOTH of two axes at once (e.g. quality vs length,
spend vs activity): a row is on the front iff no other row is ≥ on
both dimensions and > on at least one (max–max dominance).

Scale shape — the textbook formulation is a quadratic NOT EXISTS
self-join; the operator instead runs the sort-based skyline TWICE:

1. local prune: within each input partition, sort by x descending and
   keep a row only if every strictly-greater-x row has smaller y and
   no same-x row has larger y — two window functions PARTITIONED BY
   ``spark_partition_id()``, so no shuffle at all. Dominance within a
   partition implies global dominance, and dominance is transitive
   through the pruned witness (if q dominated p and r pruned q, then
   r ≥ q ≥ p with a strict coordinate carried through), so the local
   pass never discards a global-front row and every survivor set
   still contains a dominator for every globally-dominated survivor.
2. global pass: the same two windows WITHOUT a partition key over the
   survivors — a single-task window, safe because the survivor set is
   at most (per-partition front size × partitions), tiny next to the
   input (fronts of n random points have O(log n) expected size).

Both dimensions must be integral (the strict-x frame is a RANGE
``[-inf, -1]`` over a DESCENDING order — exact only on integers; the
repo's cents/count conventions provide that).

The DuckDB oracle is the quadratic dominance anti-join — a genuinely
different plan, so it cross-checks the two-stage prune rather than
mirroring it.

Reference parity note: the reference engine has no skyline operator;
this extends §2.5's top-k family (selection without a single total
order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _prune(df: DataFrame, x: str, y: str, part_cols: list) -> DataFrame:
    # max y over rows with STRICTLY greater x: descending RANGE frame
    # ending 1 before the current value ⇒ rows with x' ≥ x+1 (integer
    # dimensions make "≥ x+1" ≡ "> x"); max y over the same-x peer
    # group catches x'=x, y'>y dominators.
    w_gt = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(x).desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy(*part_cols, x)
    return (
        df.withColumn("_mgt", F.max(y).over(w_gt))
        .withColumn("_meq", F.max(y).over(w_eq))
        .where(
            (F.col("_mgt").isNull() | (F.col("_mgt") < F.col(y)))
            & (F.col("_meq") <= F.col(y))
        )
        .drop("_mgt", "_meq")
    )


def pareto_front_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Rows of ``df`` not max–max-dominated on integer dimensions
    ``(x, y)``. Duplicate (x, y) points do not dominate each other —
    all copies of a front point are returned."""
    local = _prune(
        df.withColumn("_pid", F.spark_partition_id()), x, y, ["_pid"]
    ).drop("_pid")
    return _prune(local, x, y, [])


def sql_pareto_front_2d(
    body_sql: str, x: str, y: str, cols: str = "*"
) -> str:
    """DuckDB twin: quadratic NOT EXISTS dominance filter over the
    same derivation ``body_sql`` (materialized once)."""
    return (
        f"WITH base AS MATERIALIZED ({body_sql}) "
        f"SELECT {cols} FROM base p WHERE NOT EXISTS ("
        f"SELECT 1 FROM base q WHERE q.{x} >= p.{x} AND q.{y} >= p.{y} "
        f"AND (q.{x} > p.{x} OR q.{y} > p.{y}))"
    )
