"""Snapshot reconciliation (CDC diff): classify every key across two
table snapshots as inserted / deleted / updated — the change-data-
capture primitive behind incremental pipeline backfills and
anti-entropy repair (what Delta/Iceberg's `MERGE` computes before it
writes, and what a cross-region table audit runs nightly).

The diff is ONE full-outer join on the key plus a column-wise
payload comparison — no hashing round trip, so a mismatch is
attributable to the column that caused it. Unchanged keys are
filtered OUT (at 10^12 rows the unchanged set is ~all of it; a diff
that materializes 'same' rows is a full table copy).

Scale shape: one shuffle of each snapshot on the key (or zero, if
both sides are bucketed by key on disk — sources/bucketed.py); the
payload compare is map-side. Skewed keys don't arise: the join key
is the primary key, unique on both sides by contract.

Null-safe equality (`<=>` / IS NOT DISTINCT FROM) does the payload
compare so NULL column values diff correctly in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    payload_cols: list[str],
) -> DataFrame:
    """Returns (key, change) with change ∈ {'insert','delete',
    'update'} — keys equal on every payload column are absent.
    Both snapshots must be unique on ``key``."""
    o = old.select(
        F.col(key).alias("k"),
        *[F.col(c).alias(f"o_{c}") for c in payload_cols],
    ).withColumn("in_old", F.lit(True))
    n = new.select(
        F.col(key).alias("k"),
        *[F.col(c).alias(f"n_{c}") for c in payload_cols],
    ).withColumn("in_new", F.lit(True))
    j = o.join(n, "k", "full_outer")
    same = F.lit(True)
    for c in payload_cols:
        same = same & F.expr(f"o_{c} <=> n_{c}")
    change = (
        F.when(F.col("in_old").isNull(), F.lit("insert"))
        .when(F.col("in_new").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(F.col("k").alias(key), "change")
    )


def sql_snapshot_diff(
    old_sql: str,
    new_sql: str,
    key: str,
    payload_cols: list[str],
) -> str:
    """DuckDB twin of :func:`snapshot_diff`."""
    o_cols = ", ".join(f"{c} AS o_{c}" for c in payload_cols)
    n_cols = ", ".join(f"{c} AS n_{c}" for c in payload_cols)
    same = " AND ".join(
        f"(o.o_{c} IS NOT DISTINCT FROM n.n_{c})" for c in payload_cols
    )
    return (
        f"WITH o AS (SELECT {key} AS k, {o_cols}, TRUE AS in_old "
        f"FROM ({old_sql}) s), "
        f"n AS (SELECT {key} AS k, {n_cols}, TRUE AS in_new "
        f"FROM ({new_sql}) s), "
        f"j AS (SELECT COALESCE(o.k, n.k) AS k, "
        f"CASE WHEN o.in_old IS NULL THEN 'insert' "
        f"WHEN n.in_new IS NULL THEN 'delete' "
        f"WHEN NOT ({same}) THEN 'update' END AS change "
        f"FROM o FULL OUTER JOIN n ON o.k = n.k) "
        f"SELECT k AS {key}, change FROM j WHERE change IS NOT NULL"
    )
