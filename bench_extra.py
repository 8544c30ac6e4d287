"""Optimization-round measurement harness (guide §1) — NOT the frozen
bench.py. Isolates each declared query with the noop sink so the
computation is timed without the sink, records .explain("formatted")
to plans/r06/, and supports arbitrary rep counts.

Usage:
  python bench_extra.py [--tag before|after] [--reps N] [--explain]
                        [--sf DIR] [query ...]

Prints one line per query: name, per-rep seconds.  With --explain the
formatted plan is written to plans/r06/<query>_<tag>.txt.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from workstealing_spatial_join_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "pip_count",
    "rect_join_count",
    "rect_intersection_numpoints",
    "concave_intersection_numpoints",
    "q1_pricing",
    "q6_revenue",
    "exact_dedup",
    "token_count",
    "lang_id",
    "ann_cosine_topk",
    "minhash_neardup",
    "tile_density_rollup",
    "events_asof",
    "events_hll_users",
    "decontam_overlap",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--tag", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    names = args.queries or BENCH_QUERIES

    spark = get_spark("bench-extra", cores=args.cpus,
                      shuffle_partitions=args.cpus)
    qs = E.queries()
    from workstealing_spatial_join_spark.operators.dedup import (
        release_dedup_caches,
    )

    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "plans", "r06")
    os.makedirs(plan_dir, exist_ok=True)

    for name in names:
        fn = qs[name]
        times = []
        for r in range(args.reps):
            release_dedup_caches()
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        if args.explain and args.tag:
            df = fn(spark, args.sf)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
            text = df._jdf.queryExecution().explainString(
                mode.fromString("formatted"))
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"),
                      "w") as fh:
                fh.write(text)
        print(f"{name:36s} {times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
