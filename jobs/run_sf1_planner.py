"""sf1 evidence: which physical strategy plan_pip_join picks for the
driver PIP shapes at 10× the gate scale (VERDICT r3 #5 asks for the
planner's reason string at sf1). Appends one JSON line per query
shape to jobs/sf1_planner.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from workstealing_spatial_join_spark.plans.planner import plan_pip_join  # noqa: E402
from workstealing_spatial_join_spark.session import get_spark  # noqa: E402
from workstealing_spatial_join_spark.sources import tables as TB  # noqa: E402

SF1 = os.environ.get("SF1_DIR", "/root/repo/bench_data/sf1")


def main():
    spark = get_spark("sf1-planner", cores=8, shuffle_partitions=16)
    pts = TB.customer_points(spark, SF1)
    rects = TB.supplier_rects(spark, SF1)
    polys = TB.rects_with_geom(rects)
    out = []
    t0 = time.time()
    df, plan = plan_pip_join(
        pts, polys, point_id="point_id", poly_id="rect_id",
        lon="lon", lat="lat", mode="count",
    )
    n = df.collect()[0][0]
    out.append({
        "ts": time.time(),
        "sf_dir": SF1,
        "shape": "pip_count(customer_points x supplier_rects)",
        "n_points": pts.count(),
        "n_polys": rects.count(),
        "strategy": plan.strategy,
        "reason": plan.reason,
        "join_count": n,
        "secs": round(time.time() - t0, 2),
    })
    with open("/root/repo/jobs/sf1_planner.jsonl", "a") as fh:
        for row in out:
            fh.write(json.dumps(row) + "\n")
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
