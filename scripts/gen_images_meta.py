"""Materialize the images METADATA fixture (bench_data/images_meta):
the input_hint table shape (image_id, bytes, w, h, fmt, caption,
phash, lon, lat) with bytes elided — deterministic seeded generator
(sources/fixtures._img_row), written once so the Spark query and the
DuckDB oracle read the SAME rows and only the tile arithmetic is
recomputed independently."""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from workstealing_spatial_join_spark.sources.fixtures import images_pdf

OUT = "/root/repo/bench_data/images_meta"
N = 20_000


def main() -> None:
    pdf = images_pdf(N, with_bytes=False)
    # bytes are elided, so real phash64 is unavailable; stand in a
    # deterministic synthetic hash with duplicate groups (every 7
    # consecutive images share one) so distinct-count aggregates over
    # the column are non-trivial.
    pdf["phash"] = [
        ((i // 7) * 2654435761) % (1 << 63) for i in range(len(pdf))
    ]
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        f"{OUT}/part-00000.parquet",
    )
    print(f"wrote {len(pdf)} rows to {OUT}")


if __name__ == "__main__":
    main()
