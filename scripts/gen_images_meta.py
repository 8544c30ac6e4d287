"""Materialize the images METADATA fixture (bench_data/images_meta):
the input_hint table shape (image_id, bytes, w, h, fmt, caption,
phash, lon, lat) with bytes elided — deterministic seeded generator
(sources/fixtures._img_row), written once so the Spark query and the
DuckDB oracle read the SAME rows and only the tile arithmetic is
recomputed independently."""

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from workstealing_spatial_join_spark.sources.fixtures import images_pdf

OUT = "/root/repo/bench_data/images_meta"
N = 20_000

# bit-flip count per member position within a 7-image group: exact
# dups (0 flips) AND near-dups at hamming 1-3 from the base, so both
# distinct-count aggregates and the pigeonhole hamming join have
# non-trivial structure. Pairs between two flipped members can land
# above the join's max_hamming — also wanted (true negatives that
# still share chunks).
_FLIPS = [0, 1, 2, 3, 2, 1, 0]


def _phash(i: int) -> int:
    """Deterministic 63-bit perceptual-hash stand-in: per-group base
    from md5, member-specific distinct bit flips. 63 bits (top bit
    clear) keeps >> arithmetic identical in Spark and DuckDB."""
    group, member = divmod(i, 7)
    base = (
        int.from_bytes(hashlib.md5(f"g{group}".encode()).digest()[:8], "big")
        & ((1 << 63) - 1)
    )
    h = base
    flipped: set[int] = set()
    j = 0
    while len(flipped) < _FLIPS[member]:
        pos = (
            int.from_bytes(
                hashlib.md5(f"g{group}m{member}f{j}".encode()).digest()[:2],
                "big",
            )
            % 63
        )
        j += 1
        if pos in flipped:
            continue
        flipped.add(pos)
        h ^= 1 << pos
    return h


def main() -> None:
    pdf = images_pdf(N, with_bytes=False)
    # bytes are elided, so real phash64 is unavailable; stand in the
    # deterministic synthetic hash family above.
    pdf["phash"] = [_phash(i) for i in range(len(pdf))]
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        f"{OUT}/part-00000.parquet",
    )
    print(f"wrote {len(pdf)} rows to {OUT}")


if __name__ == "__main__":
    main()
