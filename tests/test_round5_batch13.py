"""Round-5 batch 13: Liang–Barsky segment×zone clip-fraction join
(lineal zonal statistics) and MOSS-style pairwise copy detection
(winnowing fingerprints → capped equi-join → shared counts)."""

from __future__ import annotations

import hashlib
from fractions import Fraction

from workstealing_spatial_join_spark.operators.lineclip import (
    CLIP_CELL,
    clip_fraction_join,
)
from workstealing_spatial_join_spark.operators.textops import (
    doc_copy_pairs,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

SCALE = 1 << 20


def _clip_ref(segs, zones):
    """Exact-Fraction Liang–Barsky reference: for every bbox-
    overlapping (seg, zone) pair, the clip interval [tlo, thi] on
    t ∈ [0,1] and floor((thi-tlo)·2^20). Degenerate axes follow the
    operator's convention: zero-d axis inside the band → [0,1], else
    empty. tlo == thi (grazing touch) IS emitted with fraction 0."""
    out = {}
    for seg_id, x1, y1, x2, y2 in segs:
        for zone_id, zminx, zminy, zmaxx, zmaxy in zones:
            lo, hi = Fraction(0), Fraction(1)
            dead = False
            for d, p, lo_b, hi_b in (
                (x2 - x1, x1, zminx, zmaxx),
                (y2 - y1, y1, zminy, zmaxy),
            ):
                if d == 0:
                    if not (lo_b <= p <= hi_b):
                        dead = True
                    continue
                t1 = Fraction(lo_b - p, d)
                t2 = Fraction(hi_b - p, d)
                if t1 > t2:
                    t1, t2 = t2, t1
                lo, hi = max(lo, t1), min(hi, t2)
            if dead or lo > hi:
                continue
            out[(seg_id, zone_id)] = int((hi - lo) * SCALE)
    return out


SEGS = [
    # fully inside zone 1
    (1, 10, 10, 90, 90),
    # crosses zone 1 (0..100 box): enters at t=1/4, exits t=3/4
    (2, -50, 50, 150, 50),
    # grazing touch: endpoint ON the boundary corner, rest outside
    (3, 100, 100, 200, 200),
    # degenerate point-segment inside zone 1 → fraction 1
    (4, 40, 40, 40, 40),
    # degenerate point-segment outside every zone → no row
    (5, 5000, 5000, 5000, 5000),
    # vertical segment through zone 1
    (6, 50, -100, 50, 300),
    # spans multiple grid cells (extent > CLIP_CELL/2 on both axes)
    (7, -3000, -3000, 6000, 6000),
    # horizontal, entirely left of every zone
    (8, -900, 50, -200, 50),
]
ZONES = [
    (1, 0, 0, 100, 100),
    # zone spanning a cell boundary, overlapping segs 2/6/7
    (2, -2000, -2000, 3000, 40),
]


def _mk_frames(spark):
    segs = spark.createDataFrame(
        SEGS, "seg_id long, x1 long, y1 long, x2 long, y2 long"
    )
    zones = spark.createDataFrame(
        ZONES,
        "zone_id long, zminx long, zminy long, zmaxx long, zmaxy long",
    )
    return segs, zones


def test_clip_matches_fraction_reference(spark):
    segs, zones = _mk_frames(spark)
    got = {
        (r["seg_id"], r["zone_id"]): r["frac_scaled"]
        for r in clip_fraction_join(segs, zones).collect()
    }
    ref = _clip_ref(SEGS, ZONES)
    assert got == ref
    # the conventions the module doc promises, pinned explicitly:
    assert ref[(1, 1)] == SCALE  # fully inside
    assert ref[(2, 1)] == SCALE // 2  # enters 1/4, exits 3/4
    assert ref[(3, 1)] == 0  # grazing touch emitted at 0
    assert ref[(4, 1)] == SCALE  # point inside → all of it inside
    assert (5, 1) not in ref and (5, 2) not in ref
    assert (8, 1) not in ref and (8, 2) not in ref


def test_clip_refpoint_dedup_no_distinct(spark):
    """Seg 7 × zone 2 share 2×2 covering cells — the pair must come
    out exactly once WITHOUT any distinct/dropDuplicates pass."""
    segs, zones = _mk_frames(spark)
    df = clip_fraction_join(segs, zones)
    rows = [r for r in df.collect() if r["seg_id"] == 7]
    assert sorted(r["zone_id"] for r in rows) == [1, 2]
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "Deduplicate" not in plan
    # seg 7's extent (9000) deliberately EXCEEDS the cell size, so
    # its covering is 3×3 cells — refpoint dedup must still emit the
    # pair exactly once (the ≤2×2 bound is a perf convention for the
    # production layers, not a correctness requirement)
    assert 6000 + 3000 > CLIP_CELL


def test_clip_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["seg_clip_zones"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0


K, W, CAP = 32, 16, 50


def _copy_pairs_ref(rows, k=K, w=W, cap=CAP, min_shared=2):
    """Plain-python winnowing selection → per-gram doc sets → cap →
    pairwise shared-fingerprint counts (distinct grams per doc)."""
    by_gram: dict[str, set[int]] = {}
    for doc_id, text in rows:
        if len(text) < k:
            continue
        encs = [
            hashlib.md5(text[p : p + k].encode()).hexdigest()
            + "|"
            + str(p + 1).zfill(12)
            for p in range(len(text) - k + 1)
        ]
        chosen = {min(encs[i : i + w]) for i in range(len(encs))}
        for c in chosen:
            by_gram.setdefault(c.split("|")[0], set()).add(doc_id)
    pairs: dict[tuple[int, int], int] = {}
    for docs in by_gram.values():
        if len(docs) > cap:
            continue
        ds = sorted(docs)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return {p: n for p, n in pairs.items() if n >= min_shared}


def test_copy_pairs_matches_python_reference(spark):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (1, base),
        (2, "PREFIX>> " + base),  # shifted copy — must pair with 1
        (3, base + " <<SUFFIX TAIL MORE WORDS HERE"),
        (4, "completely unrelated content that shares nothing at all x"),
        (5, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in doc_copy_pairs(df).collect()
    }
    ref = _copy_pairs_ref(rows)
    assert got == ref
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert not any(4 in p or 5 in p for p in got)


def test_copy_pairs_boilerplate_cap(spark):
    """A fingerprint selected in more docs than the cap contributes
    NO pairs: with cap=2 a 3-doc-shared gram is boilerplate."""
    text = "boilerplate header shared by every single document here!!"
    rows = [(i, text) for i in (1, 2, 3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert doc_copy_pairs(df, max_docs_per_gram=2).count() == 0
    # and with the cap admitted, all three pairs appear
    got = {
        (r["doc_a"], r["doc_b"])
        for r in doc_copy_pairs(df, max_docs_per_gram=3).collect()
    }
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_copy_pairs_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["doc_copy_pairs"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
