"""Round-5 batch 8: exact k-means step over quantized embeddings,
integer-PMI collocation top-k, ranked phash hamming kNN. Unit
semantics on crafted + random inputs plus plan gates (the driver
contract + scripts/check_contract.py cover sf0.01 oracle parity)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from workstealing_spatial_join_spark.operators.dedup import phash_knn
from workstealing_spatial_join_spark.operators.similarity import (
    kmeans_step_int,
)
from workstealing_spatial_join_spark.operators.textops import pmi_top_pairs
from workstealing_spatial_join_spark.plans.planner import audit_plan

# ----------------------------------------------------- kmeans step


def _kmeans_ref(vecs, k, quant=1024):
    q = {
        i: [math.floor(float(x) * quant) for x in v] for i, v in vecs.items()
    }
    seeds = {i: q[i] for i in q if i < k}
    assign = {}
    for i, qe in q.items():
        best = min(
            (sum((a - b) * (a - b) for a, b in zip(qe, qs)), sid)
            for sid, qs in seeds.items()
        )
        assign[i] = best[1]
    out = {}
    for i, c in assign.items():
        for d, v in enumerate(q[i], start=1):
            n, s = out.get((c, d), (0, 0))
            out[(c, d)] = (n + 1, s + v)
    return {
        (c, d, n, s, math.floor(s / n)) for (c, d), (n, s) in out.items()
    }


def test_kmeans_step_matches_reference(spark):
    random.seed(5)
    vecs = {
        i: [random.uniform(-1, 1) for _ in range(6)] for i in range(60)
    }
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()], schema
    )
    got = {
        tuple(r) for r in kmeans_step_int(df, k=4).collect()
    }
    # python reference must quantize the FLOAT32 values the engine saw
    import struct

    f32 = {
        i: [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        for i, v in vecs.items()
    }
    assert got == _kmeans_ref(f32, 4)


def test_kmeans_step_tie_breaks_on_lower_seed(spark):
    # two identical seeds: every point must land on seed 0
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [0.5, 0.5])]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = kmeans_step_int(df, k=2).collect()
    clusters = {r["cluster"] for r in out}
    assert clusters == {0}
    n = {r["n"] for r in out}
    assert n == {3}


# ------------------------------------------------------------- PMI


def test_pmi_top_pairs_matches_brute_force(spark):
    corpus = [
        (1, "alpha beta gamma"),
        (2, "alpha beta"),
        (3, "alpha delta"),
        (4, "beta gamma gamma"),  # duplicate token counts once per doc
        (5, "epsilon zeta"),
        (6, ""),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = [tuple(r) for r in pmi_top_pairs(df, k=5).collect()]
    # brute force
    toks = {d: sorted(set(t.lower().split())) for d, t in corpus}
    nd = len(corpus)
    uni = {}
    for tk in toks.values():
        for w in tk:
            uni[w] = uni.get(w, 0) + 1
    pairs = {}
    for tk in toks.values():
        for i in range(len(tk)):
            for j in range(i + 1, len(tk)):
                pairs[(tk[i], tk[j])] = pairs.get((tk[i], tk[j]), 0) + 1
    scored = sorted(
        (
            (-(c * nd * 1_000_000 // (uni[a] * uni[b])), a, b, c)
            for (a, b), c in pairs.items()
        )
    )[:5]
    want = [(a, b, c, -s) for s, a, b, c in scored]
    assert got == want
    # the epsilon-zeta pair (each word in exactly one doc) must rank top
    assert got[0][:2] == ("epsilon", "zeta")


# ------------------------------------------------------- phash kNN


def test_phash_knn_brute_force_and_contract(spark):
    # hashes engineered so some have >k neighbors within radius and
    # ties exist at equal distance
    hashes = [
        (1, 0b0000),
        (2, 0b0001),
        (3, 0b0010),
        (4, 0b0100),
        (5, 0b1111000),
        (6, 0b0111),
    ]
    df = spark.createDataFrame(hashes, "image_id long, phash long")
    got = {
        (r["image_id"], r["neighbor_id"], r["hamming"], r["rk"])
        for r in phash_knn(df, k=2, max_hamming=2).collect()
    }
    # brute force
    want = set()
    for i, hi in hashes:
        cand = sorted(
            (bin(hi ^ hj).count("1"), j)
            for j, hj in hashes
            if j != i and bin(hi ^ hj).count("1") <= 2
        )
        for rk, (d, j) in enumerate(cand[:2], start=1):
            want.add((i, j, d, rk))
    assert got == want
    # image 5 is isolated — no rows for it
    assert not any(r[0] == 5 for r in got)


# ------------------------------------------------------- plan gates


def test_batch8_plan_budgets(spark):
    """kmeans (higher-order JVM fold), PMI and phash kNN are all pure
    Catalyst: zero Arrow / zero row-at-a-time Python nodes."""
    import __spark_entry__ as E

    qs = E.queries()
    sf = "/root/testdata/sf0.001"
    for name in ("kmeans_step", "doc_pmi_top", "phash_knn"):
        audit = audit_plan(qs[name](spark, sf))
        assert audit["python_nodes"]["ArrowEvalPython"] == 0, name
        assert audit["python_nodes"]["BatchEvalPython"] == 0, name
