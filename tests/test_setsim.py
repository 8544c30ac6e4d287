"""Exact set-similarity join (AllPairs prefix filtering) — the
lossless-candidate-generation property is the whole point, so the
core test is equality with a brute-force all-pairs computation."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.operators.setsim import setsim_join

SF001 = "/root/testdata/sf0.001"


def _brute(sets: dict[int, set], num: int, den: int):
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and den * inter >= num * union:
            out[(a, b)] = (inter, union)
    return out


def _run(spark, sets: dict[int, set], num: int, den: int):
    rows = [(k, " ".join(sorted(v))) for k, v in sets.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): (r.inter_cnt, r.union_cnt)
        for r in setsim_join(df, num=num, den=den).collect()
    }
    assert got == _brute(sets, num, den)


def test_setsim_matches_bruteforce_random(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(40)]
    sets = {
        i: set(rng.sample(vocab, rng.randint(1, 25))) for i in range(60)
    }
    # clone a few docs with small edits so high-Jaccard pairs exist
    for i in range(5):
        s = set(sets[i])
        if len(s) > 3:
            s.pop()
        s.add(f"extra{i}")
        sets[100 + i] = s
    _run(spark, sets, 1, 2)


def test_setsim_thresholds_and_edges(spark):
    sets = {
        1: {"a", "b", "c", "d"},
        2: {"a", "b", "c", "d"},          # identical → J=1
        3: {"a", "b", "c", "e"},          # J=3/5 with 1
        4: {"z"},                         # singleton
        5: {"z"},                         # identical singleton pair
        6: {"q", "r"},                    # disjoint from all above
    }
    for num, den in [(1, 2), (3, 5), (4, 5), (1, 1)]:
        _run(spark, sets, num, den)


def test_setsim_rejects_bad_threshold(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        setsim_join(df, num=3, den=2)


def test_setsim_driver_query_pure_catalyst(spark):
    """Gram hashing, prefix filter, candidate join, and verify are
    all Catalyst — zero Python nodes."""
    import __spark_entry__ as E

    df = E.q_setsim_exact_pairs(spark, SF001)
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in txt and "BatchEvalPython" not in txt


def test_setsim_gram_query_agrees_with_exact_jaccard(spark):
    """Driver-query pairs recomputed from raw gram sets: every
    reported (inter,union) is the true one and the threshold holds."""
    import __spark_entry__ as E
    from workstealing_spatial_join_spark.operators.dedup import (
        wordgram_hashes_col,
    )
    from workstealing_spatial_join_spark.sources import tables as TB

    pairs = E.q_setsim_exact_pairs(spark, SF001).collect()
    grams = {
        r.doc_id: set(r.g)
        for r in TB.load(spark, SF001, "documents")
        .select("doc_id", wordgram_hashes_col(F.col("text"), 4).alias("g"))
        .collect()
    }
    assert pairs, "fixture corpus should contain near-dup pairs"
    for r in pairs:
        inter = len(grams[r.id_a] & grams[r.id_b])
        union = len(grams[r.id_a] | grams[r.id_b])
        assert (r.inter_cnt, r.union_cnt) == (inter, union)
        assert 2 * inter >= union
