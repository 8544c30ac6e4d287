"""Connected components (operators/graph.py): hash-min label
propagation vs a serial union-find oracle."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.operators.graph import (
    connected_components,
)


def _uf_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id per component
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    # path-compress to true min (find already roots at min since we
    # always parent the larger root under the smaller)
    return {n: find(n) for n in parent}


def _run(spark, edges):
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"])
    )
    got = {
        r.node: r.comp
        for r in connected_components(df).collect()
    }
    return got


def test_cc_path_and_cycle(spark):
    # long path (worst diameter for hash-min) + separate cycle
    path = [(i, i + 1) for i in range(10, 20)]
    cycle = [(100, 101), (101, 102), (102, 100)]
    got = _run(spark, path + cycle)
    want = _uf_oracle(path + cycle)
    assert got == want
    assert got[19] == 10 and got[102] == 100


def test_cc_transitive_not_just_pairs(spark):
    # a~b, b~c, no a~c edge: all three one component
    got = _run(spark, [(1, 2), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_cc_star_and_selfloop_and_dup_edges(spark):
    edges = [(5, 1), (5, 2), (5, 3), (5, 5), (1, 5), (5, 1)]
    got = _run(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 5: 1}


def test_cc_string_ids(spark):
    got = _run(spark, [("b", "a"), ("c", "b"), ("x", "y")])
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_cc_random_vs_union_find(spark):
    import random

    rng = random.Random(7)
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(80)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _uf_oracle(edges)
