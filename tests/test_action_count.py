"""Driver-action budget for query CONSTRUCTION (VERDICT r3 #7).

Building a lazy DataFrame must not run Spark jobs. Round 3's
embedding_neardup / cosine_topk_lsh sniffed the vector dimension with
``.first()`` — one extra job per query build. Round 4 derives the
hyperplanes executor-side from the first Arrow batch's vector width
(deterministic — same planes on every executor), so construction is
job-free. This test pins that by reading the DAGScheduler's job
counter around the build.

(minhash_dedup and hash_neardup intentionally DO run jobs at build
time — the eager signature-cache materialization — so they are not
under this gate.)
"""

from __future__ import annotations

import pytest

from workstealing_spatial_join_spark.operators.dedup import embedding_neardup
from workstealing_spatial_join_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)


def _job_counter(spark) -> int:
    # DAGScheduler.nextJobId is the monotone job-id source; py4j
    # surfaces the AtomicInteger as a plain int snapshot
    return int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())


@pytest.fixture()
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_embedding_neardup_build_runs_no_jobs(spark, emb):
    # eager=False: pure pipeline composition — zero jobs proves the
    # r3 .first() dim sniff is gone
    before = _job_counter(spark)
    df = embedding_neardup(emb, threshold=0.4, eager=False)
    assert _job_counter(spark) == before, "query build launched a job"
    assert df.columns == ["vec_id_a", "vec_id_b", "cosine"]


def test_embedding_neardup_eager_build_is_bounded(spark, emb):
    # default: the documented bucket-frame materialization only (AQE
    # splits the one count into a handful of per-stage jobs — bounded,
    # not per-row, and no hidden .first() on top)
    before = _job_counter(spark)
    embedding_neardup(emb, threshold=0.4)
    after = _job_counter(spark)
    assert before < after <= before + 6


def test_cosine_topk_lsh_build_runs_no_jobs(spark, emb):
    before = _job_counter(spark)
    df = cosine_topk_lsh(emb.where("vec_id < 5"), emb, k=3)
    assert _job_counter(spark) == before, "query build launched a job"
    assert df.columns == ["query_id", "neighbor_id", "rank", "cosine"]


def test_cosine_topk_bruteforce_build_runs_no_jobs(spark, emb):
    before = _job_counter(spark)
    cosine_topk_bruteforce(emb.where("vec_id < 5"), emb, k=3)
    assert _job_counter(spark) == before, "query build launched a job"
