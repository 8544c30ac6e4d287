"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard verification, embedding-cosine
near-dup.

Scale shape (the only one that survives 100 TB): every candidate
generation step is an EQUI-JOIN on a bucket key (band hash / simhash
chunk / hyperplane bucket) — never an all-pairs comparison; exact
verification runs only within buckets. Signatures are computed in
vectorized pandas UDFs (Arrow-batched); bucketing/grouping is pure
Catalyst.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- exact


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate grouping by md5(text): returns
    ``(doc_id, canonical_id, group_size)`` — canonical is the min id
    per hash group. Map-side partial agg + one shuffle on the hash."""
    h = docs.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("h")
    )
    groups = h.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        h.join(groups, on="h")
        .select("doc_id", "canonical_id", "group_size")
    )


# -------------------------------------------------------------- minhash

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_SHINGLE_BASE = np.uint64(1099511628211)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Unique hashes of the char k-shingle set — fully vectorized:
    sliding byte windows × polynomial powers, wrapping uint64
    arithmetic (no Python-level per-shingle loop)."""
    s = (text or "").lower().encode("utf-8", "ignore")
    if len(s) < k:
        s = s.ljust(k, b"_")
    data = np.frombuffer(s, dtype=np.uint8).astype(np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(data, k)
    pows = np.empty(k, dtype=np.uint64)
    pows[0] = 1
    for i in range(1, k):
        pows[i] = pows[i - 1] * _SHINGLE_BASE
    with np.errstate(over="ignore"):
        h = (windows * pows[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(h) >> np.uint64(1)  # top bit clear keeps mod-p math exact


def minhash_signature_udf(num_perm: int = 64, shingle_k: int = 5, seed: int = 42):
    a, b = _perm_params(num_perm, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(text: pd.Series) -> pd.Series:
        out = []
        for s in text:
            hs = _shingle_hashes(s or "", shingle_k)
            # (a*h + b) mod p, min over shingles, per permutation
            vals = (a[None, :] * hs[:, None] + b[None, :]) % _MERSENNE
            out.append(vals.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return sig


def minhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs by MinHash + banded LSH + exact Jaccard
    verify. Returns ``(doc_id_a, doc_id_b, jaccard)`` with a < b and
    jaccard ≥ threshold.

    Plan: signature UDF → explode band hashes → groupBy band bucket
    (self equi-join inside buckets only) → distinct candidate pairs →
    exact Jaccard verify UDF.
    """
    rows_per_band = num_perm // bands
    sig_udf = minhash_signature_udf(num_perm, shingle_k)
    signed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        sig_udf(F.col(text_col)).alias("sig"),
    )
    banded = signed.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda band: F.hash(
                    band, F.slice("sig", band * rows_per_band + 1, rows_per_band)
                ).cast("long"),
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )
    texts = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    pairs = (
        cand.join(texts.withColumnsRenamed({"doc_id": "doc_id_a", "text": "text_a"}), "doc_id_a")
        .join(texts.withColumnsRenamed({"doc_id": "doc_id_b", "text": "text_b"}), "doc_id_b")
    )
    jac = ngram_jaccard_udf(shingle_k)
    return (
        pairs.withColumn("jaccard", jac(F.col("text_a"), F.col("text_b")))
        .where(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


def ngram_jaccard_udf(k: int = 5):
    @F.pandas_udf(T.DoubleType())
    def jac(a: pd.Series, b: pd.Series) -> pd.Series:
        # a doc participates in many candidate pairs — shingle each
        # unique text once per batch
        codes_a, uniq_a = pd.factorize(a)
        codes_b, uniq_b = pd.factorize(b)
        sh_a = [_shingle_hashes(t, k) for t in uniq_a]
        sh_b = [_shingle_hashes(t, k) for t in uniq_b]
        out = np.zeros(len(a))
        for i in range(len(a)):
            sa = sh_a[codes_a[i]]
            sb = sh_b[codes_b[i]]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            out[i] = inter / union if union else 0.0
        return pd.Series(out)

    return jac


# -------------------------------------------------------------- simhash


@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (deterministic md5-based
    token hashes so results are stable across Python processes)."""
    import hashlib

    out = np.zeros(len(text), dtype=np.int64)
    for i, s in enumerate(text):
        tokens = (s or "").lower().split()
        if not tokens:
            continue
        acc = np.zeros(64, dtype=np.int64)
        for tok in tokens:
            h = np.uint64(
                int.from_bytes(
                    hashlib.md5(tok.encode("utf-8", "ignore")).digest()[:8], "little"
                )
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        val = 0
        for b in range(64):
            if acc[b] > 0:
                val |= 1 << b
        out[i] = np.int64(np.uint64(val))
    return pd.Series(out)


def simhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance ≤ max_hamming.
    LSH: split the 64-bit hash into (max_hamming+1) chunks — any pair
    within distance max_hamming shares at least one exact chunk
    (pigeonhole), so candidates come from chunk equi-joins only."""
    nchunks = max_hamming + 1
    width = 64 // nchunks
    hashed = docs.select(
        F.col(id_col).alias("doc_id"), simhash64(F.col(text_col)).alias("sh")
    )
    mask = (1 << width) - 1
    chunked = hashed.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("sh", c * width).bitwiseAND(F.lit(mask))
                    for c in range(nchunks)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.chunk_idx") == F.col("b.chunk_idx"),
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_id_a", "doc_id_b", "hamming")
    )


# -------------------------------------- embedding cosine near-duplicate


def embedding_neardup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs by random-hyperplane LSH buckets +
    exact cosine verify: ``(vec_id_a, vec_id_b, cosine)``."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim)).astype(np.float64)

    @F.pandas_udf(T.LongType())
    def bucket(v: pd.Series) -> pd.Series:
        mat = np.asarray(v.tolist(), dtype=np.float64)
        signs = (mat @ planes.T) > 0
        vals = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        return pd.Series(vals.astype(np.int64))

    vecs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    cand = a.join(
        b,
        on=[
            F.col("a.bucket") == F.col("b.bucket"),
            F.col("a.vec_id") < F.col("b.vec_id"),
        ],
    ).select(
        F.col("a.vec_id").alias("vec_id_a"),
        F.col("b.vec_id").alias("vec_id_b"),
        F.col("a.vec").alias("vec_a"),
        F.col("b.vec").alias("vec_b"),
    )

    @F.pandas_udf(T.DoubleType())
    def cosine(va: pd.Series, vb: pd.Series) -> pd.Series:
        ma = np.asarray(va.tolist(), dtype=np.float64)
        mb = np.asarray(vb.tolist(), dtype=np.float64)
        num = (ma * mb).sum(axis=1)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(np.where(den > 0, num / den, 0.0))

    return (
        cand.withColumn("cosine", cosine(F.col("vec_a"), F.col("vec_b")))
        .where(F.col("cosine") >= threshold)
        .select("vec_id_a", "vec_id_b", "cosine")
    )
