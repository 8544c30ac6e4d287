"""Text analytics for training-data pipelines over the `documents`
table — language-ID, quality scoring, token counting, fingerprinting.

Everything here is Catalyst built-ins where possible (JVM-side,
codegen'd, SQL-oracle-checkable); only the rolling-hash fingerprint
needs a pandas UDF. Each helper returns the expressions so callers
compose them into selects (no hidden actions)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Stopword markers per language for the n-gram/stopword heuristic
# language ID. Deliberately tiny and frozen so the identical rule is
# expressible in the DuckDB oracle SQL.
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " de ", " que "],
}

TOKEN_SPLIT_RE = r"\s+"

from workstealing_spatial_join_spark.functions.exprs import named_colfn  # noqa: E402


@named_colfn
def token_count_col(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, TOKEN_SPLIT_RE))
    )


# GPT-2-style pretokenizer, restricted to the regex subset Java
# (Spark) and RE2 (DuckDB) treat IDENTICALLY: ordered alternation of
# ASCII contractions, space-prefixed letter runs, digit runs,
# punctuation runs, then residual whitespace. (The original's
# lookahead \s+(?!\S) is not RE2-expressible; whitespace between
# tokens is absorbed by the leading ' ?' of the following token, so
# only trailing/blank whitespace matches the last branch.)
BPE_TOKEN_RE = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|\s+"


@named_colfn
def bpe_token_count_col(text: Column) -> Column:
    """BPE-ish token count: non-overlapping matches of the GPT-2-style
    pretokenizer regex (the unit a byte-pair encoder would split
    further). Pure Catalyst (regexp_count, JVM codegen)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def lang_score_col(text: Column, lang: str) -> Column:
    """Occurrences of the language's marker words (padded match)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    score = F.lit(0)
    for marker in LANG_MARKERS[lang]:
        # occurrences = (len(s) - len(replace(s, marker, ''))) / len(marker)
        score = score + (
            (F.length(padded) - F.length(F.replace(padded, F.lit(marker), F.lit(""))))
            / F.lit(len(marker))
        ).cast("int")
    return score


@named_colfn
def lang_id_col(text: Column) -> Column:
    """argmax language by marker score; 'und' when all zero. Ties
    break by language code order (deterministic, oracle-matching)."""
    result = F.lit("und")
    best = F.lit(0)
    for lang in sorted(LANG_MARKERS):
        score = lang_score_col(text, lang)
        is_better = score > best
        result = F.when(is_better, F.lit(lang)).otherwise(result)
        best = F.when(is_better, score).otherwise(best)
    return result


@named_colfn
def quality_score_col(text: Column) -> Column:
    """Heuristic quality in [0,1]: length factor × alpha ratio ×
    mean-word-length sanity. Pure arithmetic (oracle-expressible)."""
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z ]", ""))
    toks = token_count_col(text)
    len_factor = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    mean_wl = F.when(toks > 0, n / toks).otherwise(F.lit(0.0))
    wl_sane = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return F.round(len_factor * alpha_ratio * wl_sane, 6)


def ngram_jaccard_cols(a: Column, b: Column, k: int = 3) -> Column:
    """Exact n-gram Jaccard similarity as pure Catalyst higher-order
    functions (transform/sequence/substr + array_intersect) — zero
    Python, SQL-oracle-expressible. For the hashed-shingle UDF variant
    used inside MinHash verification see operators/dedup.py."""

    def shingles(s: Column) -> Column:
        n = F.greatest(F.length(s) - F.lit(k - 1), F.lit(1))
        return F.array_distinct(
            F.transform(F.sequence(F.lit(1), n), lambda i: s.substr(i, F.lit(k)))
        )

    sa = shingles(a)
    sb = shingles(b)
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(sa) + F.size(sb) - inter
    return F.round(
        F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)), 6
    )


def ngram_repetition_cols(text: Column, k: int = 3) -> tuple[Column, Column, Column]:
    """Gopher-style repetition quality signal: how much of a document
    is repeated word n-grams. Returns ``(n_ngrams, n_distinct,
    rep_ratio)`` where rep_ratio = (n_ngrams - n_distinct) / n_ngrams
    (0.0 for docs shorter than k words). Pure Catalyst higher-order
    functions (split/sequence/transform/array_distinct) — zero
    Python, per-row linear, no shuffle; the ratio is an exact
    division of the two integer counts so the SQL twin is
    bit-identical."""
    words = F.split(F.trim(text), TOKEN_SPLIT_RE)
    n_grams = F.greatest(F.size(words) - F.lit(k - 1), F.lit(0))
    grams = F.when(
        n_grams > 0,
        F.transform(
            F.sequence(F.lit(0), n_grams - 1),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + F.lit(j + 1)) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_distinct = F.size(F.array_distinct(grams))
    ratio = F.when(
        n_grams > 0,
        (n_grams - n_distinct).cast("double") / n_grams.cast("double"),
    ).otherwise(F.lit(0.0))
    return n_grams.cast("long"), n_distinct.cast("long"), ratio


@F.pandas_udf(T.LongType())
def fingerprint64(text: pd.Series) -> pd.Series:
    """Deterministic 64-bit rolling-hash document fingerprint
    (FNV-style polynomial, base 1099511628211, wrapping mod 2^64),
    SQL-reproducible (HUGEINT list_reduce in the oracle). Vectorized:
    the rolling recurrence h_n = C·B^n + Σ b_i·B^(n-1-i) unrolls into
    one wrapping dot product per doc — the only Python loop is over
    the power table (max doc length)."""
    base = np.uint64(1099511628211)
    seed = np.uint64(14695981039346656037)
    # nulls normalize to "" BEFORE factorize (code -1 would wrap to
    # the last unique's fingerprint; the oracle COALESCEs to '')
    codes, uniques = pd.factorize(text.fillna(""))
    bufs = [(s or "").encode("utf-8", "ignore") for s in uniques]
    maxlen = max((len(b) for b in bufs), default=0)
    pows = np.empty(maxlen + 1, dtype=np.uint64)
    pows[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(1, maxlen + 1):
            pows[i] = pows[i - 1] * base
        vals = np.empty(len(uniques), dtype=np.uint64)
        for u, buf in enumerate(bufs):
            n = len(buf)
            if n == 0:
                vals[u] = seed
                continue
            data = np.frombuffer(buf, dtype=np.uint8).astype(np.uint64)
            # wrapping add is associative mod 2^64 — sum order free
            vals[u] = seed * pows[n] + (data * pows[n - 1::-1]).sum()
    return pd.Series(vals[codes].astype(np.int64))


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        "*",
        token_count_col(t).alias("token_count"),
        lang_id_col(t).alias("lang_pred"),
        quality_score_col(t).alias("quality"),
        fingerprint64(t).alias("fingerprint"),
    )


# ------------------------------------------------- TF-IDF top terms


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by tf·(N/df).

    The idf factor is the RAW inverse document frequency N/df — NOT
    log-damped — because ln() is not bit-portable across engines
    (JVM vs libm) and for a fixed tf the ordering by N/df equals the
    ordering by log(N/df) anyway. Score arithmetic is one exact
    int→double product (tf·N < 2^53) and one deterministic IEEE
    division, so the driver oracle hash-matches it.

    Plan shape at scale: tokenize → two hash aggregations (tf on
    (doc, term); df on term) → broadcast-able df table joined back →
    per-doc top-k window. The only wide exchanges are on term and
    doc — no all-pairs anything.
    """
    toks = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = toks.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    n_docs = docs.select(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def sql_tfidf_top_terms(k: int = 3) -> str:
    """DuckDB twin of :func:`tfidf_top_terms` over `documents`."""
    return (
        "WITH toks AS (SELECT doc_id, tk AS term FROM (SELECT doc_id, "
        r"unnest(regexp_split_to_array(lower(text), '\s+')) AS tk "
        "FROM documents) WHERE tk <> ''), "
        "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks "
        "GROUP BY doc_id, term), "
        "dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks "
        "GROUP BY term), "
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents), "
        "scored AS (SELECT doc_id, term, tf, df, "
        "CAST(tf * n_docs AS DOUBLE) / df AS score FROM tf "
        "JOIN dft USING (term) CROSS JOIN n), "
        "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
        "ORDER BY score DESC, term ASC) AS rank FROM scored) "
        f"SELECT doc_id, term, tf, df, score, "
        f"CAST(rank AS INT) AS rank FROM ranked WHERE rank <= {k}"
    )


# ----------------------------------- deterministic stratified sample


def stratified_sample_hash(
    df: DataFrame,
    strata_col: str,
    permille: dict[str, int],
    default_permille: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling for corpus mixing: keep
    a row iff md5(id) mod 1000 < the stratum's keep-permille.

    This is the reproducible-training-mixture primitive: a pure
    map-side filter (NO shuffle, NO RNG state), stable under retries
    and resumes because membership depends only on the row id, and
    composable — re-running with a higher permille yields a strict
    superset (nested samples)."""
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(1000),
    )
    rate = F.lit(default_permille)
    for key, val in sorted(permille.items()):
        rate = F.when(F.col(strata_col) == key, F.lit(val)).otherwise(rate)
    return df.withColumn("sample_bucket", bucket.cast("int")).filter(
        F.col("sample_bucket") < rate
    )


def sql_stratified_sample(
    permille: dict[str, int], default_permille: int
) -> str:
    """DuckDB twin of :func:`stratified_sample_hash` over `documents`
    (strata = lang, id = doc_id)."""
    whens = " ".join(
        f"WHEN lang = '{key}' THEN {val}"
        for key, val in sorted(permille.items())
    )
    return (
        "WITH b AS (SELECT *, CAST(CAST(('0x' || "
        "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) "
        "% 1000 AS INT) AS sample_bucket FROM documents) "
        "SELECT doc_id, lang, sample_bucket FROM b "
        f"WHERE sample_bucket < (CASE {whens} "
        f"ELSE {default_permille} END)"
    )


# --------------------------------------------------- chunking / packing

_SQL_TOKEN_COUNT = (
    "CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 ELSE "
    r"CAST(LENGTH(regexp_split_to_array(TRIM(text), '\s+')) AS INT) END"
)


def chunk_documents(
    df: DataFrame,
    size: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size overlapping character windows
    (the context-window prep step of a training pipeline: every model
    sample is a chunk, overlap = ``size - stride`` keeps boundary
    context).

    Chunk count is closed-form — ``ceil(max(len-size,0)/stride)+1``
    (always ≥1, last chunk may be short but every character is
    covered and no start position exceeds the text) — so the explode
    is a Catalyst ``sequence`` with NO data-dependent Python. Pure
    map-side: scan → explode → substr; no shuffle at any scale.
    Emits the chunk's md5 rather than its text so the output stays
    narrow (the common consumer is chunk-level dedup / manifests;
    re-deriving the text is ``substr`` on the source row).
    """
    n = F.length(F.col(text_col))
    n_chunks = (
        F.floor((F.greatest(n - F.lit(size), F.lit(0)) + F.lit(stride - 1))
                / F.lit(stride)) + F.lit(1)
    )
    start = (F.col("chunk_idx") * F.lit(stride) + F.lit(1)).cast("int")
    chunk = F.col(text_col).substr(start, F.lit(size))
    return (
        df.select(
            F.col(id_col),
            F.col(text_col),
            F.explode(
                F.sequence(F.lit(0).cast("long"), (n_chunks - 1).cast("long"))
            ).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            start.cast("long").alias("start_pos"),
            F.length(chunk).cast("long").alias("chunk_chars"),
            F.md5(chunk.cast("binary")).alias("chunk_hash"),
        )
    )


def sql_chunk_documents(size: int = 128, stride: int = 96) -> str:
    """DuckDB twin of :func:`chunk_documents` over `documents`."""
    return (
        "WITH c AS (SELECT doc_id, text, "
        f"((GREATEST(LENGTH(text) - {size}, 0) + {stride - 1}) "
        f"// {stride}) + 1 AS n_chunks FROM documents) "
        "SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, "
        f"CAST(i * {stride} + 1 AS BIGINT) AS start_pos, "
        f"CAST(LENGTH(substr(text, CAST(i * {stride} + 1 AS INT), {size})) "
        "AS BIGINT) AS chunk_chars, "
        f"md5(substr(text, CAST(i * {stride} + 1 AS INT), {size})) "
        "AS chunk_hash "
        "FROM c, UNNEST(generate_series(0, CAST(n_chunks - 1 AS BIGINT))) "
        "AS t(i)"
    )


def pack_shards(
    df: DataFrame,
    budget_tokens: int = 2000,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to output shards of ~``budget_tokens`` each
    (the "write the corpus as N-token training shards" step).

    Deterministic pseudo-shuffle order inside each group —
    ``ORDER BY md5(id), id`` — then a running token sum; a document
    starts a new shard when the tokens BEFORE it fill the budget
    (``shard = floor((cumsum - tok)/budget)``), so shard boundaries
    never split a document and assignment is integer-exact.

    Scale shape: ONE shuffle on the group key; the running sum is a
    window inside each group partition (groups = sources / dump
    slices, thousands of docs each — the natural unit a corpus is
    already organized by). A single global ordering would serialize
    on one partition; per-group packing is how shard writers
    parallelize at 100 TB.
    """
    from pyspark.sql.window import Window

    tok = token_count_col(F.col(text_col))
    okey = F.md5(F.col(id_col).cast("string").cast("binary"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(okey, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tok).over(w).cast("long")
    return df.select(
        F.col(id_col),
        F.col(group_col),
        tok.cast("long").alias("token_count"),
        F.floor((cum - tok) / F.lit(budget_tokens)).alias("shard_ord"),
    )


def sql_pack_shards(budget_tokens: int = 2000) -> str:
    """DuckDB twin of :func:`pack_shards` over `documents`
    (group = source, id = doc_id)."""
    return (
        f"WITH t AS (SELECT doc_id, source, {_SQL_TOKEN_COUNT} AS tok, "
        "md5(CAST(doc_id AS VARCHAR)) AS okey FROM documents), "
        "c AS (SELECT doc_id, source, tok, "
        "SUM(tok) OVER (PARTITION BY source ORDER BY okey, doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t) "
        "SELECT doc_id, source, CAST(tok AS BIGINT) AS token_count, "
        f"CAST((cum - tok) // {budget_tokens} AS BIGINT) AS shard_ord "
        "FROM c"
    )


# --------------------------------------------------- BM25 retrieval

# k1 = 6/5, b = 3/4 expressed as the integer coefficients that fall
# out of clearing denominators (see bm25_topk_docs): with k1 = 6/5
# and b = 3/4, multiplying the classic tf-saturation fraction
#   tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))        avgdl = TT/ND
# through by 20*TT gives the all-integer pair
#   num = 44*tf*TT          den = 20*tf*TT + 6*TT + 18*dl*ND
BM25_QUERY_TERMS = ("filter", "hash", "join", "scan", "vector")


def bm25_topk_docs(
    docs: DataFrame,
    terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a fixed query under BM25 (k1=1.2, b=0.75),
    bit-portable across engines.

    Two portability moves make the score hash-exact vs a SQL oracle:

    * **Integer-exact saturation.** The tf-saturation fraction is
      cleared to a ratio of two int64s (``44*tf*TT`` over
      ``20*tf*TT + 6*TT + 18*dl*ND`` — TT = corpus token count, ND =
      doc count), so the only float ops are one correctly-rounded
      division, one for the raw-idf factor ``ND/df`` (raw, not
      log-damped — ln() is not bit-portable, and per-term ordering is
      unchanged), and one multiply: identical bits in any IEEE engine.
      The int64 products hold while ``44*tf*TT < 2^53`` (~2e11 corpus
      tokens with tf≤1e3); beyond that, scale TT to kilotokens on
      both sides.
    * **Fixed-order summation.** Per-term scores live in separate
      columns (one map-side ``size(filter(split(...)))`` per term —
      no explode, no shuffle) and are added in sorted-term literal
      order, so the double sum is order-deterministic — a plain
      SUM-over-exploded-terms would hash-differently run to run.

    Plan shape at scale: one map-side pass computes tf/dl per doc,
    ONE tiny global aggregate row (TT, ND, per-term df) is
    cross-joined back (broadcast), and the top-k is a distributed
    TakeOrdered — no wide exchange anywhere.
    """
    terms = tuple(sorted(terms))
    toks = F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)

    # NB: the lambda must take exactly ONE parameter — F.filter treats
    # a second parameter as the element-index request, so the usual
    # `lambda x, t=t:` capture idiom silently changes semantics.
    def _tf(term: str) -> Column:
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    per_doc = docs.select(
        F.col(id_col),
        token_count_col(F.col(text_col)).cast("long").alias("dl"),
        *[
            _tf(t).cast("long").alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    totals = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("dl").alias("tt"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(totals))
    parts = []
    for i in range(len(terms)):
        tf, df = F.col(f"tf_{i}"), F.col(f"df_{i}")
        num = (F.lit(44) * tf * F.col("tt")).cast("double")
        den = (
            F.lit(20) * tf * F.col("tt")
            + F.lit(6) * F.col("tt")
            + F.lit(18) * F.col("dl") * F.col("nd")
        ).cast("double")
        idf = F.col("nd").cast("double") / df.cast("double")
        parts.append(
            F.when((tf > 0) & (df > 0), (num / den) * idf).otherwise(
                F.lit(0.0)
            )
        )
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    return (
        scored.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def sql_bm25_topk(
    terms: tuple[str, ...] = BM25_QUERY_TERMS, k: int = 10
) -> str:
    """DuckDB twin of :func:`bm25_topk_docs` over `documents` — same
    integer-cleared fraction, same fixed-order double sum."""
    terms = tuple(sorted(terms))
    tf_cols = ", ".join(
        "CAST(LENGTH(list_filter(regexp_split_to_array(lower(text), "
        rf"'\s+'), x -> x = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    score_terms = " + ".join(
        f"(CASE WHEN tf_{i} > 0 AND df_{i} > 0 THEN "
        f"(CAST(44 * tf_{i} * tt AS DOUBLE) / "
        f"CAST(20 * tf_{i} * tt + 6 * tt + 18 * dl * nd AS DOUBLE)) "
        f"* (CAST(nd AS DOUBLE) / CAST(df_{i} AS DOUBLE)) "
        "ELSE 0.0 END)"
        for i in range(len(terms))
    )
    return (
        f"WITH per_doc AS (SELECT doc_id, "
        f"CAST({_SQL_TOKEN_COUNT} AS BIGINT) AS dl, {tf_cols} "
        "FROM documents), "
        "totals AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, "
        f"CAST(SUM(dl) AS BIGINT) AS tt, {df_cols} FROM per_doc) "
        f"SELECT doc_id, ({score_terms}) AS score "
        "FROM per_doc CROSS JOIN totals "
        f"ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def pmi_top_pairs(
    docs: DataFrame,
    k: int = 20,
    scale: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k word pairs by document-level PMI — the collocation /
    topic-seed miner (which terms co-occur far above chance). PMI is
    ranked on the INTEGER cross-multiplied ratio
    ``(c_ab · N · scale) div (c_a · c_b)`` (monotone in the real PMI
    for fixed N; no logs, no floats), so the top-k is bit-exact in
    both engines; full (score, wa, wb) tie-break keeps the cut
    deterministic.

    Scale shape: per-doc DISTINCT tokens explode once; the pair
    generation is a per-doc self-join (bounded by the per-doc
    distinct-word count squared, NOT the corpus size — cap upstream
    for pathological documents), pair counting is one
    map-side-combinable groupBy, and the unigram table joins in as a
    broadcast (vocabulary-sized). Top-k is a TakeOrdered — no global
    sort exchange. Overflow: keep ``N² · scale < 2^63``
    (c_ab ≤ N ≤ the doc count).
    """
    tk = (
        docs.select(
            F.col(id_col).alias("d"),
            F.explode(
                F.array_distinct(
                    F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)
                )
            ).alias("tk"),
        )
        .where(F.col("tk") != "")
        .localCheckpoint(eager=True)
    )
    # corpus size as a broadcast ONE-ROW frame (the bm25_topk_docs
    # convention) — no driver-side count() action at plan time
    nd = F.broadcast(docs.agg(F.count(F.lit(1)).alias("nd")))
    uni = tk.groupBy("tk").agg(F.count(F.lit(1)).alias("c"))
    pairs = (
        tk.alias("a")
        .join(tk.alias("b"), "d")
        .where(F.col("a.tk") < F.col("b.tk"))
        .groupBy(
            F.col("a.tk").alias("wa"), F.col("b.tk").alias("wb")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    scored = (
        pairs.join(
            F.broadcast(uni.select(F.col("tk").alias("wa"), F.col("c").alias("ca"))),
            "wa",
        )
        .join(
            F.broadcast(uni.select(F.col("tk").alias("wb"), F.col("c").alias("cb"))),
            "wb",
        )
        .crossJoin(nd)
        .select(
            "wa",
            "wb",
            "c_ab",
            F.expr(f"(c_ab * nd * {scale}L) div (ca * cb)").alias(
                "pmi_scaled"
            ),
        )
    )
    return scored.orderBy(
        F.col("pmi_scaled").desc(), "wa", "wb"
    ).limit(k)


def sql_pmi_top_pairs(k: int = 20, scale: int = 1_000_000) -> str:
    """DuckDB twin of :func:`pmi_top_pairs` on the ``documents``
    view — same tokenization, same integer score, same tie-break."""
    return (
        "WITH tk AS (SELECT DISTINCT doc_id, tk FROM ("
        "SELECT doc_id, unnest(regexp_split_to_array(lower(text), "
        r"'\s+')) AS tk FROM documents) WHERE tk <> ''), "
        "n AS (SELECT COUNT(*) AS nd FROM documents), "
        "w AS (SELECT tk, COUNT(*) AS c FROM tk GROUP BY tk), "
        "p AS (SELECT a.tk AS wa, b.tk AS wb, COUNT(*) AS c_ab "
        "FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND a.tk < b.tk "
        "GROUP BY 1, 2) "
        "SELECT wa, wb, c_ab, "
        f"CAST((c_ab * nd * {scale}) // (ca.c * cb.c) AS BIGINT) "
        "AS pmi_scaled "
        "FROM p CROSS JOIN n "
        "JOIN w ca ON ca.tk = p.wa JOIN w cb ON cb.tk = p.wb "
        f"ORDER BY pmi_scaled DESC, wa, wb LIMIT {k}"
    )


def dup_spans(
    df: DataFrame,
    length: int = 60,
    stride: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Repeated long-span detector — the exact-substring half of
    training-data dedup (Lee et al. 2022 "Deduplicating Training
    Data Makes Language Models Better" finds verbatim ≥50-token
    spans shared across documents; this is the distributed analog
    over fixed character windows).

    Windows of ``length`` chars every ``stride`` chars, hashed; a
    span hash seen in ≥2 DISTINCT documents is a cross-document
    duplicated span. Output: (span_hash, n_docs, n_occ).

    Alignment caveat (inherent to strided fingerprints): two copies
    of a region are guaranteed to collide only when their offsets
    are congruent mod ``stride`` — whole-document copies, shared
    prefixes, and fixed-position boilerplate (the dominant dup
    classes) always are; an arbitrarily-shifted quote is caught with
    probability ~1/stride per window. The alignment-robust upgrade
    is winnowing (Schleimer et al. 2003): stride-1 windows + a
    local-min selection — same linear plan shape, ~stride× the
    map-side hash work.

    Plan: the window explode and md5 are map-side Catalyst
    (sequence → substring → md5 — character semantics, identical in
    Spark and DuckDB for any Unicode input); then ONE logical
    distinct-aggregate done as two hash aggs on the SAME key prefix
    — groupBy (hash, doc) then groupBy hash — so the heavy first agg
    gets map-side partial combine instead of an Expand-based
    count_distinct. Linear in corpus size ×(1/stride); never
    all-pairs."""
    spans = (
        df.where(F.length(F.col(text_col)) >= length)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(
                    F.lit(1),
                    (F.length(F.col(text_col)) - F.lit(length - 1)).cast(
                        "int"
                    ),
                    F.lit(stride),
                )
            ).alias("pos"),
            F.col(text_col),
        )
        .select(
            F.col(id_col),
            F.md5(
                F.expr(f"substring({text_col}, pos, {length})").cast("binary")
            ).alias("span_hash"),
        )
    )
    per_doc = spans.groupBy("span_hash", id_col).agg(
        F.count(F.lit(1)).alias("occ")
    )
    return (
        per_doc.groupBy("span_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("occ").alias("n_occ"),
        )
        .where(F.col("n_docs") >= 2)
    )


def sql_dup_spans(length: int = 60, stride: int = 20) -> str:
    """DuckDB twin of :func:`dup_spans` over `documents`."""
    return (
        "WITH spans AS (SELECT doc_id, "
        f"md5(substr(text, CAST(pos AS INT), {length})) AS span_hash "
        "FROM documents, UNNEST(generate_series("
        f"1, LENGTH(text) - {length - 1}, {stride})) AS t(pos) "
        f"WHERE LENGTH(text) >= {length}), "
        "per_doc AS (SELECT span_hash, doc_id, COUNT(*) AS occ "
        "FROM spans GROUP BY span_hash, doc_id) "
        "SELECT span_hash, COUNT(*) AS n_docs, "
        "CAST(SUM(occ) AS BIGINT) AS n_occ "
        "FROM per_doc GROUP BY span_hash HAVING COUNT(*) >= 2"
    )


def winnow_dup_grams(
    df: DataFrame,
    k: int = 32,
    window: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprints shared across documents — the
    alignment-ROBUST upgrade of :func:`dup_spans` (Schleimer,
    Wilkerson & Aiken, SIGMOD 2003: "Winnowing: local algorithms for
    document fingerprinting").

    Every k-gram is hashed (stride 1); for each window of ``window``
    consecutive gram hashes the minimum (hash, pos) — leftmost on
    hash ties — is SELECTED. Selection depends only on the window's
    contents, so two copies of any substring of length ≥
    k + window - 1 select an identical gram in BOTH documents
    regardless of how the copies are aligned — the guarantee the
    strided grid of dup_spans cannot give. Trailing windows shorter
    than ``window`` (near end-of-text) also select; that only ADDS
    fingerprints and is applied identically in both engines.

    Plan: gram explode + md5 are map-side; the rolling min is ONE
    window pass (single shuffle on doc_id — at 10^12 docs this
    partitions perfectly since every window is doc-local); the
    (hash, pos) tuple rides the window as a zero-pad-encoded string
    so the frame min IS the lexicographic tuple min in both engines.
    Output: (gram_hash, n_docs, n_sel) for grams selected in ≥2
    distinct docs.
    """
    selected = winnow_selected_grams(
        df, k=k, window=window, id_col=id_col, text_col=text_col
    )
    per_doc = selected.groupBy("gram_hash", id_col).agg(
        F.count(F.lit(1)).alias("n_pos")
    )
    return (
        per_doc.groupBy("gram_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pos").alias("n_sel"),
        )
        .where(F.col("n_docs") >= 2)
    )


def winnow_selected_grams(
    df: DataFrame,
    k: int = 32,
    window: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The winnowing SELECTION set — distinct (id, gram_hash,
    sel_pos) fingerprints per document (see winnow_dup_grams for the
    algorithm and its guarantee). Exposed separately so pairwise
    copy detection (doc_copy_pairs) and cross-doc gram counts build
    on the same selection."""
    from pyspark.sql.window import Window

    n = F.length(F.col(text_col))
    grams = df.where(n >= k).select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(1), (n - F.lit(k - 1)).cast("int"))
        ).alias("pos"),
        F.col(text_col),
    ).select(
        F.col(id_col),
        F.col("pos"),
        F.md5(
            F.expr(f"substring({text_col}, pos, {k})").cast("binary")
        ).alias("h"),
    )
    enc = F.concat(
        F.col("h"), F.lit("|"), F.lpad(F.col("pos").cast("string"), 12, "0")
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    return (
        grams.select(F.col(id_col), F.min(enc).over(w).alias("sel"))
        .select(
            F.col(id_col),
            F.substring("sel", 1, 32).alias("gram_hash"),
            F.substring("sel", 34, 12).cast("long").alias("sel_pos"),
        )
        .distinct()
    )


COPY_PAIR_MAX_DOCS_PER_GRAM = 50
COPY_PAIR_MIN_SHARED = 2


def doc_copy_pairs(
    df: DataFrame,
    k: int = 32,
    window: int = 16,
    max_docs_per_gram: int = COPY_PAIR_MAX_DOCS_PER_GRAM,
    min_shared: int = COPY_PAIR_MIN_SHARED,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MOSS-style pairwise copy detection: document pairs ranked by
    how many winnowing fingerprints they share (the Stanford MOSS
    service is exactly winnowing + pairwise shared-fingerprint
    counts). Output: (doc_a, doc_b, n_shared) with doc_a < doc_b and
    n_shared ≥ ``min_shared``.

    The self-join is keyed on gram_hash — an equi-join, never
    all-pairs — and fanout is bounded by ``max_docs_per_gram``: a
    fingerprint selected in more documents than that is boilerplate
    (its d·(d-1)/2 pair explosion says nothing pairwise that the
    gram-level dup classes don't already say) and is EXCLUDED, the
    same hot-bucket cap convention the MinHash/SimHash families use.
    The cap is part of the operator's contract and the oracle
    applies it identically."""
    sel = winnow_selected_grams(
        df, k=k, window=window, id_col=id_col, text_col=text_col
    ).select("gram_hash", F.col(id_col)).distinct()
    from pyspark.sql.window import Window

    wcnt = Window.partitionBy("gram_hash")
    capped = sel.withColumn(
        "n_docs", F.count(F.lit(1)).over(wcnt)
    ).where(F.col("n_docs") <= max_docs_per_gram)
    a = capped.select("gram_hash", F.col(id_col).alias("doc_a"))
    b = capped.select("gram_hash", F.col(id_col).alias("doc_b"))
    return (
        a.join(b, "gram_hash")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def sql_doc_copy_pairs(
    k: int = 32,
    window: int = 16,
    max_docs_per_gram: int = COPY_PAIR_MAX_DOCS_PER_GRAM,
    min_shared: int = COPY_PAIR_MIN_SHARED,
) -> str:
    """DuckDB twin of :func:`doc_copy_pairs` over `documents`."""
    return (
        "WITH grams AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, "
        f"md5(substr(text, CAST(pos AS INT), {k})) AS h "
        "FROM documents, UNNEST(generate_series("
        f"1, LENGTH(text) - {k - 1})) AS t(pos) "
        f"WHERE LENGTH(text) >= {k}), "
        "seldoc AS (SELECT DISTINCT doc_id, substr(s, 1, 32) AS gram_hash "
        "FROM (SELECT doc_id, "
        "MIN(h || '|' || lpad(CAST(pos AS VARCHAR), 12, '0')) "
        "OVER (PARTITION BY doc_id ORDER BY pos "
        f"ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS s "
        "FROM grams) t), "
        "capped AS (SELECT gram_hash, doc_id FROM ("
        "SELECT gram_hash, doc_id, COUNT(*) OVER (PARTITION BY gram_hash) "
        f"AS n_docs FROM seldoc) t WHERE n_docs <= {max_docs_per_gram}) "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "COUNT(*) AS n_shared "
        "FROM capped a JOIN capped b ON a.gram_hash = b.gram_hash "
        "AND a.doc_id < b.doc_id "
        f"GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}"
    )


def sql_winnow_dup_grams(k: int = 32, window: int = 16) -> str:
    """DuckDB twin of :func:`winnow_dup_grams` over `documents`."""
    return (
        "WITH grams AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, "
        f"md5(substr(text, CAST(pos AS INT), {k})) AS h "
        "FROM documents, UNNEST(generate_series("
        f"1, LENGTH(text) - {k - 1})) AS t(pos) "
        f"WHERE LENGTH(text) >= {k}), "
        "sel AS (SELECT DISTINCT doc_id, "
        "substr(s, 1, 32) AS gram_hash, "
        "CAST(substr(s, 34, 12) AS BIGINT) AS sel_pos FROM ("
        "SELECT doc_id, MIN(h || '|' || lpad(CAST(pos AS VARCHAR), 12, '0')) "
        "OVER (PARTITION BY doc_id ORDER BY pos "
        f"ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS s "
        "FROM grams) t), "
        "per_doc AS (SELECT gram_hash, doc_id, COUNT(*) AS n_pos "
        "FROM sel GROUP BY 1, 2) "
        "SELECT gram_hash, COUNT(*) AS n_docs, "
        "CAST(SUM(n_pos) AS BIGINT) AS n_sel "
        "FROM per_doc GROUP BY gram_hash HAVING COUNT(*) >= 2"
    )
