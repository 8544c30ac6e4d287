"""Exact set-similarity self-join via prefix filtering (AllPairs).

The EXACT complement to the approximate MinHash/SimHash family in
:mod:`.dedup`: find every pair of documents whose token-set Jaccard
is ≥ t, with zero false negatives and zero false positives — no
probabilistic recall contract at all — while still never going
all-pairs. The algorithm is AllPairs prefix filtering (Bayardo,
Ma, Srikant, WWW'07; refined as PPJoin by Xiao et al., WWW'08):

* order every document's distinct tokens by GLOBAL rarity
  (document frequency ascending, token string as tie-break — a
  consistent total order across all documents);
* a document with L tokens exposes only its first
  ``L - ceil(t·L) + 1`` tokens (its *prefix* — the rarest ones);
* **prefix lemma**: if ``|A∩B| ≥ α`` then the prefixes of length
  ``|A|-α+1`` and ``|B|-α+1`` must share a token. Jaccard ≥ t
  implies ``|A∩B| ≥ t·max(|A|,|B|) ≥ ceil(t·L)`` for each side
  (given the length filter ``t·La ≤ Lb ≤ La/t``), so our
  per-document prefixes are at least as long as the lemma needs —
  candidate generation is LOSSLESS.

100-TB shape: every step is a hash aggregation or an equi-join —
tokenize → (doc,term) distinct → df counts joined back (AQE
broadcasts the vocabulary when it fits; sort-merge otherwise) →
per-doc row_number window → prefix-token self-equi-join (candidate
volume is bounded by prefix-token rarity: the rarest-first order
makes hot tokens appear only in long suffixes, never in prefixes)
→ exact verify by joining the per-doc sorted token arrays. No
all-pairs stage exists at any scale, and the verify is integer
arithmetic: ``den·|A∩B| ≥ num·|A∪B|`` with threshold t = num/den —
no float comparison, so the DuckDB oracle is bit-exact by
construction.

Reference provenance: the reference engine has no text operators at
all (its surface is src/spatial_join.cpp + scans); this module is
part of the training-data-pipeline family the task brief adds on
top of reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textops import TOKEN_SPLIT_RE


def setsim_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens: Column | None = None,
    text_col: str = "text",
    num: int = 1,
    den: int = 2,
) -> DataFrame:
    """All pairs ``(id_a < id_b)`` with token-set Jaccard ≥ num/den.

    ``tokens`` is an array column giving each document's distinct
    token set (any orderable element type — strings, gram hashes from
    :func:`..dedup.wordgram_hashes_col`, …). Defaults to the
    lowercased whitespace word set of ``text_col``. NOTE the set
    domain decides selectivity: on template-generated corpora the
    WORD set is near-degenerate (most docs share most words) — use
    word n-gram hashes there, which are rare by construction.

    Returns ``(id_a, id_b, inter_cnt, union_cnt)`` — the counts, not
    a float score, so equality is exact across engines; callers
    wanting the ratio divide at the edge.
    """
    if not (0 < num <= den):
        raise ValueError(f"threshold must be in (0,1]: {num}/{den}")
    if tokens is None:
        tokens = F.array_remove(
            F.array_distinct(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)
            ),
            "",
        )

    toks = docs.select(
        F.col(id_col).alias("doc"), F.explode(tokens).alias("term")
    )
    df_t = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    w_rank = Window.partitionBy("doc").orderBy(
        F.col("df").asc(), F.col("term").asc()
    )
    w_len = Window.partitionBy("doc")
    ranked = (
        toks.join(df_t, "term")
        .withColumn("rn", F.row_number().over(w_rank))
        .withColumn("len", F.count(F.lit(1)).over(w_len))
    )
    # prefix length L - ceil(num·L/den) + 1, exact in integers
    need = F.floor(
        (F.lit(num) * F.col("len") + F.lit(den - 1)) / F.lit(den)
    )
    prefix = ranked.filter(F.col("rn") <= F.col("len") - need + 1).select(
        "doc", "term", "len"
    )

    a = prefix.select(
        F.col("doc").alias("id_a"), "term", F.col("len").alias("len_a")
    )
    b = prefix.select(
        F.col("doc").alias("id_b"), "term", F.col("len").alias("len_b")
    )
    cand = (
        a.join(b, "term")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # length filter: t·La ≤ Lb and t·Lb ≤ La
            & (F.lit(den) * F.col("len_b") >= F.lit(num) * F.col("len_a"))
            & (F.lit(den) * F.col("len_a") >= F.lit(num) * F.col("len_b"))
        )
        .select("id_a", "id_b", "len_a", "len_b")
        .distinct()
    )

    arrays = toks.groupBy("doc").agg(
        F.sort_array(F.collect_set("term")).alias("terms")
    )
    verified = (
        cand.join(
            arrays.select(
                F.col("doc").alias("id_a"), F.col("terms").alias("terms_a")
            ),
            "id_a",
        )
        .join(
            arrays.select(
                F.col("doc").alias("id_b"), F.col("terms").alias("terms_b")
            ),
            "id_b",
        )
        .withColumn(
            "inter_cnt",
            F.size(F.array_intersect("terms_a", "terms_b")).cast("long"),
        )
        .withColumn(
            "union_cnt",
            (F.col("len_a") + F.col("len_b") - F.col("inter_cnt")).cast(
                "long"
            ),
        )
        .filter(
            F.lit(den) * F.col("inter_cnt") >= F.lit(num) * F.col("union_cnt")
        )
    )
    return verified.select("id_a", "id_b", "inter_cnt", "union_cnt")


def sql_setsim_join(num: int = 1, den: int = 2, w: int = 4) -> str:
    """DuckDB twin of :func:`setsim_join` over `documents` with word
    ``w``-gram 60-bit md5 hashes as the token domain (the same gram
    convention as the decontamination oracle) — and the SAME
    prefix-filter candidate generation, so the oracle stays tractable
    at sf1's 50k docs: no all-pairs CTE anywhere. Intersections are
    a relational group-count instead of array_intersect."""
    return (
        "WITH ws AS (SELECT doc_id, regexp_split_to_array("
        r"lower(trim(COALESCE(text, ''))), '\s+') AS w FROM documents), "
        f"g AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= {w} "
        "THEN [CAST(('0x' || substr(md5(array_to_string("
        f"w[i:i+{w - 1}], ' ')), 3, 15)) AS BIGINT) "
        f"for i in range(1, len(w) - {w - 2})] ELSE [] END) AS hs "
        "FROM ws), "
        "toks AS (SELECT doc_id AS doc, unnest(hs) AS term FROM g), "
        "dft AS (SELECT term, COUNT(*) AS df FROM toks GROUP BY term), "
        "ranked AS (SELECT doc, term, "
        "ROW_NUMBER() OVER (PARTITION BY doc ORDER BY df ASC, term ASC) "
        "AS rn, COUNT(*) OVER (PARTITION BY doc) AS len "
        "FROM toks JOIN dft USING (term)), "
        "prefix AS (SELECT doc, term, len FROM ranked WHERE "
        f"rn <= len - CAST(FLOOR(({num}*len + {den - 1}) / {den}) AS BIGINT)"
        " + 1), "
        "cand AS (SELECT DISTINCT a.doc AS id_a, b.doc AS id_b, "
        "a.len AS len_a, b.len AS len_b "
        "FROM prefix a JOIN prefix b ON a.term = b.term "
        "AND a.doc < b.doc "
        f"AND {den}*b.len >= {num}*a.len AND {den}*a.len >= {num}*b.len), "
        "inter AS (SELECT c.id_a, c.id_b, "
        "ANY_VALUE(c.len_a) AS len_a, ANY_VALUE(c.len_b) AS len_b, "
        "COUNT(*) AS inter_cnt FROM cand c "
        "JOIN toks ta ON ta.doc = c.id_a "
        "JOIN toks tb ON tb.doc = c.id_b AND tb.term = ta.term "
        "GROUP BY c.id_a, c.id_b) "
        "SELECT id_a, id_b, CAST(inter_cnt AS BIGINT) AS inter_cnt, "
        "CAST(len_a + len_b - inter_cnt AS BIGINT) AS union_cnt "
        "FROM inter WHERE "
        f"{den}*inter_cnt >= {num}*(len_a + len_b - inter_cnt)"
    )
