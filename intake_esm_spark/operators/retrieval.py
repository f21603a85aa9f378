"""BM25 relevance scoring — corpus search over the documents table.

Extension per SURVEY §2.9 (the reference is a catalog query engine with
no text-retrieval analogue). A curation stack needs retrieval as well as dedup: "find the documents
about X" (inspect what a filter removed, build topical eval slices, debug
contamination hits). This is Okapi BM25, Spark-first:

* **corpus statistics in ONE pass**: document count, total length, and
  the per-query-term document frequencies come out of a single aggregate
  over the materialized word arrays (a conditional sum per term — the
  query has a handful of terms, so this is a 1-row metadata-scale
  result);
* the stats row **broadcast-cross-joins** back (lazy, in-plan — no
  driver collect), and the whole score is then an IN-ROW expression:
  ``tf`` via a filtered word-array size per term, ``idf`` and the length
  normalization from the stats columns. Zero shuffle beyond the stats
  aggregation; scoring pipelines into whatever runs next.

Determinism: term contributions are added in fixed query-term order,
counts are exact integers, and the final score is 6dp-rounded — the
agree-to-6dp contract that bridges ``ln``/division ulp differences
between engines (both compute on bit-identical inputs).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from intake_esm_spark.functions.text import words_array


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for a bag-of-terms query:
    ``score = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1 − b + b·dl/avgdl))``
    with ``idf_t = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))`` over the
    CCNet-normalized word arrays. Returns ``(id_col, bm25)`` for every
    document with a positive 6dp-rounded score (zero-score documents
    carry no signal and would dominate the output).

    ``terms`` are matched as exact normalized words (lowercase the query
    yourself; multi-word queries are bags, not phrases). Duplicate terms
    contribute twice, like a bag-of-words query vector would."""
    if not terms:
        raise ValueError("terms must be non-empty")
    # null-text documents can never match a term; counting them in N (and
    # leaving their null dl out of sumdl) would skew idf/avgdl versus
    # standard BM25 — same text IS NOT NULL convention as gram_duplication
    # and the structural oracles
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), words_array(F.col(text_col)).alias("__w")
    )
    base = base.select(id_col, "__w", F.size("__w").alias("__dl"))

    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__dl").alias("__sumdl"),
        *[
            F.sum(F.array_contains("__w", t).cast("bigint")).alias(f"__df{i}")
            for i, t in enumerate(terms)
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))

    n = F.col("__n").cast("double")
    avgdl = F.col("__sumdl").cast("double") / n
    norm_len = F.col("__dl").cast("double") / avgdl

    def term_score(i: int, t: str) -> F.Column:
        df_t = F.col(f"__df{i}").cast("double")
        idf = F.log(F.lit(1.0) + (n - df_t + F.lit(0.5)) / (df_t + F.lit(0.5)))
        tf = F.size(F.filter(F.col("__w"), lambda w: w == F.lit(t))).cast("double")
        denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * norm_len)
        return idf * (tf * F.lit(k1 + 1.0) / denom)

    score = reduce(
        lambda a, c: a + c, [term_score(i, t) for i, t in enumerate(terms)]
    )
    return (
        joined.select(F.col(id_col), F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0.0)
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25, deterministically ordered by the
    ROUNDED score (desc) then ``id_col`` (asc) — ranking on the rounded
    value is what lets two engines agree on the cutoff row. Partial
    top-k: ``TakeOrderedAndProject``-shaped, no global sort."""
    scored = bm25_scores(docs, terms, text_col, id_col, k1, b)
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf·idf — the
    keyword-extraction / document-fingerprinting pass (label what a
    cluster is about, eyeball what a filter removed). ``idf = ln(N/df)``
    over distinct-document frequency; score = raw term count × idf,
    6dp-rounded; ranking by (rounded score desc, term asc) is a total
    order, so the cutoff is engine-portable. ``min_df`` drops
    ultra-rare terms (hapaxes dominate tf·idf otherwise).

    The canonical distributed tf·idf plan, each exchange keyed as small
    as it can be: (doc, term) counts with map-side combine (the one
    token-grain exchange — inherent to exact tf), term-keyed document
    frequencies FROM the counts (term grain, not token grain), a
    term-keyed join of the two, and the per-document top-k window (rank
    ≤ k, partial-ranked before the exchange). N comes from a 1-row
    aggregate broadcast in-plan — no driver action.

    Deliberate trade-off: ``tf`` feeds both the join and the
    document-frequency aggregation, and differently-pruned branches defeat
    exchange reuse, so the token-grain pass runs twice. The single-pass
    alternative (df as ``count() over (partition by term)``) references
    ``tf`` once but puts EVERY (doc, term) row of a stopword into one
    window task — a dead executor at web scale, and AQE can split skewed
    joins but not skewed windows. Two skew-safe passes beat one
    skew-fatal pass; callers iterating on the same corpus should persist
    ``docs`` (or pre-aggregate tf once) to pay the explode once."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # N counts only documents with text — null-text rows contribute no
    # terms and would deflate every idf (see bm25_scores)
    base = docs.filter(F.col(text_col).isNotNull())
    words = base.select(
        F.col(id_col), F.explode(words_array(F.col(text_col))).alias("term")
    )
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        df_t = df_t.filter(F.col("df") >= min_df)
    n_docs = base.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("__n").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )
