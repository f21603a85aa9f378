"""DSIR-style data selection: hashed n-gram importance resampling.

Given a small TARGET corpus (the distribution you want more of — e.g.
curated wiki/books text) and a huge RAW pool, Data Selection with
Importance Resampling (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling") scores every raw document by the
log-likelihood ratio of a hashed bag-of-ngrams model fit on each side,
then keeps the top-scoring documents. It is the standard cheap
"make the pretraining pool look like the target" selection stage.

No reference analogue (intake-esm is a catalog engine) — extension per
SURVEY §2.9's training-pipeline charter.

Scale design (the whole point at 100 TB):
* features are word unigrams + adjacent bigrams hashed into
  ``n_buckets`` (default 4096) buckets via the engine-portable md5-60
  hash — the model is a FIXED-SIZE vector regardless of corpus size;
* each side's bucket counts are ONE map-side-combined aggregation whose
  output is ≤ ``n_buckets`` rows; the raw pool and target are each
  scanned exactly once for fitting;
* the per-bucket log-ratio weight table (≤ ``n_buckets`` rows) is
  **broadcast** to score the pool — scoring is scan → in-row tokenize →
  explode → broadcast hash join → one doc-keyed map-side-combined sum.
  The raw corpus never shuffles at feature grain beyond that partial
  aggregation;
* selection is top-k by (score desc, id) via ``TakeOrderedAndProject``
  (per-partition heaps + driver merge of k rows), never a global sort.
  For frac-of-corpus selection at scale, compute the threshold score
  once (``group_quantiles`` with ``exact=False`` on the doc-grain score
  frame) and broadcast it as a filter instead.

Engine-exactness (the oracle contract): bucket ids are md5-60 mod B
(non-negative, so ``%`` and ``pmod`` agree across engines); weights are
``ln`` over EXACT integer counts rounded to 9 decimals and accumulated
per document as DECIMAL(20,9) — order-independent sums, so the score is
bit-identical across partitionings and engines (``ln`` agrees to the
last ulp on identical libm inputs — the docs_bm25/docs_tfidf precedent);
final scores round to 6 decimals with the doc id as total tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from intake_esm_spark.functions.text import portable_hash60, words_array


def _feature_stream(df: DataFrame, text_col: str, id_cols: list[str]) -> DataFrame:
    """Explode each document into its hashed feature occurrences
    (``id_cols...``, ``__feat``): non-empty word unigrams plus adjacent
    bigrams over the normalized token array. The token array is
    materialized in its own projection first (the ``words_array`` lambda
    rule: expressions inlined into higher-order lambdas re-evaluate per
    element). Null-text rows yield no features."""
    w = df.filter(F.col(text_col).isNotNull()).select(
        *id_cols,
        F.filter(words_array(F.col(text_col)), lambda t: t != "").alias("__w"),
    )
    feats = F.concat(
        F.col("__w"),
        F.when(F.size("__w") >= 2, F.transform(
            F.sequence(F.lit(1), F.size("__w") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("__w", i), F.element_at("__w", i + 1)
            ),
        )).otherwise(F.array().cast("array<string>")),
    )
    return w.select(*id_cols, F.explode(feats).alias("__feat"))


def _bucket(col: Column, n_buckets: int) -> Column:
    return F.pmod(portable_hash60(col), F.lit(n_buckets)).cast("int")


def _bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, out: str
) -> DataFrame:
    """(bucket, <out>) hashed-feature occurrence counts — one map-side-
    combined aggregation, ≤ n_buckets output rows."""
    return (
        _feature_stream(df, text_col, [])
        .select(_bucket(F.col("__feat"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias(out))
    )


def dsir_bucket_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-bucket importance log-weights ``(bucket, n_target, n_raw, w)``:

    ``w = ln((n_target+α)/(N_target+α·B)) − ln((n_raw+α)/(N_raw+α·B))``

    — the add-α-smoothed log-likelihood ratio of the two hashed
    bag-of-ngrams models, rounded to 9 decimals as DECIMAL(18,9) (so
    downstream per-document sums are order-independent). Buckets unseen
    on BOTH sides are absent (their weight would be the constant
    smoothing floor and no document references them); buckets seen on
    one side get the smoothed weight via the full-outer join. Output is
    ≤ ``n_buckets`` rows — materialize once, broadcast everywhere.

    The corpus totals enter through an unpartitioned window over the
    bucket frame — bounded by ``n_buckets``, never corpus-sized."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    t = _bucket_counts(target, text_col, n_buckets, "__ct")
    r = _bucket_counts(raw, text_col, n_buckets, "__cr")
    both = (
        t.join(r, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("__ct", F.lit(0)).alias("n_target"),
            F.coalesce("__cr", F.lit(0)).alias("n_raw"),
        )
    )
    from pyspark.sql import Window

    tot = Window.partitionBy()  # bucket frame: <= n_buckets rows, bounded
    ab = float(alpha) * n_buckets
    w = (
        F.log((F.col("n_target") + F.lit(float(alpha))))
        - F.log(F.sum("n_target").over(tot).cast("double") + F.lit(ab))
        - F.log((F.col("n_raw") + F.lit(float(alpha))))
        + F.log(F.sum("n_raw").over(tot).cast("double") + F.lit(ab))
    )
    return both.select(
        "bucket",
        "n_target",
        "n_raw",
        F.round(w, 9).cast("decimal(18,9)").alias("w"),
    )


def dsir_scores(
    raw: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document importance scores ``(id_col, n_feats, score)`` over
    the raw pool: score = Σ feature-occurrence log-weights (mean-free —
    DSIR ranks by the sum; documents with zero features are omitted, as
    the oracle's unnest drops them identically). The weight table is
    broadcast; the only exchange is the doc-keyed partial-aggregated
    groupBy. Score is the DECIMAL(18,9) weight sum cast to double and
    rounded to 6 decimals — order-independent, engine-exact.

    ``raw`` may be a DIFFERENT pool than the one the weights were fit
    on: buckets never seen during fitting LEFT-join to the constant
    smoothing floor ``ln(α/(N_t+αB)) − ln(α/(N_r+αB))`` (an inner join
    would silently drop those features — undercounting ``n_feats`` and
    omitting their floor contribution). The fit totals ``N_t``/``N_r``
    are recovered exactly from the weight table itself (absent buckets
    contribute zero to either side by construction), so the floor needs
    only ``alpha``/``n_buckets`` — which must match the fitting call."""
    missing = {"bucket", "w", "n_target", "n_raw"} - set(weights.columns)
    if missing:
        raise ValueError(
            "dsir_scores needs the full dsir_bucket_weights output "
            f"(bucket, n_target, n_raw, w) — missing {sorted(missing)}; "
            "the n_target/n_raw columns recover the fit totals for the "
            "unseen-bucket smoothing floor"
        )
    feats = _feature_stream(raw, text_col, [id_col]).select(
        F.col(id_col), _bucket(F.col("__feat"), n_buckets).alias("bucket")
    )
    ab = float(alpha) * n_buckets
    floor = weights.agg(
        F.round(
            F.log(F.lit(float(alpha)))
            - F.log(F.coalesce(F.sum("n_target"), F.lit(0)).cast("double") + F.lit(ab))
            - F.log(F.lit(float(alpha)))
            + F.log(F.coalesce(F.sum("n_raw"), F.lit(0)).cast("double") + F.lit(ab)),
            9,
        )
        .cast("decimal(18,9)")
        .alias("__floor_w")
    )
    joined = (
        feats.join(F.broadcast(weights.select("bucket", "w")), "bucket", "left")
        .crossJoin(F.broadcast(floor))
        .withColumn("w", F.coalesce("w", "__floor_w"))
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("w").alias("__sw"),
        )
        .select(
            id_col,
            "n_feats",
            F.round(F.col("__sw").cast("double"), 6).alias("score"),
        )
    )


def dsir_select(
    target: DataFrame,
    raw: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """End-to-end DSIR selection: fit both hashed models, score the raw
    pool, keep the top-``k`` documents by (score desc, id asc) —
    ``TakeOrderedAndProject``, never a global sort. Output
    ``(id_col, n_feats, score, rank)`` with rank 1..k. For frac-based
    selection at 100 TB, swap the top-k for a broadcast threshold from
    ``profiling.group_quantiles(exact=False)`` on the score frame."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    weights = dsir_bucket_weights(
        target, raw, text_col=text_col, n_buckets=n_buckets, alpha=alpha
    ).localCheckpoint(eager=False)
    scores = dsir_scores(
        raw,
        weights,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        alpha=alpha,
    )
    top = scores.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    from pyspark.sql import Window

    # rank over the k-row result — bounded, post-TakeOrdered
    rk = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.select(
        id_col,
        "n_feats",
        "score",
        F.row_number().over(rk).cast("int").alias("rank"),
    )


def _bigram_stream(df: DataFrame, text_col: str, id_cols: list[str]) -> DataFrame:
    """(id_cols..., __ctx, __bg): one row per adjacent-bigram position —
    the context word and the joined bigram string. Docs with < 2
    non-empty tokens yield no rows."""
    w = df.filter(F.col(text_col).isNotNull()).select(
        *id_cols,
        F.filter(words_array(F.col(text_col)), lambda t: t != "").alias("__w"),
    ).filter(F.size("__w") >= 2)
    pos = w.select(
        *id_cols,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__w") - 1),
                lambda i: F.struct(
                    F.element_at("__w", i).alias("ctx"),
                    F.concat_ws(
                        " ", F.element_at("__w", i), F.element_at("__w", i + 1)
                    ).alias("bg"),
                ),
            )
        ).alias("__p"),
    )
    return pos.select(
        *id_cols, F.col("__p.ctx").alias("__ctx"), F.col("__p.bg").alias("__bg")
    )


def lm_train_counts(
    train: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
) -> tuple[DataFrame, DataFrame]:
    """Fit the hashed bigram LM on the training corpus: returns
    ``(context_counts, bigram_counts)`` — each ``(bucket, n)`` with at
    most ``n_buckets`` rows (one map-side-combined aggregation per
    table; the model is fixed-size whatever the corpus). Bigram
    probability is add-α estimated downstream as
    ``P(w|ctx) = (n_bg(b(ctx w)) + α) / (n_ctx(b(ctx)) + α·B)``."""
    bg = _bigram_stream(train, text_col, [])
    ctx_counts = (
        bg.select(_bucket(F.col("__ctx"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bg_counts = (
        bg.select(_bucket(F.col("__bg"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return ctx_counts, bg_counts


def lm_cross_entropy(
    pool: DataFrame,
    ctx_counts: DataFrame,
    bg_counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document cross-entropy (nats/bigram) of the pool under the
    hashed bigram LM — the CCNet/Wenzek et al. 2020 quality signal:
    documents that "read like" the training corpus (wiki, curated text)
    score LOW; gibberish and boilerplate score HIGH. Filter or tier on
    the score exactly as CCNet's head/middle/tail split does.

    Per position: ``xent = ln(n_ctx(b)+α·B) − ln(n_bg(b)+α)`` — ln over
    exact integers, rounded to 9dp DECIMAL per position and summed
    order-independently; the per-doc mean divides as double in the
    final projection. Both count tables broadcast (≤ ``n_buckets``
    rows); the pool's only exchange is the doc-keyed partial-aggregated
    mean. Output: ``(id_col, n_bigrams, xent)``; docs with no bigram
    are omitted (the oracle's stream construction drops them
    identically)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    ab = float(alpha) * n_buckets
    bg = _bigram_stream(pool, text_col, [id_col]).select(
        F.col(id_col),
        _bucket(F.col("__ctx"), n_buckets).alias("__cb"),
        _bucket(F.col("__bg"), n_buckets).alias("__bb"),
    )
    ctx = F.broadcast(
        ctx_counts.select(F.col("bucket").alias("__cb"), F.col("n").alias("__nc"))
    )
    bgc = F.broadcast(
        bg_counts.select(F.col("bucket").alias("__bb"), F.col("n").alias("__nb"))
    )
    j = bg.join(ctx, "__cb", "left").join(bgc, "__bb", "left")
    contrib = F.round(
        F.log(F.coalesce(F.col("__nc"), F.lit(0)).cast("double") + F.lit(ab))
        - F.log(
            F.coalesce(F.col("__nb"), F.lit(0)).cast("double")
            + F.lit(float(alpha))
        ),
        9,
    ).cast("decimal(18,9)")
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(contrib).alias("__s"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(
                F.col("__s").cast("double") / F.col("n_bigrams").cast("double"),
                6,
            ).alias("xent"),
        )
    )
