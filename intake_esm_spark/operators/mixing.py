"""Source-mixture rebalancing: deterministic downsampling to a target mix.

Extension per SURVEY §2.9 (no reference analogue).

A training corpus is assembled from heterogeneous sources (web crawl,
books, code, ...) whose NATURAL proportions rarely match the mixture the
training run wants (DoReMi/Pile-style static mixing weights). The
rebalance operator computes, per source, the deterministic keep-rate that
realizes the target mixture at the largest achievable total, then applies
it with the engine's salted-hash sampling — so the sampled corpus is a
pure function of (corpus, weights, salt): reproducible across runs,
engines and partitionings, and exactly replayable by a SQL oracle.

The math: given target shares ``w_s`` (normalized to sum 1 over the
sources present in the weight map) and available masses ``c_s``
(documents, or tokens via ``size_col``), the largest total ``T``
satisfying ``w_s * T <= c_s`` for every source is ``T = min_s(c_s/w_s)``;
source ``s`` then keeps ``rate_s = w_s * T / c_s`` of its mass (the
binding source keeps everything, oversupplied sources are downsampled).
Sources absent from the weight map get weight 0 — dropped entirely.

100 TB shape: one map-side-partial aggregation to per-source masses (the
result is sources-count rows — metadata-scale), the rate table derives
from it in-plan (a global min over that tiny frame; its single-partition
exchange holds one row per source, never corpus data) and broadcast-joins
back; the keep decision is a pure in-row hash filter. The corpus is
scanned twice (mass pass + filter pass) but never shuffled — cache or
materialize the masses if the two-pass scan matters, or pass
``precomputed_rates``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from intake_esm_spark.operators.sampling import HASH_BUCKETS, hash_bucket


def source_mixture_rates(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    size_col: str | Column | None = None,
) -> DataFrame:
    """Per-source keep-rates realizing ``weights`` at the largest
    achievable total: ``(source, mass, target_w, rate)`` — one row per
    source present in BOTH the corpus and the weight map. ``size_col``
    weighs sources by a per-row mass (e.g. a token count) instead of row
    count. Lazy plan over a sources-count-sized frame; no driver collect."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("target weights must be positive (omit a source to drop it)")
    total_w = float(sum(weights.values()))

    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(s, float(w) / total_w) for s, w in weights.items()],
        f"{source_col} string, target_w double",
    )
    if size_col is None:
        mass = F.count(F.lit(1)).cast("double")
    else:
        sc = F.col(size_col) if isinstance(size_col, str) else size_col
        mass = F.sum(sc.cast("double"))
    masses = df.groupBy(source_col).agg(mass.alias("mass"))
    joined = masses.join(F.broadcast(wdf), source_col)
    # T = min_s(mass_s / w_s) as a GLOBAL window over the per-source
    # frame: that frame is sources-count-sized by construction, so the
    # single-partition window holds a handful of rows — and unlike an
    # agg + crossJoin-back, it references `joined` once (a second
    # reference would re-run the corpus mass scan: no exchange reuse
    # across differently-pruned branches)
    from pyspark.sql.window import Window

    t = F.min(F.col("mass") / F.col("target_w")).over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return joined.withColumn(
        "rate", F.least(F.lit(1.0), F.col("target_w") * t / F.col("mass"))
    )


def apply_mixture(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    source_col: str = "source",
    size_col: str | Column | None = None,
    salt: str = "mix",
    precomputed_rates: DataFrame | None = None,
) -> DataFrame:
    """The rebalanced corpus: every row of ``df`` whose salted-hash bucket
    falls under its source's keep-rate threshold (``hash_bucket(key) <
    floor(rate * HASH_BUCKETS)``). Deterministic per (key, salt) — the
    same construction as ``sampling.hash_sample``, so re-runs and other
    engines keep the identical rows. Sources absent from ``weights`` are
    dropped. Rate-table rows broadcast; the corpus never shuffles.

    Streaming: with ``precomputed_rates`` (rates are corpus-global state,
    like the LSH index — compute them in batch, refresh as the corpus
    grows) the operator is a stateless stream-static broadcast-join
    filter, valid in any output mode; parity with the batch pass is
    asserted in tests."""
    rates = (
        precomputed_rates
        if precomputed_rates is not None
        else source_mixture_rates(df, weights, source_col, size_col)
    )
    thresholds = rates.select(
        source_col,
        F.floor(F.col("rate") * HASH_BUCKETS).cast("bigint").alias("__keep_below"),
    )
    b = hash_bucket(F.col(key_col), salt)
    return (
        df.join(F.broadcast(thresholds), source_col)
        .filter(b < F.col("__keep_below"))
        .drop("__keep_below")
    )


def temperature_mixture_rates(
    df: DataFrame,
    alpha: float,
    source_col: str = "source",
    size_col: str | Column | None = None,
) -> DataFrame:
    """Per-source keep-rates for TEMPERATURE-scaled sampling — the
    multilingual-training rule (mBERT / XLM-R style): target share
    ``w_s ∝ mass_s^alpha`` with ``alpha ∈ (0, 1]``. ``alpha = 1``
    reproduces natural proportions (every rate 1.0); ``alpha → 0``
    approaches a uniform mix; intermediate values upweight the tail
    without flattening the head — the standard fix for low-resource
    sources that static weight maps (:func:`source_mixture_rates`)
    handle only with hand-tuning.

    Returns ``(source, mass, target_w, rate)`` exactly like
    :func:`source_mixture_rates` — same largest-achievable-total rule
    (``T = min_s(mass_s / w_s)``, binding source keeps everything) and
    the output feeds ``apply_mixture(precomputed_rates=...)``
    unchanged. ``target_w`` is 12dp-rounded in-plan: the share involves
    ``pow``, whose last-ulp can differ across engines, and the rounding
    pins the downstream bucket thresholds to the same values everywhere
    (the agree-to-rounding contract every scored operator uses).

    Same 100 TB shape as the static variant: one map-side-partial mass
    aggregation to a sources-count frame; the share normalization and
    the global min run as windows over THAT tiny frame (each references
    the masses subplan once — an agg + join-back would re-run the
    corpus scan per branch); no corpus shuffle, no driver collect."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    from pyspark.sql.window import Window

    if size_col is None:
        mass = F.count(F.lit(1)).cast("double")
    else:
        sc = F.col(size_col) if isinstance(size_col, str) else size_col
        mass = F.sum(sc.cast("double"))
    masses = df.groupBy(source_col).agg(mass.alias("mass"))

    allw = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scaled = masses.withColumn("__p", F.pow(F.col("mass"), F.lit(float(alpha))))
    shared = scaled.withColumn(
        "target_w", F.round(F.col("__p") / F.sum("__p").over(allw), 12)
    ).drop("__p")
    t = F.min(F.col("mass") / F.col("target_w")).over(allw)
    return shared.withColumn(
        "rate", F.least(F.lit(1.0), F.col("target_w") * t / F.col("mass"))
    )
