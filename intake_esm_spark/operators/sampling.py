"""Deterministic sampling operators for training-data pipelines.

At 100 TB a REPRODUCIBLE sample matters more than a statistically fancy
one: ``df.sample()`` is partition-dependent (same seed, different file
split → different rows), so a re-ingested or repartitioned corpus samples
differently run to run. A hash-threshold sample is a pure per-row
predicate — partition-independent, engine-portable (md5 everywhere),
join-stable (a document is in or out of the sample EVERYWHERE it
appears), and it's just a filter: zero shuffle, prunes at the scan
boundary, composes with any downstream plan.

The bucket function uses the first 15 hex chars (60 bits) of
``md5(salt || key)`` mod ``HASH_BUCKETS`` — exactly expressible in both
Spark (``conv(hex,16,10)``) and DuckDB (``('0x'||hex)::BIGINT``), so
sampling queries are hash-checkable against a SQL oracle. Changing
``salt`` draws an independent sample (e.g. train/validation splits:
disjoint salts, deterministic forever).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 1_000_000
"""Threshold resolution: fractions are quantized to 1/HASH_BUCKETS."""


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, HASH_BUCKETS) from a row key.

    Salt and key are joined with a ``|`` delimiter so shifted boundaries
    can't collide (salt 'v1' + key '23' vs salt 'v12' + key '3' hash
    differently) — prefix-related salts still draw independent samples.
    Delegates to ``functions.text.salted_hash60`` — the one definition of
    the salted-md5 construction the SQL oracles replay."""
    from intake_esm_spark.functions.text import salted_hash60

    return salted_hash60(key, salt) % HASH_BUCKETS


def hash_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by key hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(
        hash_bucket(F.col(key_col), salt) < int(round(fraction * HASH_BUCKETS))
    )


def take_per_group(
    df: DataFrame,
    n: int,
    strata_col: str,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic N rows per stratum — balanced-corpus construction
    (e.g. the same number of documents from every source). Rows rank
    within their stratum by (hash bucket, key): the hash gives an
    unbiased draw, the key breaks bucket ties totally, and both are pure
    row functions, so the pick is reproducible across runs, engines and
    partitionings. **Precondition: ``key_col`` must be unique within each
    stratum** — duplicate keys tie on both sort terms and row_number then
    depends on partition order, which is exactly the nondeterminism this
    operator exists to avoid. One window shuffle keyed by the stratum; at 100 TB a
    skewed stratum is one hot partition — acceptable because the window
    only ranks (no payload aggregation), and AQE splits the sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str,
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (downweight a boilerplate-heavy source, keep a rare language whole).
    One CASE expression over the stratum column picks the threshold; the
    whole operator is still a single shuffle-free filter."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1], got {f}")
    thresh = None
    for s, f in fractions.items():
        t = int(round(f * HASH_BUCKETS))
        thresh = (
            F.when(F.col(strata_col) == s, t)
            if thresh is None
            else thresh.when(F.col(strata_col) == s, t)
        )
    default_t = int(round(default_fraction * HASH_BUCKETS))
    thresh = F.lit(default_t) if thresh is None else thresh.otherwise(default_t)
    return df.filter(hash_bucket(F.col(key_col), salt) < thresh)


def deterministic_split(
    df: DataFrame,
    splits: dict[str, float],
    key_col: str,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test and friends) by
    hash bucket: consecutive bucket ranges sized by the requested
    fractions, in ``splits``' insertion order, with the LAST split
    absorbing the remainder so every row lands somewhere even when the
    fractions round. The split is a pure row function of (salt, key) —
    zero shuffle, partition-independent, and a document keeps its split
    across re-ingests, repartitions and engines, which is the actual
    requirement for a train/test split (leakage via re-shuffling is a
    silent eval bug). Changing ``salt`` redraws an independent split.

    Fractions must be positive and sum to 1 (±1e-9). **``splits``'
    insertion order is part of the contract** — it defines the bucket
    layout, so a reordered dict is a DIFFERENT split."""
    if len(splits) < 2:
        raise ValueError("need at least 2 splits")
    for name, f in splits.items():
        if not 0.0 < f <= 1.0:
            raise ValueError(f"fraction for split {name!r} must be in (0, 1], got {f}")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = hash_bucket(F.col(key_col), salt)
    names = list(splits)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        t = int(round(acc * HASH_BUCKETS))
        w = F.when(bucket < t, F.lit(name))
        expr = w if expr is None else expr.when(bucket < t, F.lit(name))
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def weighted_bernoulli_sample(
    df: DataFrame, prob_col: str, key_col: str, salt: str = ""
) -> DataFrame:
    """Probability-proportional deterministic sampling: keep a row iff
    its hash-uniform ``u = md5_60(key)/2^60`` is below the row's own
    inclusion probability (any [0,1] column — a quality score, a
    per-source rate, an importance weight). The per-row generalization
    of :func:`hash_sample`: still a pure zero-shuffle filter, still
    partition-independent and engine-replayable, but the sampling rate
    varies row by row. E[kept] = sum(p); inclusion is independent across
    rows (distinct keys hash independently)."""
    from intake_esm_spark.functions.text import HASH_SPACE_60, salted_hash60

    u = salted_hash60(F.col(key_col), salt).cast("double") / F.lit(HASH_SPACE_60)
    return df.filter(u < F.col(prob_col))


def weighted_take_per_group(
    df: DataFrame,
    n: int,
    weight_col: str,
    strata_col: str,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, n per
    stratum — Efraimidis–Vassilvitskii A-ES: each row draws
    ``score = u^(1/w)`` from its hash-uniform ``u`` and the n largest
    scores win, which provably samples proportional-to-weight without
    replacement. The weighted sibling of :func:`take_per_group` (same
    single window shuffle keyed by the stratum, same determinism
    contract). Scores are rounded to 12 decimals to absorb cross-engine
    libm ulp drift in ``pow`` (the ``docs_mixture_temp`` precedent) with
    ``key_col`` as the total tiebreak, so the SELECTION is engine-exact
    even where the 16th digit of ``pow`` is not. Rows with null or
    non-positive weight are excluded (they have zero inclusion mass).

    **Precondition: ``key_col`` unique within each stratum** (ties on
    both sort terms would fall back to partition order)."""
    from pyspark.sql import Window

    from intake_esm_spark.functions.text import HASH_SPACE_60, salted_hash60

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # +1 maps the hash into (0, 1]: u = 0 would send every weight to
    # score 0; the (measure-2^-60) top hash gets u = 1.0 exactly — score
    # 1.0 for any weight, deterministic and replayed identically by the
    # oracle, just weight-blind for that one key
    u = (salted_hash60(F.col(key_col), salt) + 1).cast("double") / F.lit(
        HASH_SPACE_60
    )
    score = F.round(F.pow(u, F.lit(1.0) / F.col(weight_col)), 12)
    w = Window.partitionBy(strata_col).orderBy(
        score.desc(), F.col(key_col).asc()
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )
