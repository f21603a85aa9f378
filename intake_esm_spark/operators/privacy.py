"""Privacy auditing operators: k-anonymity over quasi-identifiers.

Extension (SURVEY §2.9): before a corpus (or its metadata) leaves a
pipeline, the release gate is usually stated as k-anonymity — every
combination of quasi-identifying columns must describe at least ``k``
rows, otherwise the combination singles people out (Sweeney's classic
re-identification model). Two operators: the audit (per-combination
counts + safety flag) and the enforcement (suppress quasi values in
unsafe groups).

Scale: the audit is one partial-aggregated groupBy on the quasi columns
— output bounded by the number of DISTINCT combinations, not rows. The
suppressor uses a count window partitioned by the same columns (one
exchange over the data); a pathologically hot combination is one hot
partition, acceptable because the window only counts (no payload sort)
and that combination is by definition the safest one in the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Per quasi-identifier combination: row count and whether it meets
    the ``k`` threshold (``anonymous = 1`` iff at least ``k`` rows share
    the combination). Null is a value here — rows with a null quasi
    column form their own combination, matching SQL GROUP BY on both
    engines."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_size"),
        (F.count(F.lit(1)) >= k).cast("int").alias("anonymous"),
    )


def suppress_quasi(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Enforce k-anonymity by suppression: rows whose quasi-identifier
    combination has fewer than ``k`` members get every quasi column
    nulled (the combination vanishes from the release); all other
    columns pass through untouched, safe rows unchanged."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    w = Window.partitionBy(*quasi_cols)
    n = F.count(F.lit(1)).over(w)
    safe = n >= k
    return df.select(
        *[
            F.when(safe, F.col(c)).alias(c) if c in quasi_cols else F.col(c)
            for c in df.columns
        ]
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l_threshold: int = 2,
) -> DataFrame:
    """Distinct l-diversity audit — the gate k-anonymity misses
    (Machanavajjhala et al. 2007): a 50-row quasi-group is k-safe, but
    if all 50 share ONE sensitive value the attacker learns it without
    re-identifying anyone (the homogeneity attack). Per quasi
    combination: the row count, the number of DISTINCT sensitive
    values, and the ``is_diverse`` flag (≥ l distinct).

    Scale: one partial-aggregated groupBy on the quasi columns with an
    exact count-distinct of the sensitive value INSIDE the same
    aggregation (Spark's count(DISTINCT x) over a grouped agg — the
    expand is per-group, bounded by group size); output bounded by the
    number of distinct combinations. Null sensitive values are a
    disclosure of their own and count as one distinct value (documented
    — both engines' count(DISTINCT) excludes nulls, so they are added
    back explicitly when present)."""
    if l_threshold < 1:
        raise ValueError(f"l_threshold must be >= 1, got {l_threshold}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    agg = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.countDistinct(F.col(sensitive_col))
            + F.max(
                F.when(F.col(sensitive_col).isNull(), 1).otherwise(0)
            )
        ).alias("n_sensitive"),
    )
    return agg.select(
        *quasi_cols,
        "n_rows",
        "n_sensitive",
        (F.col("n_sensitive") >= l_threshold)
        .cast("int")
        .alias("is_diverse"),
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Laplace-mechanism noisy counts with DETERMINISTIC noise — the
    ε-DP release shape (count + Lap(1/ε) per cell, sensitivity 1 for
    add/remove-one-row) with the noise drawn by inverting the Laplace
    CDF at ``u = md5₆₀(salt|cell)/2⁶⁰`` instead of an RNG: the same
    engine-portable construction as the Poisson bootstrap
    (:func:`~.experiment.bootstrap_mean_ci`), so a release is a pure
    function of (data, ε, salt) — reproducible across engines, runs,
    and partitionings, and SQL-oracle-replayable.

    HONEST CAVEAT (documented, not hidden): a cryptographic-hash draw
    keyed by the cell is pseudorandom, not random — formally this is
    the DP *mechanism shape* with a PRF noise source (the standard
    practice in deterministic/replayable pipelines); an adversary who
    knows the salt can subtract the noise, so the salt must be treated
    as a secret key. For a release where formal ε-DP against
    salt-knowing adversaries is required, swap the draw for a true RNG
    — everything else (sensitivity, scale, clamping) is unchanged.

    Scale: one partial-aggregated groupBy; the noise is in-row
    arithmetic on the cell grain. Noisy counts are rounded to the
    nearest integer and clamped at 0 (the usual post-processing, which
    DP composition permits). Returns ``(*group_cols, noisy_count)`` —
    the true count never appears in the output schema.

    Cell-key injectivity (round-12 ADVICE): group values are ESCAPED
    before the ``\\x1f`` join (``\\x1e`` doubles itself, ``\\x1f`` →
    ``\\x1e u``, ``\\x00`` → ``\\x1e z``), so a value containing the
    separator — or one spelling the ``\\x00null`` sentinel, which
    keeps its raw NUL and is therefore unreachable by any escaped
    value — can no longer collide into another cell and share its
    noise draw.  Second disclosure caveat alongside the PRF one:
    cells with TRUE count 0 are absent from the release (the groupBy
    only sees observed cells), so the released key set leaks the
    active domain; pad the domain upstream if which-cells-exist is
    itself sensitive."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    from intake_esm_spark.functions.text import salted_hash60

    cells = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    # null-SAFE, INJECTIVE cell key: concat_ws SKIPS nulls, so (a,
    # NULL, b) and (a, b) would collide — encode null as a sentinel;
    # and a VALUE containing the \x1f separator (or spelling the
    # sentinel) would collide with a different cell and share its
    # noise draw, so escape \x1e/\x1f/\x00 out of every value first
    # (the sentinel keeps its raw NUL, unreachable after escaping)
    def _esc(c: str):
        s = F.col(c).cast("string")
        s = F.replace(s, F.lit("\x1e"), F.lit("\x1e\x1e"))
        s = F.replace(s, F.lit("\x1f"), F.lit("\x1eu"))
        s = F.replace(s, F.lit("\x00"), F.lit("\x1ez"))
        return F.coalesce(s, F.lit("\x00null"))

    key = F.concat_ws("\x1f", *[_esc(c) for c in group_cols])
    u = (
        salted_hash60(key, salt).cast("double")
        / F.lit(float(2**60))
    )
    # inverse Laplace CDF at u ∈ [0, 1): b = 1/ε, centered at 0.5;
    # clamp the log argument away from 0 (u = 0.5 exactly gives 0)
    b = 1.0 / float(epsilon)
    half = u - F.lit(0.5)
    mag = F.lit(1.0) - F.lit(2.0) * F.abs(half)
    noise = (
        -F.lit(b)
        * F.signum(half)
        * F.log(F.greatest(mag, F.lit(1e-18)))
    )
    noisy = F.greatest(
        F.round(F.col("__n").cast("double") + noise, 0).cast("bigint"),
        F.lit(0),
    )
    return cells.select(*group_cols, noisy.alias("noisy_count"))


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    n_bins: int = 10,
    t_threshold: float = 0.2,
) -> DataFrame:
    """t-closeness audit over a NUMERIC sensitive attribute — the gate
    l-diversity misses (Li et al. 2007): a quasi-group can hold l
    distinct salaries yet still leak ("all of them are the top decile")
    if its sensitive DISTRIBUTION sits far from the corpus's.  Distance
    is the ordered-bin Earth Mover's Distance ``Σ_b |cum_g(b) −
    cum_G(b)| / (B−1)`` over ``n_bins`` equal-width bins of the global
    6dp value range — the standard formulation for ordered attributes.
    Per quasi combination: the row count, the EMD, and the ``is_close``
    flag (EMD ≤ t).

    Scale: one 1-row range aggregate fixes the bin boundaries as
    literals; ONE (quasi, bin)-keyed partial-aggregated collapse builds
    every group histogram; the cumulative walk runs per group over its
    ≤ ``n_bins`` rows (group-partitioned window — bounded frames, never
    an unpartitioned sort); the global distribution is a broadcast
    ``n_bins``-row frame.  Determinism: counts are exact integers; each
    |cum difference| is one fixed IEEE expression over integer-ratio
    doubles, quantized to 12dp DECIMAL before the per-group sum.  Rows
    with a null/non-finite sensitive value are excluded (their
    disclosure risk is l-diversity's department)."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not 0.0 < t_threshold <= 1.0:
        raise ValueError(
            f"t_threshold must be in (0, 1], got {t_threshold}"
        )
    s = F.col(sensitive_col).cast("double")
    clean = df.filter(
        F.col(sensitive_col).isNotNull()
        & ~F.isnan(s)
        & (F.abs(s) != F.lit(float("inf")))
    )
    rng = clean.agg(
        F.min(F.round(s, 6)).alias("__mn"),
        F.max(F.round(s, 6)).alias("__mx"),
    ).collect()[0]
    mn, mx = rng["__mn"], rng["__mx"]
    if mn is None or mx is None:
        raise ValueError("t-closeness: no non-null sensitive values")
    if mx <= mn:
        # constant attribute: every group matches the global
        # distribution exactly — report EMD 0 per group
        agg = clean.groupBy(*quasi_cols).agg(
            F.count(F.lit(1)).alias("n_rows")
        )
        return agg.select(
            *quasi_cols,
            "n_rows",
            F.lit(0.0).alias("emd"),
            F.lit(1).alias("is_close"),
        )
    w = (float(mx) - float(mn)) / n_bins
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.round(s, 6) - F.lit(float(mn))) / F.lit(w)),
        ),
    ).cast("int")
    cells = (
        clean.select(*quasi_cols, b.alias("__b"))
        .groupBy(*quasi_cols, "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)  # feeds group + global walks
    )
    gtot = cells.groupBy(*quasi_cols).agg(
        F.sum("__c").alias("__n")
    )
    # global per-bin counts -> bounded n_bins-row frame, broadcast
    gl = cells.groupBy("__b").agg(F.sum("__c").alias("__gc"))
    gn = cells.agg(F.sum("__c").alias("__gn"))
    from pyspark.sql import Window

    wg = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )  # n_bins-row frame — bounded, benign
    gcum = gl.crossJoin(F.broadcast(gn)).select(
        "__b",
        (
            F.sum("__gc").over(wg).cast("double")
            / F.col("__gn").cast("double")
        ).alias("__cum_all"),
    )
    # per-group cumulative over a DENSE bin axis: left-join each
    # group's sparse histogram onto the global bin frame so missing
    # bins contribute their |cum| gap too
    grid = gtot.crossJoin(F.broadcast(gcum.select("__b")))
    dense = grid.join(cells, [*quasi_cols, "__b"], "left").select(
        *quasi_cols,
        "__b",
        "__n",
        F.coalesce(F.col("__c"), F.lit(0)).alias("__c"),
    )
    wq = (
        Window.partitionBy(*quasi_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cumg = F.sum("__c").over(wq).cast("double") / F.col("__n").cast(
        "double"
    )
    stepped = dense.withColumn("__cumg", cumg).join(
        F.broadcast(gcum), "__b"
    )
    term = F.round(
        F.abs(F.col("__cumg") - F.col("__cum_all"))
        / F.lit(float(n_bins - 1)),
        12,
    ).cast("decimal(38,12)")
    per_group = stepped.filter(
        F.col("__b") < F.lit(n_bins - 1)  # last cum is 1==1, excluded
    ).groupBy(*quasi_cols, "__n").agg(
        F.sum(term).alias("__emd")
    )
    emd = F.col("__emd").cast("double")
    return per_group.select(
        *quasi_cols,
        F.col("__n").alias("n_rows"),
        F.round(emd, 6).alias("emd"),
        (F.round(emd, 6) <= F.lit(t_threshold)).cast("int").alias(
            "is_close"
        ),
    )
