"""Corpus-level text statistics for training-data pipelines.

These are the aggregate views a data curation loop reads before deciding
filters: the token vocabulary (is the corpus full of markup junk?), and
document-length distribution (where to cut truncation). Both are single
map-side-combined aggregations over in-row tokenization — no Python in
the hot path, no shuffle beyond the one the aggregation needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Column

from intake_esm_spark.functions.text import shingles, words_array
from intake_esm_spark.operators._util import _spread


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Top-k most frequent normalized tokens: (token, n_docs-agnostic
    total frequency), ordered by frequency desc then token asc (a total
    order, so the k-boundary is deterministic and oracle-checkable).

    Plan: in-row normalize+split (zero shuffle), explode, ONE
    map-side-combined count aggregation, then a TakeOrderedAndProject —
    top-k never sorts the full vocabulary globally; each partition ships
    only its local top-k to the driver-side merge. At 100 TB the shuffle
    carries (token, partial_count) pairs only."""
    tokens = (
        _spread(df.select(text_col))
        .select(F.explode(words_array(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
    )
    return (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(k)
    )


def length_histogram(
    df: DataFrame, text_col: str = "text", bin_width: int = 100
) -> DataFrame:
    """Document-length histogram: (bin_start, n_docs) with bins of
    ``bin_width`` characters — one aggregation, keyed by a derived bin
    column, map-side combined."""
    bin_start = (F.floor(F.length(F.col(text_col)) / bin_width) * bin_width).cast(
        "long"
    )
    return (
        df.select(bin_start.alias("bin_start"))
        .groupBy("bin_start")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _rle_fold(sorted_arr: Column, finish=None) -> Column:
    """Run-length stats of an ALREADY-SORTED array as ONE left fold
    (``F.aggregate``): returns ``struct(best, n_distinct, n)`` where
    ``best`` is the longest run of equal elements, ``n_distinct`` the
    number of runs, and ``n`` the element count. Input must be non-empty.
    ``finish`` overrides the output projection (it receives the
    accumulator struct) — callers that need a single scalar predicate
    pass one so the WHOLE computation stays a single-reference
    expression (see the pushdown note below).

    Why a fold and not the prettier zip_with/slice pipeline: Catalyst
    re-inlines alias definitions when it pushes a predicate through a
    projection, and there is NO common-subexpression elimination inside
    or across higher-order lambdas — an RLE built from zip_with/slice
    references the (expensive) sorted-shingle array ~8 times, so a
    downstream ``filter(top_frac <= t)`` was measured evaluating the
    regex shingling 31 times PER ROW after pushdown. The fold references
    its input exactly ONCE, bounding any inlining blow-up to the number
    of output references (~2) instead of ~30."""
    s = sorted_arr

    def _step(acc: Column, x: Column) -> Column:
        is_new = acc["prev"].isNull() | (x != acc["prev"])
        cur = F.when(is_new, F.lit(1)).otherwise(acc["cur"] + 1)
        return F.struct(
            x.alias("prev"),
            cur.alias("cur"),
            F.greatest(acc["best"], cur).alias("best"),
            (acc["n_distinct"] + F.when(is_new, 1).otherwise(0)).alias("n_distinct"),
            (acc["n"] + 1).alias("n"),
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("cur"),
        F.lit(0).alias("best"),
        F.lit(0).alias("n_distinct"),
        F.lit(0).alias("n"),
    )
    if finish is None:
        finish = lambda acc: F.struct(  # noqa: E731
            acc["best"].alias("best"),
            acc["n_distinct"].alias("n_distinct"),
            acc["n"].alias("n"),
        )
    return F.aggregate(s, init, _step, finish)


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Per-document repetition signals (Gopher-style quality rules: drop
    docs whose most-frequent n-gram covers too much of the text, or
    whose distinct-n-gram ratio is too low — boilerplate/spam markers).

    Output: ``(id_col, n_grams, n_distinct, top_count, top_frac,
    distinct_ratio)`` where ``top_count`` is the occurrence count of the
    document's most frequent word n-gram.

    100 TB design: the naive plan (explode n-grams, groupBy (doc, gram),
    groupBy doc) shuffles one row PER TOKEN of the corpus — at 100 TB
    that shuffle is the whole corpus again. This implementation computes
    the same numbers **entirely in-row**: single-pass regex shingling
    (``functions.text.shingles``), ``array_sort``, then run-length
    encoding as ONE ``F.aggregate`` fold — zero shuffle, zero Python,
    the operator is a pure projection that pipelines into whatever runs
    next. The sorted array and the fold result are each materialized in
    their OWN projection and the fold references its input exactly once
    (see ``_rle_fold`` for why that matters under predicate pushdown).
    Cross-checked against the exploded two-agg plan in tests.

    Null-text documents are OMITTED (they have no n-grams) — the same
    contract as the exploded plan and the SQL oracle's unnest."""
    s_df = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.array_sort(shingles(F.col(text_col), n)).alias("__s")
    )
    r_df = s_df.select(
        F.col(id_col),
        F.size("__s").cast("bigint").alias("n_grams"),
        _rle_fold(F.col("__s")).alias("__rle"),
    )
    total_d = F.col("n_grams").cast("double")
    return r_df.select(
        F.col(id_col),
        F.col("n_grams"),
        F.col("__rle")["n_distinct"].cast("bigint").alias("n_distinct"),
        F.col("__rle")["best"].cast("bigint").alias("top_count"),
        (F.col("__rle")["best"].cast("bigint") / total_d).alias("top_frac"),
        (F.col("__rle")["n_distinct"].cast("bigint") / total_d).alias("distinct_ratio"),
    )


def source_overlap(
    fps: DataFrame,
    fingerprint_col: str = "fingerprint",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source content overlap — the dataset-audit staple ("how much
    of source A's content also appears in source B"): given ANY
    (fingerprint, source)-granularity frame (document fingerprints via
    ``functions.text.fingerprint_md5``, line fingerprints via the
    structural-dedup segmentation, gram hashes, ...), returns one row per
    unordered source pair with the count of distinct shared fingerprints
    — ``(source_a, source_b, shared)`` with ``source_a < source_b``.

    100 TB shape: the input collapses to DISTINCT (fingerprint, source)
    first (map-side partial), so the fingerprint-keyed self-join's output
    is bounded by sum over fingerprints of s_fp^2 where s_fp <= the
    number of SOURCES holding that fingerprint — a small constant per
    key, never a row-count blowup. One fp-keyed exchange + one pair-keyed
    aggregation; nothing corpus-sized shuffles twice."""
    d = fps.select(
        F.col(fingerprint_col).alias("__fp"), F.col(source_col).alias("__src")
    ).distinct()
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__fp") == F.col("b.__fp"))
            & (F.col("a.__src") < F.col("b.__src")),
        )
        .groupBy(
            F.col("a.__src").alias("source_a"),
            F.col("b.__src").alias("source_b"),
        )
        .agg(F.countDistinct(F.col("a.__fp")).alias("shared"))
    )


def gram_duplication(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_doc_freq: int = 2,
) -> DataFrame:
    """Per-document duplication EXPOSURE: the fraction of a document's
    distinct word ``n``-grams that appear in >= ``min_doc_freq`` documents
    corpus-wide — ``(id_col, n_grams, n_dup_grams, dup_frac)``. The
    signal between ``repetition_stats`` (intra-document) and pairwise
    dedup: a templated document assembled from corpus-common fragments
    scores high even when no single pair crosses a Jaccard threshold
    (so no dedup pass would remove it).

    Shape: distinct per-doc grams hashed to 60-bit keys (the
    contamination trick — 8-byte shuffle keys, not 40-byte strings);
    gram document-frequency is a count over those already-distinct rows;
    frequency joins back gram-keyed and the per-doc fraction is one
    aggregation. Like tf·idf, the gram pass runs twice (frequency branch
    + join branch — skew-safe; a per-gram window would put a universal
    gram's every row in one task). Fractions are exact integer ratios —
    no rounding needed for engine agreement."""
    from intake_esm_spark.functions.text import portable_hash60, shingles

    grams = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(shingles(F.col(text_col), n), portable_hash60)
            )
        ).alias("__g"),
    )
    gdf = grams.groupBy("__g").agg(F.count(F.lit(1)).alias("__df"))
    joined = grams.join(gdf, "__g")
    dup = (F.col("__df") >= min_doc_freq).cast("bigint")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(dup).alias("n_dup_grams"),
        (F.sum(dup).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "dup_frac"
        ),
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    delta: float = 1.0,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` two-word collocations by the word2vec phrase score
    ``(n_ab − δ) · N / (n_a · n_b)`` (Mikolov et al. 2013) — the phrase
    detector a tokenization pipeline runs to merge "new york"-style
    bigrams before training. ``n_ab`` counts ADJACENT ordered pairs in
    the normalized token stream; ``δ`` discounts rare accidents;
    ``N`` is the corpus token count, making the score the observed/
    expected co-occurrence lift (exact integer arithmetic in double —
    no logs, so no last-ulp PMI drift between engines).

    Plan: in-row normalize + split (materialized once — the
    ``words_array`` lambda rule), bigrams as one ``transform`` over the
    index sequence (zero shuffle), then THREE map-side-combined count
    aggregates (unigrams, bigrams, the 1-row token total) joined
    item-keyed — unigram frames AQE-broadcast; top-k is a
    ``TakeOrderedAndProject`` over (rounded score desc, bigram asc),
    never a global sort of the bigram vocabulary."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # w is deliberately NOT pinned despite two references (unigram and
    # bigram branches): checkpointing the tokenized corpus materializes
    # ~corpus-size state, while the duplicate cost is one extra scan +
    # in-row split — the cheap side of that trade at 100 TB. The SMALL
    # frames are pinned: uni seeds both confidence joins, and the token
    # total derives from uni (Σn₁ — exact) instead of re-reading tokens.
    w = _spread(df.select(text_col)).select(
        words_array(F.col(text_col)).alias("__w")
    )
    tokens = w.select(F.explode("__w").alias("__t")).filter(
        F.col("__t") != ""
    )
    uni = (
        tokens.groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__n1"))
        .localCheckpoint(eager=False)
    )
    total = uni.agg(F.sum("__n1").alias("__nt"))
    bi = (
        w.filter(F.size("__w") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__w") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("__w", i), F.element_at("__w", i + 1)
                    ),
                )
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    parts = F.split("bigram", " ")
    bi2 = bi.select(
        "bigram",
        "n_pair",
        F.element_at(parts, 1).alias("__wa"),
        F.element_at(parts, 2).alias("__wb"),
    )
    j = (
        bi2.join(
            uni.select(F.col("__t").alias("__wa"), F.col("__n1").alias("n_a")),
            "__wa",
        )
        .join(
            uni.select(F.col("__t").alias("__wb"), F.col("__n1").alias("n_b")),
            "__wb",
        )
        .crossJoin(F.broadcast(total))
    )
    score = (
        (F.col("n_pair").cast("double") - F.lit(float(delta)))
        * F.col("__nt").cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    return (
        j.select(
            "bigram",
            "n_pair",
            "n_a",
            "n_b",
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("bigram"))
        .limit(k)
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """Zipf's-law fit of the corpus term-frequency distribution: the
    least-squares slope of ``ln(freq)`` on ``ln(rank)`` over the
    ``top_n`` most frequent tokens — the one-number "does this corpus
    look like natural language" diagnostic (clean prose fits ≈ −1;
    boilerplate/log spam flattens the head, OCR noise fattens the
    tail). Returns one row ``(n_terms, total_tokens, slope, intercept,
    r2)``; slope/r2 are null when fewer than 2 distinct terms exist or
    the ranks are degenerate.

    Plan: :func:`vocab_topk`'s shape — in-row tokenize, ONE map-side-
    combined token count, ``TakeOrderedAndProject`` top-n (freq desc,
    token asc: a total order, so ranks are deterministic) — then the
    regression runs on the ≤ top_n-row survivor frame: rank stamp via
    row_number over the bounded post-limit frame (the dsir_select
    pattern), decimal ln-moment fold (each ln quantized to 9dp
    DECIMAL(18,9) before summing — order-independent), slope/r² as
    fixed IEEE expressions over the 1-row moments. ``total_tokens``
    (the full count, not just the head) comes from the same count
    collapse via a 1-row broadcast aggregate."""
    if top_n < 2:
        raise ValueError(f"top_n must be >= 2, got {top_n}")
    from pyspark.sql import Window

    counts = (
        _spread(df.select(text_col))
        .select(F.explode(words_array(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=False)  # feeds total AND the top-n head
    )
    total = counts.agg(
        F.coalesce(F.sum("freq"), F.lit(0)).alias("total_tokens")
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    head = (
        counts.orderBy(F.desc("freq"), F.asc("token"))
        .limit(top_n)
        .select("freq", F.row_number().over(w).alias("__rk"))
    )
    lx = F.round(F.log(F.col("__rk").cast("double")), 9).cast("decimal(18,9)")
    ly = F.round(F.log(F.col("freq").cast("double")), 9).cast("decimal(18,9)")
    lxw = F.round(F.log(F.col("__rk").cast("double")), 9).cast("decimal(19,9)")
    m = head.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(lx).alias("__sx"),
        F.sum(ly).alias("__sy"),
        F.sum(lxw * lx).alias("__sxx"),
        F.sum(lxw * ly).alias("__sxy"),
        F.sum(
            F.round(F.log(F.col("freq").cast("double")), 9).cast(
                "decimal(19,9)"
            )
            * ly
        ).alias("__syy"),
    )
    n = F.col("n_terms").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    sxy = F.col("__sxy").cast("double")
    syy = F.col("__syy").cast("double")
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    num = n * sxy - sx * sy
    slope = F.when((F.col("n_terms") >= 2) & (den_x > 0), num / den_x)
    intercept = (sy - slope * sx) / n
    r2 = F.when(
        (F.col("n_terms") >= 2) & (den_x > 0) & (den_y > 0),
        (num * num) / (den_x * den_y),
    )
    return m.crossJoin(F.broadcast(total)).select(
        "n_terms",
        "total_tokens",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def source_keywords(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Top-``k`` characteristic tokens per source by tf-idf
    ``tf · ln(S / df)`` — tf the token's count within the source, df
    the number of sources containing it, S the source count — the
    "what is each slice of the corpus actually about" summary run
    before choosing mixture weights. Tokens in every source score 0
    (ln 1) and never surface; ``min_count`` drops hapax noise.

    Plan: in-row tokenize, ONE (group, token) count collapse (map-side
    partial — the only corpus-grain exchange), then df/S aggregates on
    the group-token frame (vocabulary scale) with S broadcast back;
    per-group top-k via rank over (score desc, token asc) — a
    ``WindowGroupLimit`` partial pass ships at most k rows per
    (group, partition). Determinism: tf/df/S are exact integers; the
    score is one ln over their exact ratio, 6dp-rounded, with the
    (score desc, token asc) total order making the k-boundary
    engine-stable."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    from pyspark.sql import Window

    gt = (
        _spread(df.filter(F.col(group_col).isNotNull()).select(group_col, text_col))
        .select(
            F.col(group_col).alias("grp"),
            F.explode(words_array(F.col(text_col))).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("grp", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .filter(F.col("tf") >= min_count)
        .localCheckpoint(eager=False)  # feeds df counts AND the rank
    )
    dfreq = gt.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    s = gt.agg(F.countDistinct("grp").alias("__s"))
    scored = (
        gt.join(dfreq, "token")
        .crossJoin(F.broadcast(s))
        .select(
            "grp",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    F.col("__s").cast("double") / F.col("df").cast("double")
                ),
                6,
            ).alias("score"),
        )
        .filter(F.col("score") > 0)
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group_col), "token", "tf", "df", "score", "rank"
        )
    )


def source_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    min_count: int = 2,
    max_groups: int = 100,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the sources' unigram
    distributions — the "how different are these corpus slices really"
    number behind mixture design and drift monitoring (0 = identical
    wording, ln 2 ≈ 0.693 = disjoint vocabularies; symmetric and
    bounded, unlike raw KL). Token mass missing from one side
    contributes its exact ``p·ln 2`` term (JSD needs no smoothing —
    ``m = (p+q)/2`` is never zero where either side has mass).

    Plan: ONE (group, token) count collapse (the only corpus-grain
    exchange, map-side partial) + group totals broadcast back; the
    pairwise self-join runs at (vocabulary × pairs) scale on the
    group-token frame, so group cardinality is GUARDED: ``max_groups``
    (default 100 — a mixture has tens of components, not thousands) is
    enforced LAZILY in-plan by an ``assert_true`` over the
    group-cardinality totals frame, broadcast onto both probability
    sides BEFORE the pair join — no eager probe scan, the plan stays
    lazy like every other operator, and a caller passing a
    high-cardinality column (domain instead of source) gets an
    informative runtime error on the join's inputs instead of a
    quadratic explosion (the linkage ``max_block_rows`` convention,
    raised at execution rather than construction). Determinism:
    probabilities are exact-integer ratios in double; each
    ``x·ln(...)`` term quantizes to 12dp DECIMAL(28,12) before the
    cross-token sum (the chi-square cell rule), so accumulation is
    order-independent; final JSD = half the exact term sum, 6dp.
    Returns one row per unordered pair ``(group_a, group_b,
    n_tokens_a, n_tokens_b, jsd)`` — INCLUDING fully-disjoint pairs at
    exactly ``jsd = ln 2`` (the maximal-divergence case a drift monitor
    most wants to see; absence must never read as "no drift"). Groups
    whose every token falls under ``min_count`` carry no distribution
    and are absent entirely."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if max_groups < 2:
        raise ValueError(f"max_groups must be >= 2, got {max_groups}")
    gt = (
        _spread(df.filter(F.col(group_col).isNotNull()).select(group_col, text_col))
        .select(
            F.col(group_col).alias("grp"),
            F.explode(words_array(F.col(text_col))).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("grp", "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .localCheckpoint(eager=False)  # feeds totals AND both join sides
    )
    tot = (
        gt.groupBy("grp")
        .agg(F.sum("n").alias("tot"))
        # pinned: feeds both probability sides AND the all-pairs frame
        .localCheckpoint(eager=False)
    )
    # LAZY cardinality guard: a 1-row count over the (checkpointed,
    # group-sized) totals frame, broadcast onto BOTH pair-join inputs as
    # an assert_true filter — it executes with the plan (no eager probe
    # scan) and aborts the job before the quadratic join can emit when a
    # high-cardinality group column sneaks in
    ngroups = tot.agg(F.count(F.lit(1)).alias("__ng"))
    guard = F.assert_true(
        F.col("__ng") <= F.lit(max_groups),
        F.lit(
            f"source_divergence: more than {max_groups} distinct groups "
            "— the pair join is (vocabulary x pairs)-quadratic in "
            "groups; pass a coarser group column or raise max_groups "
            "explicitly"
        ),
    ).isNull()
    gt_g = (
        gt.crossJoin(F.broadcast(ngroups)).filter(guard).drop("__ng")
    )
    # the guard must sit on EVERY quadratic branch: the all-pairs frame
    # below is built straight from the totals frame, so an unguarded
    # tot would still materialize the O(G²) pair join before the
    # guarded token branch ever executed (round-11 ADVICE fix)
    tot_g = (
        tot.crossJoin(F.broadcast(ngroups)).filter(guard).drop("__ng")
    )
    a = gt_g.join(tot, "grp").select(
        F.col("grp").alias("ga"),
        "token",
        (F.col("n").cast("double") / F.col("tot").cast("double")).alias("pa"),
        F.col("tot").alias("ta"),
    )
    b = gt_g.join(tot, "grp").select(
        F.col("grp").alias("gb"),
        "token",
        (F.col("n").cast("double") / F.col("tot").cast("double")).alias("pb"),
        F.col("tot").alias("tb"),
    )
    # shared-token terms (ordered pairs); the one-sided mass needs no
    # second token join — see the ln2 recovery below
    paired = (
        a.join(b, "token", "inner")
        .filter(F.col("ga") < F.col("gb"))
        .select("ga", "gb", "pa", "pb")
    )
    # terms where both sides have mass
    m2 = F.col("pa") + F.col("pb")  # 2m
    term_both = F.round(
        F.col("pa") * F.log(F.lit(2.0) * F.col("pa") / m2)
        + F.col("pb") * F.log(F.lit(2.0) * F.col("pb") / m2),
        12,
    ).cast("decimal(28,12)")
    shared = paired.groupBy("ga", "gb").agg(
        F.sum(term_both).alias("__sb"),
        F.sum(F.round(F.col("pa"), 12).cast("decimal(28,12)")).alias("__ma"),
        F.sum(F.round(F.col("pb"), 12).cast("decimal(28,12)")).alias("__mb"),
    )
    # EVERY unordered pair of groups gets a row — built from the
    # max_groups-bounded totals frame, then left-joined with the shared
    # sums so a fully-disjoint pair coalesces to zero shared mass and
    # reports exactly ln 2 instead of silently vanishing
    ta_f = tot_g.select(F.col("grp").alias("ga"), F.col("tot").alias("ta"))
    tb_f = tot_g.select(F.col("grp").alias("gb"), F.col("tot").alias("tb"))
    all_pairs = ta_f.join(tb_f, F.col("ga") < F.col("gb"))
    joined = all_pairs.join(shared, ["ga", "gb"], "left")
    # one-sided mass (tokens absent from the other group) contributes
    # x·ln2 exactly: sum = (1 − shared_mass)·ln2 per side — recovered
    # from the shared-mass totals, no second join needed
    ln2 = 0.6931471805599453
    jsd = (
        F.coalesce(F.col("__sb").cast("double"), F.lit(0.0))
        + (
            F.lit(2.0)
            - F.coalesce(F.col("__ma").cast("double"), F.lit(0.0))
            - F.coalesce(F.col("__mb").cast("double"), F.lit(0.0))
        )
        * F.lit(ln2)
    ) / F.lit(2.0)
    return joined.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        F.col("ta").alias("n_tokens_a"),
        F.col("tb").alias("n_tokens_b"),
        F.round(jsd, 6).alias("jsd"),
    )


def bpe_pair_topk(
    df: DataFrame, text_col: str = "text", top_k: int = 20
) -> DataFrame:
    """Top adjacent character-pair frequencies within words — the
    inner loop of a BPE tokenizer trainer (Sennrich et al. 2016: each
    merge round promotes the corpus-wide most frequent adjacent
    symbol pair; this operator IS that argmax, over the initial
    character alphabet).  Returns ``(pair, cnt)``, count-desc with a
    lexicographic tie-break — the merge the trainer would pick first,
    then the runners-up.

    Scale: the pair fan-out is IN-ROW (a transform/sequence walk over
    each word inside codegen — no self-join, no per-character rows
    crossing the wire raw); the aggregation is map-side combined down
    to the bounded pair alphabet (≤ |chars|², a few thousand keys for
    any human script) and the top-k is a per-partition
    TakeOrderedAndProject, never a global sort.  Words shorter than 2
    characters contribute nothing (guarded BEFORE sequence() — Spark's
    sequence(1, 0) counts DOWN, it is not empty)."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    words = df.filter(F.col(text_col).isNotNull()).select(
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: F.length(t) >= 2,
            )
        ).alias("__w")
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(__w) - 1),"
                " i -> concat(substring(__w, i, 1),"
                " substring(__w, i + 1, 1)))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(top_k)
    )


def heaps_fit(points: list[tuple[int, int]]) -> dict:
    """Closed-form log-log least squares for Heaps' law ``V = K·Tᵝ``
    over per-group ``(tokens, vocab)`` points — ONE shared
    implementation for the Spark operator and the DuckDB oracle
    builder (python ``math.log`` both sides, no engine libm).
    Returns ``{n_groups, beta, log10_k, r2}`` rounded 6dp; requires
    ≥ 2 points with T > 0, V > 0 and non-degenerate spread."""
    import math

    pts = [(t, v) for t, v in points if t > 0 and v > 0]
    if len(pts) < 2:
        raise ValueError(
            f"heaps: need >= 2 positive (tokens, vocab) points, "
            f"got {len(pts)}"
        )
    xs = [math.log10(t) for t, _v in pts]
    ys = [math.log10(v) for _t, v in pts]
    n = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    den = n * sxx - sx * sx
    if den <= 1e-15:
        raise ValueError(
            "heaps: all groups have the same token count — "
            "the exponent is unidentifiable"
        )
    beta = (n * sxy - sx * sy) / den
    log_k = (sy - beta * sx) / n
    sst = syy - sy * sy / n
    sse = syy - log_k * sy - beta * sxy
    r2 = 1.0 - sse / sst if sst > 0 else None
    return {
        "n_groups": n,
        "beta": round(beta, 6),
        "log10_k": round(log_k, 6),
        "r2": round(r2, 6) if r2 is not None else None,
    }


MAX_HEAPS_GROUPS = 64


def heaps_law_report(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit across corpus slices: per
    ``group_col`` the exact token total T and distinct-token vocab V,
    then the log-log least-squares exponent β of ``V = K·Tᵝ`` — the
    "how fast does new data stop bringing new words" curve that sizes
    tokenizer vocabularies and dedup dictionaries (β ≈ 0.4-0.6 for
    natural language; β → 1 means the corpus never repeats itself —
    a synthetic-data smell).

    Scale: ONE explode + (group, token)-keyed partial-aggregated
    distinct + a group-keyed collapse — output bounded by the group
    cardinality, which a ``limit`` probe caps at ``MAX_HEAPS_GROUPS``
    BEFORE anything unbounded reaches the driver; the fit is driver
    arithmetic over the bounded points through the SAME shared
    :func:`heaps_fit` the oracle replays.  Returns one row
    ``(n_groups, beta, log10_k, r2)``."""
    base = df.filter(
        F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
    )
    probe = (
        base.select(group_col)
        .distinct()
        .limit(MAX_HEAPS_GROUPS + 1)
        .collect()
    )
    if len(probe) > MAX_HEAPS_GROUPS:
        raise ValueError(
            f"heaps: more than MAX_HEAPS_GROUPS={MAX_HEAPS_GROUPS} "
            "groups — pre-bucket the grouping column"
        )
    tok = base.select(
        F.col(group_col).alias("__g"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("__t"),
    )
    pts = (
        tok.groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("__T"),
            F.countDistinct("__t").alias("__V"),
        )
        .collect()
    )
    sol = heaps_fit(
        sorted((int(r["__T"]), int(r["__V"])) for r in pts)
    )
    return df.sparkSession.createDataFrame(
        [
            (
                sol["n_groups"],
                sol["beta"],
                sol["log10_k"],
                sol["r2"],
            )
        ],
        "n_groups int, beta double, log10_k double, r2 double",
    )
