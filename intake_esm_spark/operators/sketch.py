"""Deterministic distinct-count sketches (KMV / bottom-k).

Extension (SURVEY §2.9): cardinality estimation is the canonical
big-data sketch problem — "distinct users per segment" over 100 TB
without paying a full count-distinct shuffle of every key. Spark ships
HyperLogLog (``approx_count_distinct``), but HLL's register layout is
engine-internal and cannot be replayed by any SQL oracle. The KMV
(k-minimum-values) sketch of Bar-Yossef et al. — keep the k smallest
values of a uniform hash; with the k-th smallest at fraction ``u`` of
the hash space, estimate ``(k-1)/u`` distinct keys — is just as
streamable and mergeable, but is a pure ORDER BY/LIMIT construction
over the engine-portable md5-60 hash (functions/text.py:141), so DuckDB
reproduces every kept hash and the estimate bit-for-bit.

Estimator: with ``h_k`` the k-th smallest 60-bit hash,
``n_est = (k-1) * 2^60 / h_k``; when a group has fewer than k distinct
hashes the sketch saw everything and the estimate is the exact count.

100 TB shape
------------
(1) ``distinct (group, hash)`` — map-side-partial dedup, the only
full-data exchange; (2) bottom-k per (group, hash%B) bucket via a
row_number window — B-way parallel per group, each bucket sort spills
independently, output <= k rows per bucket; (3) final bottom-k per
group over the <= B*k survivors — a bounded-input groupBy (collect_list
over at most B*k bigints), no second window. Nothing after step 1
depends on corpus size. Sketches merge associatively (`kmv_union`), so
per-day sketches roll up to per-month without touching raw data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from intake_esm_spark.functions.text import HASH_SPACE_60 as _HASH_SPACE
from intake_esm_spark.functions.text import salted_hash60
_PHASE1_BUCKETS = 64


def _finalize(sk: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Attach n_kept / k-th hash / estimate to a (group, kmv_hashes) frame."""
    n = F.size("kmv_hashes")
    hk = F.element_at("kmv_hashes", n).cast("double")
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / hk
    )
    return sk.select(
        *group_cols,
        "kmv_hashes",
        n.cast("bigint").alias("n_kept"),
        F.round(est, 6).alias("distinct_est"),
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per group: the k smallest md5-60 hashes of ``key_col``
    (``kmv_hashes``, ascending), ``n_kept``, and ``distinct_est``.
    Null keys are excluded (no identity to count)."""
    if k < 2:
        raise ValueError(f"k must be >= 2 for the (k-1)/u estimator, got {k}")
    hashes = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, salted_hash60(F.col(key_col)).alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols, F.pmod("__h", _PHASE1_BUCKETS)).orderBy("__h")
    survivors = (
        hashes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    sk = survivors.groupBy(*group_cols).agg(
        F.slice(F.sort_array(F.collect_list("__h")), 1, k).alias("kmv_hashes")
    )
    return _finalize(sk, group_cols, k)


def kmv_union(a: DataFrame, b: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Merge two KMV sketch frames (outputs of :func:`kmv_distinct` with
    the same key/hash construction): union the kept hashes per group and
    re-take the bottom k. ``kmv(A ∪ B) == kmv_union(kmv(A), kmv(B))`` —
    the mergeability that lets per-shard sketches roll up without
    re-reading data. Groups present in only one side pass through."""
    both = a.select(*group_cols, "kmv_hashes").unionByName(
        b.select(*group_cols, "kmv_hashes")
    )
    sk = both.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv_hashes")))),
            1,
            k,
        ).alias("kmv_hashes")
    )
    return _finalize(sk, group_cols, k)


def kmv_pairwise_overlap(
    sketches: DataFrame,
    group_col: str,
    k: int,
) -> DataFrame:
    """Set-operation estimates between every pair of groups, from their
    KMV sketches alone (no raw data): for groups a < b, the union sketch
    is the k smallest of ``kmv_hashes_a ∪ kmv_hashes_b`` (KMV is closed
    under union — the Beyer et al. construction), ``union_est`` is the
    KMV estimate over it, ``jaccard_est`` is the fraction of the union
    sketch present in BOTH input sketches, and ``intersect_est`` is
    ``jaccard * union``. When the union sketch holds fewer than k hashes
    both sides saw everything and all three numbers are exact.

    The input is an output of :func:`kmv_distinct`; the self-join and
    all the array math run over the GROUP-cardinality frame (one row per
    group) — sketch bytes, never data bytes. This is the ``audience
    overlap between segments`` query at 100 TB: two scans to build the
    sketches once, then every pairwise question answered from KBs.
    """
    # the self-join references the sketch frame twice; unpinned, Spark
    # would run the whole sketch build (two corpus exchanges) per side —
    # the frame is one row per group, so pinning is free
    sketches = sketches.localCheckpoint(eager=False)
    a = sketches.select(
        F.col(group_col).alias("group_a"), F.col("kmv_hashes").alias("__ha")
    )
    b = sketches.select(
        F.col(group_col).alias("group_b"), F.col("kmv_hashes").alias("__hb")
    )
    paired = a.join(b, F.col("group_a") < F.col("group_b"))
    u = F.slice(F.array_sort(F.array_union("__ha", "__hb")), 1, k)
    n_u = F.size(u)
    hk = F.element_at(u, n_u).cast("double")
    union_est = F.when(n_u < k, n_u.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / hk
    )
    c = F.size(F.array_intersect(u, F.array_intersect("__ha", "__hb")))
    jac = c.cast("double") / n_u.cast("double")
    return paired.select(
        "group_a",
        "group_b",
        F.round(union_est, 6).alias("union_est"),
        F.round(jac * union_est, 6).alias("intersect_est"),
        F.round(jac, 6).alias("jaccard_est"),
    )


def _sketch_pos(item: Column, j: Column, modulus: int, salt: str) -> Column:
    """THE single definition of the per-hash-function position used by
    BOTH Count-Min cells and Bloom bits: ``salted_hash60(j # item, salt)
    mod modulus`` (the ``salted_hash60`` single-definition rule — a salt
    or delimiter edit that missed one of the four build/probe sites
    would silently void the CM overestimate / Bloom no-false-negative
    guarantees)."""
    return F.pmod(
        salted_hash60(F.concat(j.cast("string"), F.lit("#"), item), salt),
        F.lit(modulus),
    ).cast("int")


# ---------------------------------------------------------------------------
# Count-Min sketch: frequency estimation / heavy hitters


def cm_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cm",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of the item
    stream: ``depth × width`` counters, each row hashing items with its
    own salted md5-60 function — the FREQUENCY companion of the KMV
    cardinality sketch (same portability argument: Spark's own
    frequent-items sketches are engine-internal; these counters are a
    plain groupBy any engine replays bit-for-bit).

    Returns ``(row, col, n)`` — at most ``depth·width`` rows, whatever
    the corpus size. One explode (×depth, the documented fan-out) into
    ONE map-side-combined aggregation; per-item estimates read
    ``min over rows of counter[row, h_row(item)]``, an overestimate
    with error ≤ ε·N at probability 1−δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.
    Sketches over disjoint corpora merge by element-wise ADDITION
    (:func:`cm_union`) — the stream never needs re-reading."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}, {width}")
    rows = df.select(
        F.col(item_col).cast("string").alias("__it"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).filter(F.col("__it").isNotNull())
    col = _sketch_pos(F.col("__it"), F.col("row"), width, salt)
    return (
        rows.select("row", col.alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cm_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two Count-Min sketches built with the SAME (depth, width,
    salt): element-wise counter addition via one full-outer join on the
    (row, col) cell — both inputs are ≤ depth·width rows, metadata
    scale. The merged sketch is IDENTICAL to the sketch of the
    concatenated streams (counts are additive), which is what makes
    per-shard/per-day sketches roll up exactly."""
    return (
        a.withColumnRenamed("n", "__na")
        .join(b.withColumnRenamed("n", "__nb"), ["row", "col"], "full_outer")
        .select(
            "row",
            "col",
            (
                F.coalesce("__na", F.lit(0)) + F.coalesce("__nb", F.lit(0))
            ).alias("n"),
        )
    )


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cm",
) -> DataFrame:
    """Point-frequency estimates for the ``probes`` items: re-derive
    each probe's ``depth`` cells, look them up in the BROADCAST sketch
    (always ≤ depth·width rows — the probe side can be arbitrarily
    large and never shuffles beyond its own ×depth fan-out and the
    item-keyed min), and take the per-item minimum. A cell absent from
    the sketch means no item ever hashed there → that row's counter is
    0 and the estimate floors at 0 (only possible for items not in the
    stream). Output: ``(item_col, cm_est)`` with the CM guarantee
    ``cm_est >= true count`` for every streamed item."""
    p = probes.select(F.col(item_col).cast("string").alias("__it")).distinct()
    fan = p.select(
        "__it",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    col = _sketch_pos(F.col("__it"), F.col("row"), width, salt)
    looked = fan.select("__it", "row", col.alias("col")).join(
        F.broadcast(sketch), ["row", "col"], "left"
    )
    return (
        looked.groupBy("__it")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cm_est"))
        .select(F.col("__it").alias(item_col), "cm_est")
    )


# ---------------------------------------------------------------------------
# Bloom filter: set membership


def bloom_build(
    df: DataFrame,
    item_col: str,
    n_hashes: int = 7,
    n_bits: int = 65536,
    salt: str = "bf",
) -> DataFrame:
    """Bloom filter (Bloom 1970) of the item set — the MEMBERSHIP
    companion completing the sketch trio (KMV = cardinality, Count-Min
    = frequency): "have we ever seen this key?" over 100 TB without
    shipping the key set. Spark's own ``bloom_filter_agg`` is a binary
    engine-internal blob; this one is the set of SET BIT POSITIONS —
    one ``(pos)`` row per lit bit, ≤ ``n_bits`` rows however large the
    input — so a SQL oracle replays it bit-for-bit and two filters
    merge by plain ``union().distinct()`` (:func:`bloom_merge`).

    Plan: ×``n_hashes`` in-row fan-out → one map-side-combined
    distinct. For the classic error math, ``n_hashes ≈ (m/n)·ln 2``
    and FP rate ≈ ``(1 − e^{−kn/m})^k``; at the defaults (k=7,
    m=64Ki) a 6k-item set false-positives at ~0.8%."""
    if n_hashes < 1 or n_bits < 2:
        raise ValueError(
            f"need n_hashes >= 1, n_bits >= 2; got {n_hashes}, {n_bits}"
        )
    rows = df.select(
        F.col(item_col).cast("string").alias("__it"),
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("__j"),
    ).filter(F.col("__it").isNotNull())
    pos = _sketch_pos(F.col("__it"), F.col("__j"), n_bits, salt)
    return rows.select(pos.alias("pos")).distinct()


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of two Bloom filters built with the SAME (n_hashes, n_bits,
    salt): bitwise OR == union of set positions. Identical to the
    filter of the concatenated inputs — per-shard filters roll up
    without re-reading data."""
    return a.unionAll(b).distinct()


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    item_col: str,
    n_hashes: int = 7,
    n_bits: int = 65536,
    salt: str = "bf",
) -> DataFrame:
    """Membership test: ``(item_col, might_contain)`` — true iff ALL
    ``n_hashes`` of the item's bit positions are set. No false
    negatives ever (every inserted item's bits are set by
    construction); false positives at the documented rate. The filter
    (≤ ``n_bits`` rows) is BROADCAST; probes fan out ×``n_hashes``
    in-row and collapse with one item-keyed count — the probe side
    never shuffles the filter."""
    p = probes.select(F.col(item_col).cast("string").alias("__it")).distinct()
    fan = p.select(
        "__it",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("__j"),
    )
    pos = _sketch_pos(F.col("__it"), F.col("__j"), n_bits, salt)
    looked = fan.select("__it", pos.alias("pos")).join(
        F.broadcast(bloom.withColumn("__hit", F.lit(1))), "pos", "left"
    )
    return (
        looked.groupBy("__it")
        .agg(
            (F.count(F.lit(1)) == F.sum(F.coalesce("__hit", F.lit(0)))).alias(
                "might_contain"
            )
        )
        .select(F.col("__it").alias(item_col), "might_contain")
    )


# ---------------------------------------------------------------------------
# hash-sample quantile sketch


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    key_col: str,
    group_cols: list[str],
    k: int = 256,
    salt: str = "qs",
) -> DataFrame:
    """Per-group mergeable quantile sketch completing the quartet (KMV =
    cardinality, Count-Min = frequency, Bloom = membership): keep the
    ``k`` rows whose salted md5-60 hash of ``key_col`` is smallest —
    a UNIFORM k-sample selected by hash order, so (unlike reservoir
    sampling) it is partition-independent, engine-replayable, AND
    mergeable: the bottom-k of two sketches' union is exactly the
    sketch of the concatenated data (:func:`quantile_sketch_merge`).
    Spark's own ``approx_percentile`` (GK) summaries can't be hash-
    checked across engines; this one can. Sampling error is the
    standard ~1/√k quantile noise; ``k >= group size`` degenerates to
    the exact distribution.

    Returns one row per group: ``(group_cols..., qs_hashes, qs_values,
    n_kept)`` — values ordered BY HASH (the merge key); quantile
    extraction sorts by value (:func:`sketch_quantiles`). Null values
    or keys are excluded, and the sample is over DISTINCT (hash, value)
    pairs — a duplicated (key, value) row carries no extra information,
    and pair-set semantics are what make the merge and the streaming
    twin (both set-based) bit-equal to this one-pass form. Same
    two-phase bottom-k as ``kmv_distinct`` (bucket-parallel phase 1,
    ≤ B·k rows in phase 2)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    rows = (
        df.filter(F.col(value_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            *group_cols,
            salted_hash60(F.col(key_col), salt).alias("__h"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .distinct()
    )
    w = Window.partitionBy(*group_cols, F.pmod("__h", _PHASE1_BUCKETS)).orderBy(
        "__h"
    )
    survivors = (
        rows.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    pairs = F.slice(
        F.array_sort(F.collect_list(F.struct("__h", "__v"))), 1, k
    )
    return survivors.groupBy(*group_cols).agg(
        F.transform(pairs, lambda s: s["__h"]).alias("qs_hashes"),
        F.transform(pairs, lambda s: s["__v"]).alias("qs_values"),
        F.least(F.count(F.lit(1)), F.lit(k)).alias("n_kept"),
    )


def quantile_sketch_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """Merge two quantile sketches built with the same (key, salt, k):
    re-take the bottom-k of the unioned DISTINCT (hash, value) pairs —
    bit-equal to the one-pass sketch of the concatenated data (both
    operate on pair SETS: colliding hashes with different values stay
    as two pairs, duplicated pairs collapse, on both paths)."""
    both = a.select(*group_cols, "qs_hashes", "qs_values").unionByName(
        b.select(*group_cols, "qs_hashes", "qs_values")
    )
    exploded = both.select(
        *group_cols,
        F.explode(F.arrays_zip("qs_hashes", "qs_values")).alias("__p"),
    ).select(
        *group_cols,
        F.col("__p.qs_hashes").alias("__h"),
        F.col("__p.qs_values").alias("__v"),
    ).distinct()
    pairs = F.slice(
        F.array_sort(F.collect_list(F.struct("__h", "__v"))), 1, k
    )
    return exploded.groupBy(*group_cols).agg(
        F.transform(pairs, lambda s: s["__h"]).alias("qs_hashes"),
        F.transform(pairs, lambda s: s["__v"]).alias("qs_values"),
        F.least(F.count(F.lit(1)), F.lit(k)).alias("n_kept"),
    )


def sketch_quantiles(
    sk: DataFrame,
    probs: list[float],
    group_cols: list[str],
    out_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a :func:`quantile_sketch` frame: sort the
    kept values, SELECT the element at rank ``max(1, ceil(p·m))``
    (type-1 — element selection, no interpolation, the Theil-Sen
    engine-exactness rule). In-row over the ≤ k-element arrays — no
    shuffle at all."""
    if not probs:
        raise ValueError("probs must be non-empty")
    out_cols = out_cols or [
        "p" + format(p * 100, "g").replace(".", "_") for p in probs
    ]
    if len(out_cols) != len(probs):
        raise ValueError("out_cols must match probs in length")
    sorted_vals = F.array_sort("qs_values")
    m = F.col("n_kept")
    sel = []
    for p, name in zip(probs, out_cols):
        rank = F.greatest(F.lit(1), F.ceil(m * F.lit(float(p))).cast("int"))
        sel.append(
            F.round(F.element_at(sorted_vals, rank), 6).alias(name)
        )
    return sk.select(*group_cols, "n_kept", *sel)
