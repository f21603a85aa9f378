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
from intake_esm_spark.operators.dedup import _spread


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


def _run_lengths(sorted_arr: Column) -> Column:
    """Run lengths of consecutive equal elements in an ALREADY-SORTED
    array, computed entirely in-row with array built-ins (no explode):
    mark positions where the value changes, pair each run start with the
    next, diff. Input must be non-empty."""
    s = sorted_arr
    k = F.size(s)
    # s shifted right by one (None sentinel first): s_prev[i] == s[i-1]
    s_prev = F.concat(
        F.array(F.lit(None).cast("string")), F.slice(s, 1, F.greatest(k - 1, F.lit(0)))
    )
    new_flag = F.zip_with(s, s_prev, lambda a, b: b.isNull() | (a != b))
    idx = F.sequence(F.lit(1), k)
    starts = F.filter(
        F.zip_with(new_flag, idx, lambda f, i: F.when(f, i)),
        lambda x: x.isNotNull(),
    )
    ends = F.concat(
        F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
        F.array(k + 1),
    )
    return F.zip_with(starts, ends, lambda a, b: b - a)


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
    encoding with array built-ins — zero shuffle, zero Python, the
    operator is a pure projection that pipelines into whatever runs
    next. Cross-checked against the exploded two-agg plan in tests."""
    s = F.array_sort(shingles(F.col(text_col), n))
    runs = _run_lengths(s)
    total = F.size(s).cast("bigint")
    distinct = F.size(runs).cast("bigint")
    top = F.array_max(runs).cast("bigint")
    return df.select(
        F.col(id_col),
        total.alias("n_grams"),
        distinct.alias("n_distinct"),
        top.alias("top_count"),
        (top / total.cast("double")).alias("top_frac"),
        (distinct / total.cast("double")).alias("distinct_ratio"),
    )
