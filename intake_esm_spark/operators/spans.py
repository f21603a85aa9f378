"""Exact substring-run dedup — the third dedup modality.

Document-level dedup (``operators.dedup``, MinHash/SimHash) removes
whole near-identical documents; line-level structural dedup
(``operators.structural``) removes boilerplate lines. Both miss LONG
VERBATIM SPANS embedded in otherwise-distinct documents — the quoted
article inside a blog post, the license text pasted mid-README, the
copied paragraph that makes two documents 20% identical and 80%
different. Lee et al., "Deduplicating Training Data Makes Language
Models Better" (ACL 2022), attack exactly this with a suffix array over
the concatenated corpus; a suffix array is inherently sequential and
memory-resident, so this module implements the standard distributed
approximation instead (the reference engine — a catalog query engine —
has no dedup at all; extension per SURVEY §2.9):

1. slide a fixed ``n``-token window over each document and fingerprint
   every window with the engine-portable 60-bit hash
   (``functions.text.rolling_hashes`` — the same shingle machinery the
   MinHash family uses, so window ``i`` is exactly the word n-gram
   starting at token ``i``);
2. count each window hash's distinct-document frequency corpus-wide;
3. a MAXIMAL RUN of >= ``min_run`` consecutive duplicated windows in a
   document marks a verbatim span (a span of L shared tokens yields
   L - n + 1 consecutive duplicated windows, so ``min_run = K`` detects
   shared spans of K + n - 1 tokens — Lee et al.'s 50-token threshold is
   ``min_run = 51 - n``);
4. the covered tokens are cut and the document reassembled
   (:func:`span_dedup`), or reported per run (:func:`duplicated_spans`).

Tokens are the CCNet-normalized words (lowercase, collapsed whitespace)
— the same token space every other dedup operator fingerprints in, so
"verbatim" here means verbatim-after-normalization, and the reassembled
text is normalized text. Both outputs are exactly replayable in SQL
(unnest + window-function gaps-and-islands), which is what makes the
operator hash-checkable against a DuckDB oracle.

100 TB shape
------------
Per-document work is linear (one regex shingle pass, one md5 per
window). Exchanges, in order, all on short keys:

* window-hash document frequency: one groupBy on the 8-byte hash —
  countDistinct collapses per-partition before the shuffle;
* a LEFT SEMI join of window rows against the >= ``min_doc_freq``
  hashes (the duplicated-window vocabulary — usually small; a shuffle
  join keyed by the same 8-byte hash, AQE downgrades to broadcast when
  stats allow and splits skewed universal hashes);
* the gaps-and-islands window, PARTITIONED BY DOCUMENT (ordered by
  window position) — per-task state is one document's duplicated
  windows, bounded by document length, never corpus-scale; the
  subsequent (doc, island) and per-doc aggregations reuse the same
  hash partitioning (subset of the clustering keys), so they add no
  exchange;
* the final id-keyed join of span intervals back onto the token
  arrays; token cutting is one in-row ``filter``/``exists`` pass —
  O(tokens x runs) per document, runs per doc being small by
  construction (each needs >= min_run duplicated windows).

No global window, no driver collect, no all-pairs joins. Unlike
suffix-array dedup, cross-document span BOUNDARIES are approximate to
the window grain (a run can start at most n - 1 tokens after the true
shared-span start); frequency, however, is exact per window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from intake_esm_spark.functions.text import rolling_hashes, words_array


def _window_runs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    min_doc_freq: int,
    min_run: int,
) -> DataFrame:
    """Maximal runs of consecutive duplicated windows per document:
    ``(id_col, __s, __e_tok, n_windows)`` with ``__s`` the run's first
    token index and ``__e_tok`` its last covered token index (both
    0-based, in the normalized word array)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_doc_freq < 2:
        raise ValueError(
            f"min_doc_freq must be >= 2 (1 would mark every window), got {min_doc_freq}"
        )
    if min_run < 1:
        raise ValueError(f"min_run must be >= 1, got {min_run}")

    wins = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(rolling_hashes(F.col(text_col), n)).alias("__wpos", "__h"),
    )
    dup_vocab = (
        wins.groupBy("__h")
        .agg(F.countDistinct(id_col).alias("__df"))
        .filter(F.col("__df") >= min_doc_freq)
        .select("__h")
    )
    dup = wins.join(dup_vocab, "__h", "left_semi")

    # gaps-and-islands: consecutive window positions share (wpos - rank)
    w = Window.partitionBy(id_col).orderBy("__wpos")
    isl = dup.withColumn("__g", F.col("__wpos") - F.row_number().over(w))
    return (
        isl.groupBy(id_col, "__g")
        .agg(
            F.min("__wpos").alias("__s"),
            (F.max("__wpos") + F.lit(n - 1)).alias("__e_tok"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .filter(F.col("n_windows") >= min_run)
        .drop("__g")
    )


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_doc_freq: int = 2,
    min_run: int = 2,
) -> DataFrame:
    """Cut every >= ``min_run``-window duplicated run from every document
    and reassemble (see module docstring for semantics).

    Returns one row per non-null-text input document:
    ``(id_col, text_col, n_tokens, n_removed)`` — ``text_col`` is the
    normalized text with covered tokens removed (empty string when the
    whole document was one big duplicated span — the row survives with a
    diagnostic ``n_removed = n_tokens``, same convention as
    ``structural.line_dedup``), ``n_tokens`` the pre-cut normalized
    token count.

    Note both copies of a duplicated span are cut (the CCNet
    ``keep="none"`` rule): window frequency is corpus-global, so there
    is no cheap "first holder" at span grain — run document-level dedup
    first if one canonical copy must survive.
    """
    runs = _window_runs(df, id_col, text_col, n, min_doc_freq, min_run)
    spans = runs.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("__s").alias("s"), F.col("__e_tok").alias("e"))
        ).alias("__spans")
    )
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), words_array(F.col(text_col)).alias("__toks")
    )
    joined = toks.join(spans, id_col, "left")
    # index the token array once, then one in-row pass: token i survives
    # iff no span interval covers it (O(tokens x runs), runs small)
    idx = F.transform(
        F.col("__toks"), lambda t, i: F.struct(i.alias("i"), t.alias("t"))
    )
    covered = lambda st: F.exists(  # noqa: E731
        F.col("__spans"), lambda sp: (sp["s"] <= st["i"]) & (st["i"] <= sp["e"])
    )
    kept = F.when(F.col("__spans").isNull(), F.col("__toks")).otherwise(
        F.transform(F.filter(idx, lambda st: ~covered(st)), lambda st: st["t"])
    )
    return joined.select(
        F.col(id_col),
        F.array_join(kept, " ").alias(text_col),
        F.size("__toks").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).alias("n_removed"),
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_doc_freq: int = 2,
    min_run: int = 2,
) -> DataFrame:
    """The span REPORT: one row per maximal duplicated run —
    ``(id_col, start_token, end_token, n_windows, span)`` with 0-based
    inclusive token indices into the normalized word array and ``span``
    the covered text — what a curation run reads to choose ``min_run``
    (what IS getting cut, and how long it is). Aggregate it by ``span``
    (or ``md5(span)`` at scale) for the corpus-wide top duplicated
    spans."""
    runs = _window_runs(df, id_col, text_col, n, min_doc_freq, min_run)
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), words_array(F.col(text_col)).alias("__toks")
    )
    joined = runs.join(toks, id_col)
    end_tok = F.least(F.col("__e_tok"), F.size("__toks") - 1)
    return joined.select(
        F.col(id_col),
        F.col("__s").alias("start_token"),
        end_tok.alias("end_token"),
        F.col("n_windows"),
        F.array_join(
            F.slice(
                F.col("__toks"), F.col("__s") + 1, end_tok - F.col("__s") + 1
            ),
            " ",
        ).alias("span"),
    )
