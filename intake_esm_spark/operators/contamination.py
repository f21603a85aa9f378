"""Benchmark contamination detection: word n-gram overlap between a
training corpus and an evaluation/benchmark set.

Before training on a 100 TB corpus you must know which documents leak
the benchmark ("train-on-test"). The standard check (GPT-3 appendix C,
PaLM §7, Llama-2 A.6 all use variants of it) is *exact n-gram overlap*:
a training document is contaminated if it shares at least one (or
``min_overlap``) word n-grams with any benchmark document.

No reference analogue (intake-esm is a catalog engine) — extension per
SURVEY §2.9's training-pipeline charter.

Scale design:
* shingling is the in-row single-pass regex extraction from
  ``functions.text.shingles`` — zero shuffle, no Python;
* n-grams are joined on their **60-bit portable hash** (8-byte key)
  instead of the string — smaller shuffle/broadcast, and the md5-derived
  hash is recomputable in any engine, so the whole operator is
  SQL-oracle-checkable (collisions, if any, reproduce identically);
* the benchmark side is tiny by nature (eval sets are MBs, the corpus is
  TBs) → its distinct-gram set is **broadcast**, so the corpus side
  never shuffles: scan → in-row shingle → explode → broadcast hash join
  → one map-side-combined aggregation keyed by doc id. With
  ``broadcast_benchmark=False`` the join falls back to a plain shuffle
  join for pathologically large benchmark sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from intake_esm_spark.functions.text import portable_hash60, shingles


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """Distinct word-n-gram hash set of the benchmark corpus — one
    column ``__ng_h`` (bigint). Materialize/cache this once and reuse it
    across contamination sweeps."""
    return (
        benchmark.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("__ng")
        )
        .select(portable_hash60(F.col("__ng")).alias("__ng_h"))
        .distinct()
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_overlap: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-corpus-document contamination report:

    ``(id_col, n_ngrams, n_overlap, overlap_frac, contaminated)``

    where ``n_ngrams`` counts the document's DISTINCT word n-grams,
    ``n_overlap`` how many of those appear anywhere in the benchmark,
    ``overlap_frac = n_overlap / n_ngrams`` and ``contaminated`` flags
    ``n_overlap >= min_overlap``. Every document of ``corpus`` with
    non-null text appears exactly once (clean docs report 0 / 0.0 /
    false); null-text documents have no n-grams and are OMITTED — they
    are trivially uncontaminated, and the SQL oracle's unnest drops them
    identically."""
    bench = benchmark_ngrams(benchmark, text_col=text_col, n=n).withColumn(
        "__hit", F.lit(1)
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    grams = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("__ng"),
    ).select(F.col(id_col), portable_hash60(F.col("__ng")).alias("__ng_h"))
    joined = grams.join(bench, "__ng_h", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("bigint").alias("n_overlap"),
        )
        .withColumn(
            "overlap_frac", F.col("n_overlap") / F.col("n_ngrams").cast("double")
        )
        .withColumn("contaminated", F.col("n_overlap") >= min_overlap)
    )


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_overlap: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Just the ids to drop — the decontamination filter's build side.
    Feed to an anti-join: ``corpus.join(ids, id_col, 'left_anti')``."""
    rep = contamination_report(
        corpus,
        benchmark,
        text_col=text_col,
        id_col=id_col,
        n=n,
        min_overlap=min_overlap,
        broadcast_benchmark=broadcast_benchmark,
    )
    return rep.filter(F.col("contaminated")).select(id_col)
