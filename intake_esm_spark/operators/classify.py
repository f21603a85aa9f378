"""Multinomial Naive Bayes over hashed tokens — the classic generative
text classifier (language-ID / source attribution), trained and scored
entirely in-engine.

The 100 TB shape: training is ONE partial-aggregated pass to the
bounded ``|classes| × n_hash`` count grid (the corpus never shuffles
raw text); the log-probability tables are built on the DRIVER from
exact integer counts (python ``math.log`` — no engine-libm drift) and
broadcast back as 9dp DECIMAL literals; scoring is a broadcast hash
join + two doc-keyed aggregations with exact decimal accumulation, so
the per-doc score is bit-identical regardless of partitioning.  The
absent-feature mass uses the identity ``Σ_t tf·logθ_miss +
Σ_{present} tf·(logθ − logθ_miss)`` so missing (class, hash) cells
never materialize — the join stays candidate-sized.

No reference counterpart (`/root/reference/intake_esm/` has no ML
surface); extension family, sklearn ``MultinomialNB(alpha)``-adjacent
semantics over hashed features.
"""

from __future__ import annotations

import math
from decimal import Decimal

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_hash60

MAX_CLASSES = 64


def nb_class_tables(
    counts: dict[tuple[str, int], int],
    docs_c: dict[str, int],
    n_hash: int,
    alpha: float,
) -> tuple[dict[tuple[str, int], Decimal], dict[str, tuple[Decimal, Decimal]]]:
    """Driver-side log tables from exact integer counts — ONE shared
    implementation for the Spark operator and the DuckDB oracle
    builder (both call this with counts replayed from their own
    engine, so the 9dp-quantized logs can never drift).

    Returns ``(delta, base)`` where ``delta[(cls, h)] =
    round9(ln((cnt + α)/α))`` (the present-token bonus over the
    missing-token floor) and ``base[cls] = (prior9, miss9)`` with
    ``prior9 = round9(ln(docs_c/Σdocs))`` and ``miss9 =
    round9(ln(α/(tot_c + α·n_hash)))``."""
    total_docs = sum(docs_c.values())
    tot = {c: 0 for c in docs_c}
    for (c, _h), n in counts.items():
        tot[c] = tot.get(c, 0) + n
    q9 = lambda v: Decimal(str(round(v, 9)))  # noqa: E731
    delta = {
        (c, h): q9(math.log((n + alpha) / alpha))
        for (c, h), n in counts.items()
    }
    base = {
        c: (
            q9(math.log(docs_c[c] / total_docs)),
            q9(math.log(alpha / (tot.get(c, 0) + alpha * n_hash))),
        )
        for c in docs_c
    }
    return delta, base


def _tokens(text_col: str):
    """The repo-wide token convention: whitespace split of the
    lowercased trimmed text, empty strings dropped."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )


def nb_confusion_report(
    docs: DataFrame,
    text_col: str = "text",
    class_col: str = "lang",
    id_col: str = "doc_id",
    n_hash: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """Train multinomial NB on the corpus and report the self-test
    confusion matrix ``(actual, predicted, n_docs)`` — the one-pass
    "is this corpus separable by this feature family" diagnostic (and
    the training-error readout of the classic fasttext-style
    language-ID baseline).

    Prediction ties break to the LEXICOGRAPHICALLY LARGEST class at
    the 6dp-rounded score (max-join, engine-deterministic).  Classes
    are capped at ``MAX_CLASSES`` via a bounded ``limit`` probe —
    nothing unbounded reaches the driver."""
    if n_hash < 2:
        raise ValueError(f"n_hash must be >= 2, got {n_hash}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    spark = docs.sparkSession
    from intake_esm_spark.operators._util import _spread

    # r14: spread before the pin — the tokenize/explode/hash pass
    # otherwise runs single-task on a single-file source (the
    # moment-kernel spread discipline; counts are exact integers, so
    # the grids are unchanged)
    base = _spread(
        docs.filter(
            F.col(text_col).isNotNull() & F.col(class_col).isNotNull()
        ).select(
            F.col(id_col).alias("__id"),
            F.col(class_col).cast("string").alias("__actual"),
            F.col(text_col).alias("__text"),
        )
    ).localCheckpoint(eager=False)  # pinned: train + score passes
    probe = (
        base.select("__actual").distinct().limit(MAX_CLASSES + 1).collect()
    )
    if len(probe) > MAX_CLASSES:
        raise ValueError(
            f"nb: more than MAX_CLASSES={MAX_CLASSES} distinct classes"
            " — pre-bucket the label first"
        )
    tok = base.select(
        "__id",
        "__actual",
        F.explode(_tokens("__text")).alias("__t"),
    ).select(
        "__id",
        "__actual",
        (portable_hash60(F.col("__t")) % n_hash).alias("__h"),
    )
    tf = (
        tok.groupBy("__id", "__actual", "__h")
        .agg(F.count(F.lit(1)).alias("__tf"))
        .localCheckpoint(eager=False)  # pinned: counts + both score uses
    )
    counts = {
        (r["__actual"], int(r["__h"])): int(r["__n"])
        for r in tf.groupBy("__actual", "__h")
        .agg(F.sum("__tf").alias("__n"))
        .collect()
    }
    docs_c = {
        r["__actual"]: int(r["__n"])
        for r in base.groupBy("__actual")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }
    delta, cbase = nb_class_tables(counts, docs_c, n_hash, alpha)
    theta_df = spark.createDataFrame(
        [(c, h, d) for (c, h), d in sorted(delta.items())],
        "__cls string, __h int, __d decimal(18,9)",
    )
    base_df = spark.createDataFrame(
        [(c, p, m) for c, (p, m) in sorted(cbase.items())],
        "__cls string, __prior decimal(18,9), __miss decimal(18,9)",
    )
    present = (
        tf.join(F.broadcast(theta_df), "__h")
        .groupBy("__id", "__cls")
        .agg(
            F.sum(
                F.col("__tf").cast("decimal(18,0)") * F.col("__d")
            ).alias("__p")
        )
    )
    doc_t = tf.groupBy("__id", "__actual").agg(
        F.sum("__tf").alias("__T")
    )
    scored = (
        base.select("__id", "__actual")
        .join(doc_t.drop("__actual"), "__id", "left")
        .withColumn("__T", F.coalesce(F.col("__T"), F.lit(0)))
        .crossJoin(F.broadcast(base_df))
        .join(present, ["__id", "__cls"], "left")
        .select(
            "__id",
            "__actual",
            "__cls",
            F.round(
                (
                    F.col("__prior")
                    + F.col("__T").cast("decimal(18,0)")
                    * F.col("__miss")
                    + F.coalesce(
                        F.col("__p"),
                        F.lit(0).cast("decimal(38,9)"),
                    )
                ).cast("double"),
                6,
            ).alias("__s"),
        )
        .localCheckpoint(eager=False)  # pinned: max + tie-break join
    )
    best = scored.groupBy("__id").agg(F.max("__s").alias("__ms"))
    pred = (
        scored.join(best, "__id")
        .filter(F.col("__s") == F.col("__ms"))
        .groupBy("__id", "__actual")
        .agg(F.max("__cls").alias("predicted"))
    )
    return (
        pred.groupBy(
            F.col("__actual").alias("actual"), "predicted"
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
