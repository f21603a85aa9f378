"""Multinomial NB (operators/classify.py): recovery on a separable
corpus, first-principles score parity on a tiny fixture, tie and guard
behavior."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F  # noqa: F401


@pytest.fixture(scope="module")
def separable_docs(spark):
    rng = np.random.RandomState(160)
    vocab = {
        "aa": ["red", "green", "blue", "colour", "paint"],
        "bb": ["stock", "bond", "yield", "market", "trade"],
        "cc": ["gene", "cell", "protein", "enzyme", "dna"],
    }
    rows = []
    i = 0
    for cls, words in vocab.items():
        for _ in range(40):
            n = rng.randint(5, 15)
            # 85% in-class tokens, 15% shared noise
            toks = [
                words[rng.randint(len(words))]
                if rng.uniform() < 0.85
                else ["the", "and", "of"][rng.randint(3)]
                for _ in range(n)
            ]
            rows.append((i, " ".join(toks), cls))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def test_nb_recovers_separable_classes(spark, separable_docs):
    from intake_esm_spark.operators.classify import nb_confusion_report

    out = nb_confusion_report(separable_docs).collect()
    cm = {(r["actual"], r["predicted"]): r["n_docs"] for r in out}
    diag = sum(cm.get((c, c), 0) for c in ("aa", "bb", "cc"))
    assert diag >= 0.95 * 120
    assert sum(cm.values()) == 120


def test_nb_matches_first_principles_scores(spark):
    """Tiny fixture: replay the hashed-multinomial score by hand and
    check the argmax (including the absent-feature floor)."""
    from intake_esm_spark.functions.text import portable_hash60
    from intake_esm_spark.operators.classify import (
        nb_class_tables,
        nb_confusion_report,
    )

    rows = [
        (0, "x x y", "p"),
        (1, "x y y", "p"),
        (2, "z z w", "q"),
        (3, "z w w", "q"),
        (4, "x x z", "p"),  # mostly p-ish
        (5, "w z z", "q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    n_hash, alpha = 64, 1.0
    # hash each token the engine way
    hdf = spark.createDataFrame(
        [(t,) for t in ("x", "y", "z", "w")], "t string"
    ).select("t", (portable_hash60(F.col("t")) % n_hash).alias("h"))
    hmap = {r["t"]: int(r["h"]) for r in hdf.collect()}
    counts: dict = {}
    docs_c: dict = {}
    for _i, text, cls in rows:
        docs_c[cls] = docs_c.get(cls, 0) + 1
        for t in text.split():
            k = (cls, hmap[t])
            counts[k] = counts.get(k, 0) + 1
    delta, cbase = nb_class_tables(counts, docs_c, n_hash, alpha)

    def score(text, cls):
        toks = text.split()
        s = float(cbase[cls][0]) + len(toks) * float(cbase[cls][1])
        for t in toks:
            s += float(delta.get((cls, hmap[t]), 0))
        return s

    expect = {}
    for i, text, cls in rows:
        best = max(
            sorted(docs_c), key=lambda c: (round(score(text, c), 6), c)
        )
        expect[(cls, best)] = expect.get((cls, best), 0) + 1
    out = nb_confusion_report(df, n_hash=n_hash).collect()
    got = {(r["actual"], r["predicted"]): r["n_docs"] for r in out}
    assert got == expect


def test_nb_empty_text_scored_by_prior(spark):
    """A token-free doc falls back to the prior argmax (majority
    class), not an error or a dropped row."""
    from intake_esm_spark.operators.classify import nb_confusion_report

    rows = [(0, "alpha alpha", "m"), (1, "alpha beta", "m"),
            (2, "alpha alpha beta", "m"),
            (3, "gamma gamma", "n"), (4, "   ", "n")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_confusion_report(df).collect()
    assert sum(r["n_docs"] for r in out) == 5
    # the empty doc (actual n) lands on the prior argmax 'm'
    cm = {(r["actual"], r["predicted"]): r["n_docs"] for r in out}
    assert cm.get(("n", "m"), 0) >= 1


def test_nb_guards(spark, separable_docs):
    from intake_esm_spark.operators.classify import nb_confusion_report

    with pytest.raises(ValueError, match="n_hash"):
        nb_confusion_report(separable_docs, n_hash=1)
    with pytest.raises(ValueError, match="alpha"):
        nb_confusion_report(separable_docs, alpha=0.0)
    many = separable_docs.withColumn(
        "lang", F.concat(F.lit("c"), F.col("doc_id"))
    )
    with pytest.raises(ValueError, match="MAX_CLASSES"):
        nb_confusion_report(many)
