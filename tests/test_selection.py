"""DSIR hashed-ngram importance resampling (operators/selection.py)."""

import math

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.operators.selection import (
    _feature_stream,
    dsir_bucket_weights,
    dsir_scores,
    dsir_select,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_feature_stream_unigrams_and_bigrams(spark):
    df = _docs(spark, [(1, "Red  Fox"), (2, "solo"), (3, None), (4, "")])
    out = (
        _feature_stream(df, "text", ["doc_id"])
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("__feat")).alias("fs"))
        .collect()
    )
    by_id = {r["doc_id"]: r["fs"] for r in out}
    # normalization lowercases + collapses whitespace; bigram joins with
    # a single space
    assert by_id[1] == ["fox", "red", "red fox"]
    assert by_id[2] == ["solo"]
    # null and empty text yield no features at all
    assert 3 not in by_id and 4 not in by_id


def test_bucket_weights_hand_example(spark):
    """One doc per side with disjoint single words: two buckets, each
    seen once on one side; weights follow the add-1 smoothed formula
    with B buckets and totals 1/1."""
    target = _docs(spark, [(1, "aa")])
    raw = _docs(spark, [(2, "bb")])
    B = 64
    rows = {
        r["bucket"]: r
        for r in dsir_bucket_weights(target, raw, n_buckets=B).collect()
    }
    assert len(rows) == 2
    for r in rows.values():
        assert (r["n_target"], r["n_raw"]) in {(1, 0), (0, 1)}
        ct, cr = r["n_target"], r["n_raw"]
        expected = round(
            math.log((ct + 1.0) / (1.0 + B)) - math.log((cr + 1.0) / (1.0 + B)),
            9,
        )
        assert float(r["w"]) == pytest.approx(expected, abs=1e-9)
    # target-side bucket weight is positive, raw-side negative
    ws = sorted(float(r["w"]) for r in rows.values())
    assert ws[0] < 0 < ws[1]


def test_scores_sum_bucket_weights_per_occurrence(spark):
    """Pool doc repeating a target word twice scores 2x that bucket's
    weight (+ the bigram bucket); a doc with only raw-side words scores
    negative."""
    target = _docs(spark, [(1, "good good wiki")])
    raw = _docs(spark, [(10, "good good"), (11, "spam")])
    B = 128
    w = dsir_bucket_weights(target, raw, n_buckets=B)
    wmap = {r["bucket"]: float(r["w"]) for r in w.collect()}
    sc = {
        r["doc_id"]: r
        for r in dsir_scores(raw, w, n_buckets=B).collect()
    }
    # doc 10 features: good, good, "good good" -> 3 occurrences
    assert sc[10]["n_feats"] == 3
    from intake_esm_spark.functions.text import portable_hash60

    bucket_of = {
        r["f"]: r["b"]
        for r in spark.createDataFrame(
            [("good",), ("good good",), ("spam",)], "f string"
        )
        .select("f", F.pmod(portable_hash60(F.col("f")), F.lit(B)).alias("b"))
        .collect()
    }
    exp10 = 2 * wmap[bucket_of["good"]] + wmap[bucket_of["good good"]]
    assert sc[10]["score"] == pytest.approx(exp10, abs=1e-6)
    assert sc[11]["score"] < 0  # raw-only word
    assert sc[10]["score"] > sc[11]["score"]


def test_select_ranks_target_like_docs_first(spark):
    target = _docs(spark, [(1, "alpha beta gamma"), (2, "alpha beta")])
    raw = _docs(
        spark,
        [
            (10, "alpha beta gamma"),  # exactly target-like
            (11, "alpha junk"),
            (12, "junk junk junk"),
        ],
    )
    out = dsir_select(target, raw, k=2, n_buckets=256).collect()
    assert [r["doc_id"] for r in out] == [10, 11]
    assert [r["rank"] for r in out] == [1, 2]
    assert out[0]["score"] > out[1]["score"]


def test_validation(spark):
    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        dsir_bucket_weights(df, df, n_buckets=1)
    with pytest.raises(ValueError):
        dsir_bucket_weights(df, df, alpha=0.0)
    with pytest.raises(ValueError):
        dsir_select(df, df, k=0)


# --- hashed-bigram LM cross-entropy ----------------------------------------


def test_lm_xent_hand_example(spark):
    from intake_esm_spark.operators.selection import (
        lm_cross_entropy,
        lm_train_counts,
    )

    train = _docs(spark, [(1, "a b")])
    pool = _docs(spark, [(10, "a b"), (11, "z q"), (12, "solo"), (13, None)])
    B = 64
    ctx, bgc = lm_train_counts(train, n_buckets=B)
    out = {
        r["doc_id"]: r
        for r in lm_cross_entropy(pool, ctx, bgc, n_buckets=B).collect()
    }
    # short/null docs have no bigram and are omitted
    assert set(out) == {10, 11}
    assert out[10]["n_bigrams"] == 1 and out[11]["n_bigrams"] == 1
    # seen bigram: ln(1+B) - ln(1+1); unseen (distinct buckets): ln(B)-ln(1)
    assert out[10]["xent"] == pytest.approx(
        math.log(1 + B) - math.log(2), abs=1e-6
    )
    assert out[11]["xent"] == pytest.approx(math.log(B), abs=1e-6)
    # the in-distribution doc reads as LESS surprising
    assert out[10]["xent"] < out[11]["xent"]


def test_lm_xent_orders_quality(spark):
    """Docs repeating the training corpus's phrasing score lower than
    shuffled-vocabulary docs over a multi-doc train set."""
    from intake_esm_spark.operators.selection import (
        lm_cross_entropy,
        lm_train_counts,
    )

    train = _docs(
        spark,
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
    )
    pool = _docs(
        spark,
        [
            (100, "the quick brown fox"),
            (101, "dog brown the over fox"),  # same words, wrong order
            (102, "xylo qwert zzyzx plugh"),  # out-of-vocabulary
        ],
    )
    ctx, bgc = lm_train_counts(train, n_buckets=2048)
    out = {
        r["doc_id"]: r["xent"]
        for r in lm_cross_entropy(pool, ctx, bgc, n_buckets=2048).collect()
    }
    # in-distribution phrasing scores lowest; both broken docs score
    # ~ln(B) or above. (Note the add-α conditional estimator makes a
    # KNOWN context with an unseen continuation slightly MORE surprising
    # than full OOV — P = 1/(n_ctx+B) < 1/B — so 101 vs 102 ordering is
    # estimator-defined, not asserted.)
    assert out[100] < out[101] and out[100] < out[102]
    assert out[100] < math.log(2048)


def test_lm_validation(spark):
    from intake_esm_spark.operators.selection import (
        lm_cross_entropy,
        lm_train_counts,
    )

    df = _docs(spark, [(1, "a b")])
    ctx, bgc = lm_train_counts(df, n_buckets=64)
    with pytest.raises(ValueError):
        lm_cross_entropy(df, ctx, bgc, n_buckets=64, alpha=0.0)
