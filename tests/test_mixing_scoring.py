"""Source-mixture rebalancing (operators/mixing.py) and the hashed
bag-of-words linear scorer (functions/text.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.functions import text as tx
from intake_esm_spark.operators import mixing


@pytest.fixture()
def corpus(spark):
    rows = [(i, f"s{i % 4}", "word " * (i % 7 + 1)) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


def test_mixture_rates_math(spark, corpus):
    # 100 docs per source; weights 2:1:1 over s0,s1,s2 -> T = min(100/.5,
    # 100/.25, 100/.25) = 200; rates = .5*200/100, .25*200/100 = 1.0, 0.5
    rates = {
        r["source"]: r
        for r in mixing.source_mixture_rates(
            corpus, {"s0": 2.0, "s1": 1.0, "s2": 1.0}
        ).collect()
    }
    assert set(rates) == {"s0", "s1", "s2"}
    assert rates["s0"]["rate"] == pytest.approx(1.0)
    assert rates["s1"]["rate"] == pytest.approx(0.5)
    assert rates["s2"]["rate"] == pytest.approx(0.5)
    assert rates["s0"]["mass"] == 100.0


def test_apply_mixture_deterministic_and_drops_unlisted(spark, corpus):
    out = mixing.apply_mixture(corpus, {"s0": 2.0, "s1": 1.0, "s2": 1.0})
    got = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in got}
    assert "s3" not in by_src  # absent from weights -> dropped
    assert by_src["s0"] == 100  # binding source keeps everything
    # downsampled sources keep ~half (hash sampling, 100 docs -> loose bound)
    assert 35 <= by_src["s1"] <= 65 and 35 <= by_src["s2"] <= 65
    again = mixing.apply_mixture(corpus, {"s0": 2.0, "s1": 1.0, "s2": 1.0})
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_apply_mixture_token_weighted(spark, corpus):
    out = mixing.apply_mixture(
        corpus,
        {"s0": 1.0, "s1": 1.0},
        size_col=tx.ws_token_count(F.col("text")),
    )
    assert out.count() > 0
    assert set(r["source"] for r in out.select("source").distinct().collect()) <= {
        "s0",
        "s1",
    }


def test_mixture_validation(spark, corpus):
    with pytest.raises(ValueError, match="non-empty"):
        mixing.source_mixture_rates(corpus, {})
    with pytest.raises(ValueError, match="positive"):
        mixing.source_mixture_rates(corpus, {"s0": 0.0})


def test_apply_mixture_plan_broadcasts_rates(spark, corpus):
    plan = (
        mixing.apply_mixture(corpus, {"s0": 1.0, "s1": 1.0})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan  # the corpus side never shuffles


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hashed_bow_logit_matches_reference():
    # driver-side replication of the exact engine formula
    wts = tx.hashed_bow_weights(16, salt="tw")
    assert len(wts) == 16 and all(-1.0 <= w <= 1.0 for w in wts)
    # regeneration is deterministic
    assert wts == tx.hashed_bow_weights(16, salt="tw")


def test_hashed_bow_logit_engine_vs_python(spark):
    wts = tx.hashed_bow_weights(16, salt="tw")
    rows = [(1, "alpha beta gamma"), (2, "alpha alpha"), (3, "  Mixed   Case  ")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    words = df.select("doc_id", tx.words_array(F.col("text")).alias("w"))
    out = {
        r["doc_id"]: r["logit"]
        for r in words.select(
            "doc_id", tx.hashed_bow_logit(F.col("w"), wts, salt="qf").alias("logit")
        ).collect()
    }

    def expected(text):
        ws = " ".join(text.lower().split()).split(" ")
        return sum(wts[_h60(f"qf|{w}") % 16] for w in ws) / len(ws)

    for did, text in rows:
        assert out[did] == pytest.approx(expected(text), abs=1e-12)


def test_hashed_bow_logit_validates():
    with pytest.raises(ValueError, match="non-empty"):
        tx.hashed_bow_logit(F.col("w"), [])


def test_apply_mixture_streaming_with_precomputed_rates(spark, corpus, tmp_path):
    """Mixture rates are corpus-global state (like the LSH index and the
    boilerplate report): computed in batch, a STREAM applies them as a
    stateless broadcast-join filter — same rows as the batch pass."""
    rates = mixing.source_mixture_rates(
        corpus, {"s0": 2.0, "s1": 1.0}
    ).localCheckpoint()
    expected = sorted(
        r["doc_id"]
        for r in mixing.apply_mixture(
            corpus, {"s0": 2.0, "s1": 1.0}, precomputed_rates=rates
        ).collect()
    )
    src = tmp_path / "mix_src"
    corpus.write.parquet(str(src))
    stream = spark.readStream.schema(corpus.schema).format("parquet").load(str(src))
    out = mixing.apply_mixture(
        stream, {"s0": 2.0, "s1": 1.0}, precomputed_rates=rates
    )
    q = (
        out.writeStream.format("memory")
        .queryName("mix_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            r["doc_id"] for r in spark.sql("SELECT * FROM mix_sink").collect()
        )
    finally:
        q.stop()
    assert got == expected


# -- temperature-scaled mixture ----------------------------------------------


def test_temperature_alpha_one_is_identity(spark):
    from intake_esm_spark.operators import mixing

    df = spark.createDataFrame(
        [(i, "a" if i < 30 else "b") for i in range(40)],
        "doc_id bigint, source string",
    )
    rates = {
        r["source"]: r["rate"]
        for r in mixing.temperature_mixture_rates(df, alpha=1.0).collect()
    }
    # alpha=1: target shares == natural proportions, every source binds
    assert rates == {"a": 1.0, "b": 1.0}


def test_temperature_flattens_toward_uniform(spark):
    from intake_esm_spark.operators import mixing

    # masses 90 / 10: alpha=0.5 targets sqrt(90):sqrt(10) = 3:1, so the
    # majority source is downsampled while the minority keeps everything
    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id bigint, source string",
    )
    got = {
        r["source"]: r
        for r in mixing.temperature_mixture_rates(df, alpha=0.5).collect()
    }
    assert got["small"]["rate"] == 1.0  # binding source
    # T = min(mass/w) = 10 / 0.25 = 40; big keeps 0.75*40/90 = 1/3
    assert abs(got["big"]["rate"] - (1.0 / 3.0)) < 1e-9
    # and the rates frame feeds apply_mixture unchanged
    out = mixing.apply_mixture(
        df, {}, salt="t", precomputed_rates=mixing.temperature_mixture_rates(df, alpha=0.5)
    )
    kept = out.groupBy("source").count().collect()
    kept = {r["source"]: r["count"] for r in kept}
    assert kept["small"] == 10
    assert kept["big"] < 90  # majority actually downsampled


def test_temperature_alpha_validation(spark):
    from intake_esm_spark.operators import mixing

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, source string")
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="alpha"):
            mixing.temperature_mixture_rates(df, alpha=bad)
