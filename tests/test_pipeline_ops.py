"""Tests for the round-5 training-pipeline operators: deterministic
global shuffle / sequence packing, benchmark contamination, and
zero-shuffle repetition stats."""

import hashlib

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.operators import contamination, corpus, packing


def _md5_60(salt, key):
    return int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- packing


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (i, f"doc {i} " + " ".join(f"w{(i * 7 + j) % 13}" for j in range(i % 9 + 1)))
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_global_order_matches_python_sort(spark, docs_df):
    out = packing.global_order_index(docs_df, "doc_id", salt="s1", n_buckets=16)
    got = {r["doc_id"]: r["position"] for r in out.collect()}
    expected_order = sorted(range(200), key=lambda i: (_md5_60("s1", i), i))
    for pos, doc in enumerate(expected_order):
        assert got[doc] == pos


def test_global_order_partition_independent(spark, docs_df):
    a = packing.global_order_index(docs_df, "doc_id", salt="x", n_buckets=4)
    b = packing.global_order_index(
        docs_df.repartition(13), "doc_id", salt="x", n_buckets=64
    )
    assert sorted(map(tuple, a.select("doc_id", "position").collect())) == sorted(
        map(tuple, b.select("doc_id", "position").collect())
    )


def test_pack_token_bins_contiguous(spark, docs_df):
    with_tok = docs_df.withColumn("tok", F.size(F.split(F.col("text"), " ")))
    out = packing.pack_token_bins(
        with_tok, "tok", budget=50, key_col="doc_id", salt="p", n_buckets=8
    )
    rows = out.select("doc_id", "tok", "token_offset", "bin_id").collect()
    by_pos = sorted(rows, key=lambda r: r["token_offset"])
    # offsets are an exclusive prefix sum of token counts in shuffle order
    acc = 0
    for r in by_pos:
        assert r["token_offset"] == acc
        assert r["bin_id"] == acc // 50
        acc += r["tok"]
    # deterministic order: matches the driver-side md5 sort
    expected_order = sorted(
        (r["doc_id"] for r in rows), key=lambda i: (_md5_60("p", i), i)
    )
    assert [r["doc_id"] for r in by_pos] == list(expected_order)


def test_pack_rejects_bad_budget(docs_df):
    with pytest.raises(ValueError):
        packing.pack_token_bins(docs_df, F.lit(1), 0, "doc_id")


# ---------------------------------------------------------- contamination


def test_contamination_report_counts(spark):
    corp = spark.createDataFrame(
        [
            (1, "a b c d e f"),  # shares 5-grams with bench doc 10
            (2, "x y z p q r"),  # clean
            (3, "a b c d e"),  # exactly 5 words -> single shingle, shared
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, "a b c d e f g")], "doc_id long, text string"
    )
    rep = contamination.contamination_report(corp, bench, n=5).collect()
    by_id = {r["doc_id"]: r for r in rep}
    assert set(by_id) == {1, 2, 3}
    # doc 1: shingles {a b c d e, b c d e f} both present in bench
    assert by_id[1]["n_ngrams"] == 2 and by_id[1]["n_overlap"] == 2
    assert by_id[1]["contaminated"] and by_id[1]["overlap_frac"] == 1.0
    assert by_id[2]["n_overlap"] == 0 and not by_id[2]["contaminated"]
    assert by_id[3]["n_ngrams"] == 1 and by_id[3]["n_overlap"] == 1


def test_contaminated_ids_and_shuffle_join_parity(spark):
    corp = spark.createDataFrame(
        [(i, f"w{i} common phrase tail {i}") for i in range(20)]
        + [(100, "the quick brown fox jumps over")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    ids_b = {
        r["doc_id"]
        for r in contamination.contaminated_ids(corp, bench, n=5).collect()
    }
    ids_s = {
        r["doc_id"]
        for r in contamination.contaminated_ids(
            corp, bench, n=5, broadcast_benchmark=False
        ).collect()
    }
    assert ids_b == ids_s == {100}


# ------------------------------------------------------- repetition stats


def test_repetition_stats_vs_exploded_plan(spark):
    texts = [
        (1, "a b a b a b a b"),
        (2, "x x x x"),
        (3, "one two three four five six"),
        (4, ""),
        (5, "solo"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    fast = {r["doc_id"]: r for r in corpus.repetition_stats(df, n=2).collect()}

    # oracle: exploded groupBy plan over the same shingles
    from intake_esm_spark.functions.text import shingles

    g = df.select("doc_id", F.explode(shingles(F.col("text"), 2)).alias("ng"))
    slow = {
        r["doc_id"]: r
        for r in g.groupBy("doc_id", "ng")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_count"),
        )
        .collect()
    }
    assert set(fast) == set(slow)
    for d in fast:
        for c in ("n_grams", "n_distinct", "top_count"):
            assert fast[d][c] == slow[d][c], (d, c)
    # doc 1: 2-grams = [a b, b a] * alternating -> top_frac near 0.5
    assert fast[1]["n_distinct"] == 2
    assert fast[2]["n_distinct"] == 1 and fast[2]["top_frac"] == 1.0


def test_repetition_stats_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = corpus.repetition_stats(df, n=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_packing_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "doc_id long, tok long")
    assert packing.pack_token_bins(empty, "tok", 100, "doc_id").count() == 0
    assert packing.global_order_index(empty, "doc_id").count() == 0
    one = spark.createDataFrame([(7, 42)], "doc_id long, tok long")
    row = packing.pack_token_bins(one, "tok", 100, "doc_id").collect()[0]
    assert row["token_offset"] == 0 and row["bin_id"] == 0
    assert packing.global_order_index(one, "doc_id").collect()[0]["position"] == 0


def test_contamination_empty_benchmark(spark):
    corp = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    bench = spark.createDataFrame([], "doc_id long, text string")
    rep = contamination.contamination_report(corp, bench).collect()
    assert len(rep) == 1
    assert rep[0]["n_overlap"] == 0 and not rep[0]["contaminated"]
    assert contamination.contaminated_ids(corp, bench).count() == 0


def test_repetition_stats_single_and_repeated(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y y y y y y")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in corpus.repetition_stats(df, n=2).collect()}
    # one word -> single whole-text shingle
    assert got[1]["n_grams"] == 1 and got[1]["top_frac"] == 1.0
    # all-identical 2-grams -> one distinct gram covering everything
    assert got[2]["n_distinct"] == 1 and got[2]["distinct_ratio"] == got[2]["n_distinct"] / got[2]["n_grams"]


def test_packing_property_random_tokens(spark):
    """Hypothesis-style property over random draws (one Spark-backed
    example per draw is too slow, so draws are batched into one frame):
    for random (key, token) sets, salts, and budgets, the two-phase
    prefix sum equals the driver-side md5 sort + cumsum oracle."""
    import random

    rng = random.Random(20260814)
    for trial in range(3):
        n = rng.randint(1, 300)
        budget = rng.choice([1, 7, 64, 1000])
        salt = f"t{trial}"
        keys = rng.sample(range(100_000), n)
        toks = [rng.randint(0, 50) for _ in range(n)]
        df = spark.createDataFrame(
            list(zip(keys, toks)), "doc_id long, tok long"
        ).repartition(rng.randint(1, 8))
        out = {
            r["doc_id"]: (r["token_offset"], r["bin_id"])
            for r in packing.pack_token_bins(
                df, "tok", budget, "doc_id", salt=salt, n_buckets=rng.choice([1, 4, 32])
            ).collect()
        }
        order = sorted(range(n), key=lambda i: (_md5_60(salt, keys[i]), keys[i]))
        acc = 0
        for i in order:
            assert out[keys[i]] == (acc, acc // budget), (trial, keys[i])
            acc += toks[i]


def test_null_text_docs_omitted_consistently(spark):
    """Null-text documents carry no n-grams: repetition_stats and
    contamination_report OMIT them (matching the SQL oracles' unnest and
    the exploded cross-check plan) instead of emitting all-null rows."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id long, text string"
    )
    rep = corpus.repetition_stats(df, n=2).collect()
    assert {r["doc_id"] for r in rep} == {1}
    bench = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    con = contamination.contamination_report(df, bench).collect()
    assert {r["doc_id"] for r in con} == {1}


def test_write_packed_corpus_shards_and_order(spark, tmp_path):
    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 30).alias("tok")
    )
    path = str(tmp_path / "packed")
    packing.write_packed_corpus(
        docs, path, "tok", budget=256, key_col="doc_id",
        salt="sh", bins_per_shard=4, n_buckets=16,
    )
    back = spark.read.parquet(path)
    assert {"doc_id", "tok", "token_offset", "bin_id", "shard"} <= set(back.columns)
    rows = back.collect()
    assert len(rows) == 200
    for r in rows:
        assert r["shard"] == r["bin_id"] // 4
    # global order is recoverable: token_offset strictly increasing in the
    # deterministic order, and matches a fresh in-plan packing run
    expected = {
        r["doc_id"]: (r["token_offset"], r["bin_id"])
        for r in packing.pack_token_bins(
            docs, "tok", 256, "doc_id", salt="sh", n_buckets=16
        ).collect()
    }
    got = {r["doc_id"]: (r["token_offset"], r["bin_id"]) for r in rows}
    assert got == expected
    with pytest.raises(ValueError, match="bins_per_shard"):
        packing.write_packed_corpus(docs, path, "tok", 256, "doc_id", bins_per_shard=0)


def test_curation_report_pass_equals_curated2_survivors(spark):
    """The rejection report must agree with the chain it explains: the
    'pass' rows ARE docs_curated2's survivor set, and every stage label
    is one of the chain's stages with a non-degenerate distribution."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    rep = entry.q_docs_curation_report(spark, sf)
    rows = rep.collect()
    stages = {r["stage"] for r in rows}
    assert stages <= {
        "pass", "exact_dup", "too_short", "too_long",
        "repetitive", "contaminated", "low_quality",
    }
    assert "pass" in stages and len(stages) >= 3  # not a constant column
    passed = {r["doc_id"] for r in rows if r["stage"] == "pass"}
    surv = {r["doc_id"] for r in entry.q_docs_curated2(spark, sf).collect()}
    assert passed == surv
