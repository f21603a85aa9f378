"""Deterministic sampling + corpus-statistics operators."""

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.operators import corpus, sampling


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en")
        .when(F.col("id") % 4 == 1, "de")
        .otherwise("zh")
        .alias("lang"),
    )


def test_hash_sample_deterministic_and_partition_independent(keyed):
    a = {r["doc_id"] for r in sampling.hash_sample(keyed, 0.1, "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in sampling.hash_sample(keyed.repartition(7), 0.1, "doc_id").collect()
    }
    assert a == b  # df.sample() fails exactly this property
    # approximately the requested fraction
    assert 0.05 < len(a) / 2000 < 0.15


def test_hash_sample_salt_draws_independent_sample(keyed):
    a = {r["doc_id"] for r in sampling.hash_sample(keyed, 0.2, "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in sampling.hash_sample(keyed, 0.2, "doc_id", salt="v2").collect()
    }
    assert a != b
    # independent draws overlap ~ fraction^2, not ~ fraction
    assert len(a & b) < len(a)


def test_hash_sample_fraction_edges(keyed):
    assert sampling.hash_sample(keyed, 0.0, "doc_id").count() == 0
    assert sampling.hash_sample(keyed, 1.0, "doc_id").count() == 2000
    with pytest.raises(ValueError):
        sampling.hash_sample(keyed, 1.5, "doc_id")


def test_stratified_sample_respects_strata(keyed):
    out = sampling.stratified_hash_sample(
        keyed, {"en": 1.0, "de": 0.2}, "lang", "doc_id", default_fraction=0.0
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_lang["en"] == 500  # fraction 1.0 keeps every row
    assert 0 < by_lang.get("de", 0) < 250  # ~20% of 500
    assert "zh" not in by_lang  # default 0.0 drops the rest
    # the kept 'de' ids are exactly the ids the unstratified 0.2 sample keeps
    flat = {
        r["doc_id"]
        for r in sampling.hash_sample(
            keyed.filter(F.col("lang") == "de"), 0.2, "doc_id"
        ).collect()
    }
    strat_de = {r["doc_id"] for r in out.filter(F.col("lang") == "de").collect()}
    assert strat_de == flat


def test_hash_sample_monotone_in_fraction(keyed):
    """sample(f1) ⊆ sample(f2) for f1 <= f2 — thresholds on one fixed
    bucket value nest, so growing a sample never swaps rows out (the
    property that lets a pipeline scale its sample up without invalidating
    work done on the smaller one)."""
    small = {r["doc_id"] for r in sampling.hash_sample(keyed, 0.05, "doc_id").collect()}
    big = {r["doc_id"] for r in sampling.hash_sample(keyed, 0.3, "doc_id").collect()}
    assert small <= big


def test_take_per_group_exact_n_and_deterministic(keyed):
    out = sampling.take_per_group(keyed, 7, "lang", "doc_id")
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_lang == {"en": 7, "de": 7, "zh": 7}
    again = sampling.take_per_group(keyed.repartition(5), 7, "lang", "doc_id")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}
    # n larger than a stratum keeps the whole stratum
    all_of = sampling.take_per_group(keyed, 10_000, "lang", "doc_id")
    assert all_of.count() == 2000


def test_vocab_topk_counts_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "Apple  date"),
            (4, "   "),
        ],
        ["doc_id", "text"],
    )
    out = corpus.vocab_topk(docs, k=3).collect()
    assert [(r["token"], r["freq"]) for r in out] == [
        ("apple", 3),  # normalization lowercases
        ("banana", 2),
        ("cherry", 1),  # freq-tie with 'date' broken token-asc
    ]


def test_length_histogram(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 5), (2, "y" * 150), (3, "z" * 199), (4, "")],
        ["doc_id", "text"],
    )
    out = {r["bin_start"]: r["n_docs"] for r in corpus.length_histogram(docs).collect()}
    assert out == {0: 2, 100: 2}


def test_spark_md5_bucket_matches_duckdb(spark):
    """The Spark conv(hex,16,10) bucket must equal DuckDB's
    ('0x'||hex)::BIGINT construction — the property the sampling oracles
    rest on."""
    import duckdb

    keys = [0, 1, 42, 999_983]
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", sampling.hash_bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    for k in keys:
        expected = duckdb.sql(
            f"SELECT CAST(('0x' || substr(md5('|' || CAST({k} AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000"
        ).fetchone()[0]
        assert got[k] == expected


def test_hash_bucket_salt_key_boundary_unambiguous(spark):
    """salt='v1', key='23' must NOT collide with salt='v12', key='3' —
    the delimiter makes the (salt, key) encoding injective."""
    df = spark.createDataFrame([("23",), ("3",)], "k string")
    b1 = df.filter(F.col("k") == "23").select(
        sampling.hash_bucket(F.col("k"), salt="v1").alias("b")
    ).collect()[0]["b"]
    b2 = df.filter(F.col("k") == "3").select(
        sampling.hash_bucket(F.col("k"), salt="v12").alias("b")
    ).collect()[0]["b"]
    assert b1 != b2


def test_source_overlap_counts_shared_fingerprints(spark):
    from intake_esm_spark.operators.corpus import source_overlap

    rows = [
        ("f1", "A"), ("f1", "B"), ("f1", "C"),   # f1 shared by A,B,C
        ("f2", "A"), ("f2", "B"),                 # f2 shared by A,B
        ("f3", "C"),                              # unique
        ("f2", "A"),                              # duplicate row: ignored
    ]
    df = spark.createDataFrame(rows, "fingerprint string, source string")
    got = {
        (r["source_a"], r["source_b"]): r["shared"]
        for r in source_overlap(df).collect()
    }
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}


def test_gram_duplication_exposure(spark):
    from intake_esm_spark.operators.corpus import gram_duplication

    rows = [
        (1, "a b c d e f"),        # shares its whole run with doc 2
        (2, "a b c d e f"),
        (3, "z y x w v u"),        # unique
        (4, None),                 # dropped
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in gram_duplication(df, n=5).collect()}
    assert 4 not in got
    # docs 1/2: both 5-grams shared -> dup_frac 1.0; doc 3: none
    assert got[1]["dup_frac"] == 1.0 and got[2]["dup_frac"] == 1.0
    assert got[3]["dup_frac"] == 0.0
    assert got[1]["n_grams"] == 2  # 6 words -> two 5-grams


def test_weighted_take_prefers_heavy_rows(spark):
    """A-ES: a row with 100x the weight must appear in far more k=1
    draws across independent salts than a light row."""
    from intake_esm_spark.operators.sampling import weighted_take_per_group

    rows = [("g", "heavy", 100.0)] + [("g", f"light{i}", 1.0) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, id string, w double")
    wins = 0
    for salt in map(str, range(12)):
        picked = weighted_take_per_group(df, 1, "w", "g", "id", salt=salt).collect()
        wins += picked[0]["id"] == "heavy"
    # heavy holds 100/110 of the mass; 12 independent draws all-light has
    # p < 1e-12 — and the hash makes this exact assertion reproducible
    assert wins >= 8


def test_weighted_take_excludes_nonpositive_and_null(spark):
    from intake_esm_spark.operators.sampling import weighted_take_per_group

    rows = [("g", "a", 1.0), ("g", "b", 0.0), ("g", "c", -2.0), ("g", "d", None)]
    df = spark.createDataFrame(rows, "g string, id string, w double")
    out = weighted_take_per_group(df, 10, "w", "g", "id")
    assert [r["id"] for r in out.collect()] == ["a"]


def test_weighted_take_deterministic_across_partitionings(spark):
    from intake_esm_spark.operators.sampling import weighted_take_per_group

    rows = [("g", f"id{i}", float(1 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id string, w double")
    a = {r["id"] for r in weighted_take_per_group(df, 20, "w", "g", "id").collect()}
    b = {
        r["id"]
        for r in weighted_take_per_group(
            df.repartition(13), 20, "w", "g", "id"
        ).collect()
    }
    assert a == b and len(a) == 20


def test_weighted_bernoulli_rate_tracks_probability(spark):
    from intake_esm_spark.operators.sampling import weighted_bernoulli_sample

    rows = [(f"id{i}", 0.9 if i % 2 == 0 else 0.05) for i in range(2000)]
    df = spark.createDataFrame(rows, "id string, p double")
    kept = weighted_bernoulli_sample(df, "p", "id").groupBy("p").count().collect()
    rates = {r["p"]: r["count"] / 1000.0 for r in kept}
    assert 0.85 <= rates[0.9] <= 0.95
    assert rates.get(0.05, 0.0) <= 0.1


def test_collocations_hand_example(spark):
    """'new york' appears adjacently 3x; score = (3-1)*N/(n_new*n_york)."""
    from intake_esm_spark.operators.corpus import collocations

    rows = [
        ("new york is big new york has new york",),
        ("york new things",),
    ]
    df = spark.createDataFrame(rows, "text string")
    out = {
        r["bigram"]: r.asDict()
        for r in collocations(df, min_count=3, k=10).collect()
    }
    assert list(out) == ["new york"]
    r = out["new york"]
    # tokens: doc1 has 9, doc2 has 3 -> N=12; new: 4, york: 4
    assert r["n_pair"] == 3 and r["n_a"] == 4 and r["n_b"] == 4
    assert r["score"] == pytest.approx((3 - 1) * 12 / (4 * 4), abs=1e-6)


def test_collocations_validation(spark):
    from intake_esm_spark.operators.corpus import collocations

    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        collocations(df, min_count=0)
    with pytest.raises(ValueError):
        collocations(df, k=0)


# --- zipf_fit ---------------------------------------------------------------


def test_zipf_exact_powerlaw_slope(spark):
    """Frequencies constructed as an exact power law freq = 64/rank:
    ln(freq) = ln(64) − 1·ln(rank), so the fit recovers slope −1 with
    r² = 1 on any head size."""
    import pytest as _pt

    from intake_esm_spark.operators.corpus import zipf_fit

    # token at rank r repeated 60/r times => freq(rank) = 60/rank for
    # ranks 1..5 (60, 30, 20, 15, 12 — all distinct, so ranks are the
    # positional ranks)
    docs = []
    for r in (1, 2, 3, 4, 5):
        docs.extend([(f"tok{r:02d}",)] * (60 // r))
    df = spark.createDataFrame(docs, "text string")
    out = zipf_fit(df, "text", top_n=10).collect()[0]
    assert out["n_terms"] == 5
    assert out["total_tokens"] == 60 + 30 + 20 + 15 + 12
    assert out["slope"] == _pt.approx(-1.0, abs=1e-5)
    assert out["r2"] == _pt.approx(1.0, abs=1e-6)


def test_zipf_degenerate_and_validation(spark):
    import pytest as _pt

    from intake_esm_spark.operators.corpus import zipf_fit

    one = spark.createDataFrame([("hello",)], "text string")
    r = zipf_fit(one, "text").collect()[0]
    assert r["n_terms"] == 1 and r["slope"] is None and r["r2"] is None
    with _pt.raises(ValueError):
        zipf_fit(one, "text", top_n=1)


# --- source_keywords --------------------------------------------------------


def test_source_keywords_discriminative_tokens_surface(spark):
    import pytest as _pt

    from intake_esm_spark.operators.corpus import source_keywords

    rows = (
        [("a", "alpha alpha alpha common common")] * 2
        + [("b", "beta beta common common")] * 2
        + [("c", "gamma gamma common")] * 2
    )
    df = spark.createDataFrame(rows, "source string, text string")
    out = source_keywords(df, "source", "text", k=5, min_count=2)
    got = {(r["source"], r["token"]): r for r in out.collect()}
    # 'common' is in every source -> idf 0 -> never surfaces
    assert not any(t == "common" for _, t in got)
    a = got[("a", "alpha")]
    assert a["tf"] == 6 and a["df"] == 1 and a["rank"] == 1
    import math

    assert a["score"] == _pt.approx(6 * math.log(3.0), abs=1e-6)
    with _pt.raises(ValueError):
        source_keywords(df, k=0)


# --- source_divergence ------------------------------------------------------


def test_source_divergence_identical_and_hand_value(spark):
    import math

    import pytest as _pt

    from intake_esm_spark.operators.corpus import source_divergence

    # identical distributions -> JSD 0
    rows = [("a", "x x y y"), ("b", "x x y y")] * 2
    df = spark.createDataFrame(rows, "source string, text string")
    out = source_divergence(df, "source", "text", min_count=2).collect()
    assert len(out) == 1 and out[0]["jsd"] == 0.0

    # hand case: A = {x:1}, B = {x:.5, y:.5} (each token appears >= 2x)
    rows2 = [("a", "x x x x"), ("b", "x x y y")]
    df2 = spark.createDataFrame(rows2, "source string, text string")
    r = source_divergence(df2, "source", "text", min_count=2).collect()[0]
    pa, pb = 1.0, 0.5
    shared = pa * math.log(2 * pa / (pa + pb)) + pb * math.log(
        2 * pb / (pa + pb)
    )
    expect = (shared + (2.0 - pa - pb) * math.log(2.0)) / 2.0
    assert r["jsd"] == _pt.approx(expect, abs=1e-6)
    assert (r["n_tokens_a"], r["n_tokens_b"]) == (4, 4)


def test_source_divergence_symmetric_bounds(spark):
    import math

    from intake_esm_spark.operators.corpus import source_divergence

    rows = [
        ("a", "p p q q r r"), ("b", "q q r r s s"), ("c", "p p s s"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = source_divergence(df, "source", "text", min_count=2).collect()
    assert len(out) == 3  # all pairs share at least one token
    for r in out:
        assert 0.0 <= r["jsd"] <= math.log(2.0) + 1e-9
        assert r["group_a"] < r["group_b"]


def test_source_divergence_disjoint_pair_reports_ln2(spark):
    import math

    import pytest as _pt

    from intake_esm_spark.operators.corpus import source_divergence

    # a and b share nothing above min_count: the maximal-divergence
    # case must be a ROW at exactly ln 2, never a silent absence
    rows = [("a", "x x y y"), ("b", "p p q q")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = source_divergence(df, "source", "text", min_count=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    assert r["jsd"] == _pt.approx(math.log(2.0), abs=1e-6)
    assert (r["n_tokens_a"], r["n_tokens_b"]) == (4, 4)


def test_source_divergence_max_groups_guard(spark):
    import pytest as _pt

    from intake_esm_spark.operators.corpus import source_divergence

    rows = [(f"g{i}", "x x y y") for i in range(5)]
    df = spark.createDataFrame(rows, "source string, text string")
    # the guard is LAZY (in-plan assert_true): construction stays cheap,
    # the informative error fires at execution
    plan = source_divergence(df, "source", "text", max_groups=3)
    with _pt.raises(Exception, match="more than 3 distinct groups"):
        plan.collect()
    # raising the guard admits the same frame
    assert len(source_divergence(df, "source", "text", max_groups=5).collect()) == 10
    with _pt.raises(ValueError):
        source_divergence(df, "source", "text", max_groups=1)
