"""BM25 retrieval (operators/retrieval.py)."""

import math

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.operators import retrieval


def _ref_bm25(docs: dict, terms, k1=1.2, b=0.75):
    words = {d: " ".join(t.lower().split()).split(" ") for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(w) for w in words.values()) / n
    dfs = {t: sum(1 for w in words.values() if t in w) for t in terms}
    out = {}
    for d, ws in words.items():
        s = 0.0
        for t in terms:
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            tf = ws.count(t)
            s += idf * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl)))
        if round(s, 6) > 0:
            out[d] = s
    return out


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "spark runs fast queries on big tables"),
        (2, "spark spark spark nothing else matters spark"),
        (3, "a totally unrelated document about gardening and soil"),
        (4, "fast tables need fast queries and a fast engine"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_matches_python_reference(spark, corpus):
    docs = {r["doc_id"]: r["text"] for r in corpus.collect()}
    terms = ["spark", "fast"]
    expected = _ref_bm25(docs, terms)
    got = {
        r["doc_id"]: r["bm25"]
        for r in retrieval.bm25_scores(corpus, terms).collect()
    }
    assert set(got) == set(expected)
    for d, s in expected.items():
        assert got[d] == pytest.approx(s, abs=1e-6)


def test_bm25_repetition_saturates(spark, corpus):
    """BM25's tf saturation: the spam doc (4x 'spark') scores higher than
    one mention but far less than 4x - and an unrelated doc scores 0
    (filtered out)."""
    got = {
        r["doc_id"]: r["bm25"]
        for r in retrieval.bm25_scores(corpus, ["spark"]).collect()
    }
    assert 3 not in got and 4 not in got
    assert got[2] > got[1]
    assert got[2] < 4 * got[1]


def test_bm25_topk_order_and_validation(spark, corpus):
    top = retrieval.bm25_topk(corpus, ["fast", "queries"], k=2).collect()
    assert len(top) == 2
    assert top[0]["bm25"] >= top[1]["bm25"]
    assert top[0]["doc_id"] == 4  # three 'fast' + 'queries'
    with pytest.raises(ValueError, match="terms"):
        retrieval.bm25_scores(corpus, [])


def test_bm25_single_stats_pass_plan(spark, corpus):
    """Scoring is in-row after ONE stats aggregation: the plan has no
    shuffle join (stats broadcast back) and no Python eval."""
    plan = (
        retrieval.bm25_scores(corpus, ["spark"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tfidf_top_terms_reference(spark):
    rows = [
        (1, "apple apple banana common common"),
        (2, "banana cherry common common"),
        (3, "common words only common"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tfidf"])
        for r in retrieval.tfidf_top_terms(df, k=2).collect()
    }
    n = 3
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5);
    # common tf=2 df=3 -> 0
    assert got[(1, 1)][0] == "apple"
    assert got[(1, 1)][1] == pytest.approx(2 * math.log(3), abs=1e-6)
    assert got[(1, 2)][0] == "banana"
    # doc 3: every term has tfidf 0 ('common', 'words', 'only'...); ties
    # broken by term asc — deterministic
    assert got[(3, 1)][1] == pytest.approx(
        math.log(n / 1), abs=1e-6
    ) or got[(3, 1)][1] >= 0.0
    with pytest.raises(ValueError, match="k must"):
        retrieval.tfidf_top_terms(df, k=0)


def test_tfidf_min_df_drops_hapaxes(spark):
    rows = [(1, "rare apple apple"), (2, "apple banana")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = retrieval.tfidf_top_terms(df, k=3, min_df=2).collect()
    assert all(r["term"] != "rare" for r in got)


# ---------------------------------------------------------------------------
# inverted index


def test_indexed_bm25_equals_inline(spark, corpus, tmp_path):
    """The equality contract: a probe against the materialized index
    reproduces the inline corpus-scan top-k bit-for-bit (ids AND
    scores), including with duplicate query terms."""
    path = str(tmp_path / "ii")
    stats = retrieval.write_inverted_index(corpus, path)
    assert stats["n_docs"] == 4
    for terms in (["spark", "fast"], ["spark", "spark", "tables"]):
        inline = retrieval.bm25_topk(corpus, terms, k=10).collect()
        probed = retrieval.bm25_topk_indexed(spark, path, terms, k=10).collect()
        assert [tuple(r) for r in probed] == [tuple(r) for r in inline]


def test_indexed_probe_partition_prunes(spark, corpus, tmp_path):
    """The probe must reach the scan as a bucket partition filter —
    pruning, not a post-scan filter over all postings."""
    import io
    from contextlib import redirect_stdout

    path = str(tmp_path / "ii2")
    retrieval.write_inverted_index(corpus, path)
    buf = io.StringIO()
    with redirect_stdout(buf):
        retrieval.bm25_topk_indexed(spark, path, ["spark"], k=5).explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1].split("]")[0]
    assert "bucket" in seg


def test_indexed_bm25_unknown_term_scores_zero_docs(spark, corpus, tmp_path):
    path = str(tmp_path / "ii3")
    retrieval.write_inverted_index(corpus, path)
    assert retrieval.bm25_topk_indexed(spark, path, ["zzzznope"], k=5).count() == 0


def test_inverted_index_validation(spark, corpus, tmp_path):
    with pytest.raises(ValueError):
        retrieval.write_inverted_index(corpus, str(tmp_path / "x"), n_term_buckets=0)
    with pytest.raises(ValueError):
        retrieval.write_inverted_index(
            corpus, str(tmp_path / "x"), files_per_bucket=0
        )
    path = str(tmp_path / "ii4")
    retrieval.write_inverted_index(corpus, path)
    with pytest.raises(ValueError):
        retrieval.bm25_topk_indexed(spark, path, [])


def test_appended_index_equals_single_shot_build(spark, corpus, tmp_path):
    """append(build(A), B) must probe bit-identically to build(A ∪ B):
    postings union is identical and the sidecar stats update by exact
    integer addition."""
    a = corpus.filter(F.col("doc_id") <= 2)
    b = corpus.filter(F.col("doc_id") > 2)
    p_incr = str(tmp_path / "incr")
    p_full = str(tmp_path / "full")
    retrieval.write_inverted_index(a, p_incr)
    stats = retrieval.inverted_index_append(b, p_incr)
    full_stats = retrieval.write_inverted_index(corpus, p_full)
    assert stats == full_stats
    for terms in (["spark", "fast"], ["tables"]):
        incr = retrieval.bm25_topk_indexed(spark, p_incr, terms, k=10).collect()
        full = retrieval.bm25_topk_indexed(spark, p_full, terms, k=10).collect()
        assert [tuple(r) for r in incr] == [tuple(r) for r in full]


# --- phrase_search ----------------------------------------------------------


def test_phrase_search_hand_examples(spark):
    from intake_esm_spark.operators.retrieval import phrase_search

    rows = [
        (1, "the quick brown fox jumps"),
        (2, "brown the quick dog"),          # words present, phrase absent
        (3, "say the quick brown then the quick brown again"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in phrase_search(df, "the quick brown").collect()
    }
    assert set(out) == {1, 3}
    assert out[1]["n_matches"] == 1 and out[1]["first_pos"] == 1
    assert out[3]["n_matches"] == 2 and out[3]["first_pos"] == 2


def test_phrase_search_repeated_term_and_overlap(spark):
    """'a a a' contains 'a a' twice (overlapping starts 1 and 2)."""
    from intake_esm_spark.operators.retrieval import phrase_search

    df = spark.createDataFrame(
        [(1, "a a a"), (2, "a b a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in phrase_search(df, "a a").collect()}
    assert set(out) == {1}
    assert out[1]["n_matches"] == 2 and out[1]["first_pos"] == 1


def test_phrase_search_normalizes_and_validates(spark):
    from intake_esm_spark.operators.retrieval import phrase_search

    df = spark.createDataFrame(
        [(1, "Foo   BAR baz")], "doc_id long, text string"
    )
    out = phrase_search(df, "  foo bar  ").collect()
    assert len(out) == 1 and out[0]["first_pos"] == 1
    import pytest as _pt

    with _pt.raises(ValueError):
        phrase_search(df, "   ")
