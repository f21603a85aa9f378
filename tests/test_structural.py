"""Line/paragraph-level structural dedup (operators/structural.py)."""

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.operators import structural


@pytest.fixture()
def docs(spark):
    # "boiler" appears in docs 1,2,3; "shared" in 1,2; unique lines per doc.
    rows = [
        (1, "boiler\nalpha one\nshared tail"),
        (2, "beta two\nboiler\nshared tail"),
        (3, "gamma three\nboiler\ngamma four"),
        (4, "all alone here"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _by_id(out):
    return {r["doc_id"]: r for r in out.collect()}

def test_line_dedup_drop_all(spark, docs):
    got = _by_id(structural.line_dedup(docs, min_doc_freq=2))
    assert got[1]["text"] == "alpha one"
    assert got[2]["text"] == "beta two"
    assert got[3]["text"] == "gamma three\ngamma four"
    assert got[4]["text"] == "all alone here"
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 1)
    assert (got[4]["n_lines"], got[4]["n_kept"]) == (1, 1)


def test_line_dedup_keep_first(spark, docs):
    got = _by_id(structural.line_dedup(docs, min_doc_freq=2, keep="first"))
    # doc 1 is the min-id holder of both "boiler" and "shared tail"
    assert got[1]["text"] == "boiler\nalpha one\nshared tail"
    assert got[2]["text"] == "beta two"
    assert got[3]["text"] == "gamma three\ngamma four"


def test_line_dedup_min_doc_freq_threshold(spark, docs):
    # freq-3 lines only: "boiler" (3 docs) removed, "shared tail" (2) kept
    got = _by_id(structural.line_dedup(docs, min_doc_freq=3))
    assert got[1]["text"] == "alpha one\nshared tail"
    assert got[2]["text"] == "beta two\nshared tail"


def test_line_dedup_fully_boilerplate_doc_survives_empty(spark):
    rows = [(1, "dup line"), (2, "dup line"), (3, "dup line\nmine")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = _by_id(structural.line_dedup(df, min_doc_freq=2))
    assert got[1]["text"] == "" and got[1]["n_kept"] == 0
    assert got[3]["text"] == "mine"


def test_line_dedup_normalization_merges_variants(spark):
    rows = [(1, "Cookie  Banner \nkeep a"), (2, "cookie banner\nkeep b")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = _by_id(structural.line_dedup(df, min_doc_freq=2))
    assert got[1]["text"] == "keep a"
    got_raw = _by_id(structural.line_dedup(df, min_doc_freq=2, normalize=False))
    # byte-exact mode: the variants differ, nothing is removed
    assert got_raw[1]["n_kept"] == 2


def test_line_dedup_intra_doc_repeat_counts_once(spark):
    # "x" twice inside doc 1 only: doc_freq == 1 -> NOT cross-doc boilerplate
    rows = [(1, "x\nx\ny"), (2, "z")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = _by_id(structural.line_dedup(df, min_doc_freq=2))
    assert got[1]["text"] == "x\nx\ny"


def test_line_dedup_null_text_dropped_and_order_preserved(spark):
    rows = [(1, None), (2, "b\na\nc"), (3, "b\nq")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = _by_id(structural.line_dedup(df, min_doc_freq=2))
    assert 1 not in got
    assert got[2]["text"] == "a\nc"  # intra-doc order, not sorted content


def test_line_dedup_custom_segmentation(spark):
    # fixed 2-word windows as "lines": shared window "a b" removed
    rows = [(1, "a b c d"), (2, "a b x y")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    words = F.split(F.col("text"), " ")
    chunks = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(words) / F.lit(2.0)).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * 2 + 1, 2)),
    )
    seg = df.select("doc_id", chunks.alias("__chunks"))
    got = _by_id(
        structural.line_dedup(seg, id_col="doc_id", lines=F.col("__chunks"))
    )
    assert got[1]["text"] == "c d"
    assert got[2]["text"] == "x y"


def test_line_dedup_validates_args(spark, docs):
    with pytest.raises(ValueError, match="keep"):
        structural.line_dedup(docs, keep="last")
    with pytest.raises(ValueError, match="min_doc_freq"):
        structural.line_dedup(docs, min_doc_freq=1)


def test_duplicated_lines_report(spark, docs):
    rep = {
        r["line"]: r
        for r in structural.duplicated_lines(docs, min_doc_freq=2).collect()
    }
    assert set(rep) == {"boiler", "shared tail"}
    assert rep["boiler"]["doc_freq"] == 3
    assert rep["boiler"]["n_occurrences"] == 3
    assert rep["boiler"]["first_doc"] == 1
    assert rep["shared tail"]["doc_freq"] == 2


def test_line_dedup_plan_shape(spark, docs):
    """No global (unpartitioned) window, no cartesian; exactly the three
    designed exchanges: fp-agg, fp-join, id-reassembly."""
    plan = structural.line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # operator uses aggregation, not windows


def test_line_dedup_against_report_equivalence(spark, docs):
    """line_dedup_against(df, duplicated_lines(df)) reproduces line_dedup
    exactly, in both modes — the one-corpus-scan production shape."""
    report = structural.duplicated_lines(docs, min_doc_freq=2)
    for keep in ("none", "first"):
        direct = sorted(
            map(tuple, structural.line_dedup(docs, min_doc_freq=2, keep=keep).collect())
        )
        via_report = sorted(
            map(tuple, structural.line_dedup_against(docs, report, keep=keep).collect())
        )
        assert direct == via_report


def test_line_dedup_against_single_scan(spark, docs):
    """With the report materialized, the corpus is scanned exactly once
    (line_dedup proper needs two differently-pruned scans)."""
    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    report = structural.duplicated_lines(corpus, min_doc_freq=2).localCheckpoint()
    plan = (
        structural.line_dedup_against(corpus, report)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    two_scan = (
        structural.line_dedup(corpus)._jdf.queryExecution().executedPlan().toString()
    )
    assert two_scan.count("Scan parquet") == 2
    with pytest.raises(ValueError, match="keep"):
        structural.line_dedup_against(corpus, report, keep="last")


# -- incremental report merge -------------------------------------------------


def _report_sets(df):
    return {
        r["fingerprint"]: (
            r["line"],
            r["doc_freq"],
            r["n_occurrences"],
            r["first_doc"],
        )
        for r in df.collect()
    }


def test_merge_line_reports_equals_full_report(spark):
    """merge(report(A,1), report(B,1)) == report(A∪B,1) for disjoint
    batches — the incremental-refresh contract, column for column."""
    a_rows = [
        (1, "boiler\nalpha one"),
        (2, "boiler\nshared tail"),
    ]
    b_rows = [
        (3, "shared tail\nbeta two"),
        (4, "boiler\nBOILER \ngamma"),  # normalization variants merge
    ]
    a = spark.createDataFrame(a_rows, "doc_id bigint, text string")
    b = spark.createDataFrame(b_rows, "doc_id bigint, text string")
    full = spark.createDataFrame(a_rows + b_rows, "doc_id bigint, text string")

    merged = structural.merge_line_reports(
        structural.duplicated_lines(a, min_doc_freq=1),
        structural.duplicated_lines(b, min_doc_freq=1),
    )
    want = structural.duplicated_lines(full, min_doc_freq=1)
    assert _report_sets(merged) == _report_sets(want)

    # filtering the MERGED report reproduces the thresholded report:
    # "shared tail" has doc_freq 1 in each batch and only crosses
    # min_doc_freq=2 in the union
    got2 = _report_sets(
        merged.filter(merged["doc_freq"] >= 2)
    )
    want2 = _report_sets(structural.duplicated_lines(full, min_doc_freq=2))
    assert got2 == want2
    assert any(line == "shared tail" for line, *_ in got2.values())


def test_merge_line_reports_three_way_and_validation(spark):
    import pytest as _pytest

    batches = [
        spark.createDataFrame(
            [(i * 10 + j, f"common line\nunique {i} {j}") for j in range(2)],
            "doc_id bigint, text string",
        )
        for i in range(3)
    ]
    full = batches[0].unionByName(batches[1]).unionByName(batches[2])
    merged = structural.merge_line_reports(
        *[structural.duplicated_lines(b, min_doc_freq=1) for b in batches]
    )
    want = structural.duplicated_lines(full, min_doc_freq=1)
    assert _report_sets(merged) == _report_sets(want)

    with _pytest.raises(ValueError, match="at least 2"):
        structural.merge_line_reports(want)


def test_stream_line_filter_fed_by_merged_snapshot(spark):
    """The production loop: snapshot per batch, merge, threshold, feed
    the stream filter — identical scrubbing to a from-scratch report."""
    from intake_esm_spark.streaming.stateful import stream_line_filter

    a = spark.createDataFrame(
        [(1, "cookie banner\nkeep a"), (2, "cookie banner\nkeep b")],
        "doc_id bigint, text string",
    )
    b = spark.createDataFrame(
        [(3, "new footer\nkeep c"), (4, "new footer\nkeep d")],
        "doc_id bigint, text string",
    )
    merged = structural.merge_line_reports(
        structural.duplicated_lines(a, min_doc_freq=1),
        structural.duplicated_lines(b, min_doc_freq=1),
    ).filter("doc_freq >= 2")

    arriving = spark.createDataFrame(
        [(9, "cookie banner\nnew footer\nfresh content")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in stream_line_filter(arriving, merged).collect()
    }
    assert got[9] == "fresh content"
