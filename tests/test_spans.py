"""Substring-run dedup (operators/spans.py)."""

import re
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.operators import spans

# -- pure-python reference (mirrors the test strategy of test_structural) ----


def _norm(t):
    return re.sub(r"[ \t\n\x0b\f\r]+", " ", t.lower()).strip(" ")


def _wins(w, n):
    if len(w) <= n:
        return [" ".join(w)]
    return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]


def ref_span_dedup(rows, n=3, min_doc_freq=2, min_run=2):
    toks = {d: _norm(t).split(" ") for d, t in rows}
    dfreq = defaultdict(set)
    for d, w in toks.items():
        for s in set(_wins(w, n)):
            dfreq[s].add(d)
    out = {}
    for d, w in toks.items():
        ws = _wins(w, n)
        dup = [len(dfreq[s]) >= min_doc_freq for s in ws]
        covered = set()
        i = 0
        while i < len(ws):
            if dup[i]:
                j = i
                while j < len(ws) and dup[j]:
                    j += 1
                if j - i >= min_run:
                    covered.update(range(i, j - 1 + n))
                i = j
            else:
                i += 1
        covered &= set(range(len(w)))
        kept = [t for k, t in enumerate(w) if k not in covered]
        out[d] = (" ".join(kept), len(w), len(covered))
    return out


def _by_id(out):
    return {r["doc_id"]: r for r in out.collect()}


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_shared_mid_document_span_cut_from_both(spark):
    # a 5-token verbatim span inside two otherwise-distinct documents:
    # 5 shared tokens = 3 consecutive duplicated 3-grams -> min_run=3
    rows = [
        (1, "alpha beta the quick brown fox jumps gamma delta"),
        (2, "one two the quick brown fox jumps three four five"),
        (3, "totally unrelated words in this document here"),
    ]
    got = _by_id(spans.span_dedup(_df(spark, rows), n=3, min_run=3))
    assert got[1]["text"] == "alpha beta gamma delta"
    assert got[2]["text"] == "one two three four five"
    assert got[3]["text"] == "totally unrelated words in this document here"
    assert got[1]["n_removed"] == 5 and got[1]["n_tokens"] == 9
    assert got[3]["n_removed"] == 0


def test_min_run_threshold_spares_short_overlaps(spark):
    # 3 shared tokens = exactly ONE duplicated 3-gram; min_run=2 spares it
    rows = [
        (1, "alpha beta common words here gamma"),
        (2, "one two common words here three"),
    ]
    got = _by_id(spans.span_dedup(_df(spark, rows), n=3, min_run=2))
    assert got[1]["n_removed"] == 0
    assert got[2]["n_removed"] == 0
    # min_run=1 cuts it
    got1 = _by_id(spans.span_dedup(_df(spark, rows), n=3, min_run=1))
    assert got1[1]["text"] == "alpha beta gamma"
    assert got1[2]["text"] == "one two three"


def test_fully_duplicated_doc_survives_empty(spark):
    rows = [
        (1, "exact same text repeated across documents entirely"),
        (2, "exact same text repeated across documents entirely"),
    ]
    got = _by_id(spans.span_dedup(_df(spark, rows), n=3, min_run=2))
    for d in (1, 2):
        assert got[d]["text"] == ""
        assert got[d]["n_removed"] == got[d]["n_tokens"] == 7


def test_within_doc_repeat_is_not_cross_doc_duplication(spark):
    # the window repeats INSIDE one document only: distinct-doc freq is 1,
    # so nothing is cut (intra-doc repetition is corpus.repetition_stats'
    # signal, not span dedup's)
    rows = [
        (1, "la la la la la la la la unique tail"),
        (2, "completely different other words here now"),
    ]
    got = _by_id(spans.span_dedup(_df(spark, rows), n=3, min_run=2))
    assert got[1]["n_removed"] == 0


def test_adjacent_runs_with_small_gap_coverage_union(spark):
    # two shared spans separated by ONE differing token: coverage
    # intervals overlap at the token grain; n_removed must count the
    # union, not the sum
    rows = [
        (1, "aa bb cc dd ee XX ff gg hh ii jj"),
        (2, "aa bb cc dd ee YY ff gg hh ii jj"),
    ]
    got = _by_id(
        spans.span_dedup(_df(spark, rows.copy()), n=3, min_run=2)
    )
    # runs: windows 0..2 (aa..ee, tokens 0-4) and 6..8 (ff..jj, tokens 6-10)
    assert got[1]["text"].split(" ") == ["xx"]
    assert got[1]["n_removed"] == 10


def test_report_positions_and_span_text(spark):
    rows = [
        (1, "alpha beta the quick brown fox jumps gamma delta"),
        (2, "one two the quick brown fox jumps three four five"),
    ]
    rep = spans.duplicated_spans(_df(spark, rows), n=3, min_run=3)
    by_doc = {r["doc_id"]: r for r in rep.collect()}
    assert by_doc[1]["start_token"] == 2 and by_doc[1]["end_token"] == 6
    assert by_doc[1]["span"] == "the quick brown fox jumps"
    assert by_doc[1]["n_windows"] == 3
    assert by_doc[2]["start_token"] == 2 and by_doc[2]["end_token"] == 6
    assert by_doc[2]["span"] == "the quick brown fox jumps"


def test_matches_pure_python_reference_on_mixed_corpus(spark):
    # deterministic corpus mixing: full dups, embedded shared spans,
    # short overlaps, normalization variants, uniques, empty text
    shared = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, f"intro words {shared} outro words"),
        (2, f"{shared} and then something else entirely here"),
        (3, f"prefix {shared}"),
        (4, "THE QUICK  brown fox JUMPS over the lazy dog tonight"),
        (5, "quick brown unrelated fox text with no long overlap"),
        (6, "empty overlap doc with its own private vocabulary"),
        (7, ""),
        (8, "intro words only appearing twice intro words only"),
    ]
    for n, min_run in ((3, 2), (3, 4), (5, 2), (2, 3)):
        ref = ref_span_dedup(rows, n=n, min_run=min_run)
        got = _by_id(spans.span_dedup(_df(spark, rows), n=n, min_run=min_run))
        assert set(got) == set(ref)
        for d, (text, n_tokens, n_removed) in ref.items():
            assert got[d]["text"] == text, (d, n, min_run)
            assert got[d]["n_tokens"] == n_tokens
            assert got[d]["n_removed"] == n_removed


def test_null_text_rows_dropped_like_sql_unnest(spark):
    rows = [(1, "some words here"), (2, None)]
    got = _by_id(spans.span_dedup(_df(spark, rows), n=3))
    assert set(got) == {1}


def test_parameter_validation(spark):
    df = _df(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="min_doc_freq"):
        spans.span_dedup(df, min_doc_freq=1)
    with pytest.raises(ValueError, match="min_run"):
        spans.span_dedup(df, min_run=0)
    with pytest.raises(ValueError, match="n must be"):
        spans.duplicated_spans(df, n=0)


# -- snapshot / merge / against-variant --------------------------------------


def test_span_dedup_against_equals_inline(spark):
    rows = [
        (1, "intro words the quick brown fox jumps over the lazy dog outro"),
        (2, "the quick brown fox jumps over the lazy dog and more here"),
        (3, "totally unrelated content in this third document"),
    ]
    df = _df(spark, rows)
    inline = {r["doc_id"]: r for r in spans.span_dedup(df, n=3, min_run=3).collect()}
    snap = spans.duplicated_window_hashes(df, n=3, min_doc_freq=2)
    against = {
        r["doc_id"]: r
        for r in spans.span_dedup_against(df, snap, n=3, min_run=3).collect()
    }
    assert set(inline) == set(against)
    for d in inline:
        assert inline[d]["text"] == against[d]["text"]
        assert inline[d]["n_removed"] == against[d]["n_removed"]


def test_merge_window_reports_equals_full_snapshot(spark):
    a_rows = [(1, "the common span text here alpha"), (2, "solo words one")]
    b_rows = [(3, "the common span text here beta"), (4, "solo words two")]
    a, b = _df(spark, a_rows), _df(spark, b_rows)
    full = _df(spark, a_rows + b_rows)

    merged = spans.merge_window_reports(
        spans.duplicated_window_hashes(a, n=3, min_doc_freq=1),
        spans.duplicated_window_hashes(b, n=3, min_doc_freq=1),
    )
    want = spans.duplicated_window_hashes(full, n=3, min_doc_freq=1)
    to_map = lambda df_: {  # noqa: E731
        r["window_hash"]: (r["doc_freq"], r["n_occurrences"]) for r in df_.collect()
    }
    assert to_map(merged) == to_map(want)

    # the production loop end-to-end: merge -> threshold -> against ==
    # from-scratch span_dedup over the union ("the common span text
    # here" only crosses min_doc_freq=2 across batches)
    got = {
        r["doc_id"]: r["text"]
        for r in spans.span_dedup_against(
            full, merged.filter("doc_freq >= 2"), n=3, min_run=2
        ).collect()
    }
    want_full = {
        r["doc_id"]: r["text"]
        for r in spans.span_dedup(full, n=3, min_doc_freq=2, min_run=2).collect()
    }
    assert got == want_full
    assert got[1] == "alpha"  # the shared span was cut

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least 2"):
        spans.merge_window_reports(want)


def test_window_snapshot_round_trip_and_guards(spark, tmp_path):
    rows = [
        (1, "intro words the quick brown fox jumps over the lazy dog outro"),
        (2, "the quick brown fox jumps over the lazy dog and more here"),
        (3, "totally unrelated content in this third document"),
    ]
    df = _df(spark, rows)
    path = str(tmp_path / "win_snap")
    spans.write_window_snapshot(df, path, n=3, min_doc_freq=1)

    got = {
        r["doc_id"]: r["text"]
        for r in spans.span_dedup_indexed(
            spark, path, df, min_doc_freq=2, min_run=3
        ).collect()
    }
    want = {
        r["doc_id"]: r["text"]
        for r in spans.span_dedup(df, n=3, min_doc_freq=2, min_run=3).collect()
    }
    assert got == want

    # a filtered snapshot cannot answer a lower-threshold probe
    path2 = str(tmp_path / "win_snap_f")
    spans.write_window_snapshot(df, path2, n=3, min_doc_freq=3)
    with pytest.raises(ValueError, match="min_doc_freq"):
        spans.span_dedup_indexed(spark, path2, df, min_doc_freq=2)

    # a foreign/missing hash scheme is refused loudly
    import json

    from intake_esm_spark.util import write_text_sidecar

    write_text_sidecar(
        spark, f"{path}/_span_params",
        json.dumps({"n": 3, "min_doc_freq": 1, "hash_scheme": "other-v9"}),
    )
    with pytest.raises(ValueError, match="hash scheme"):
        spans.span_dedup_indexed(spark, path, df)
