"""Encoding repair / unicode normalization (functions/encoding.py)."""

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from intake_esm_spark.functions import encoding as enc

NFD_CAFE = "caf" + "e" + "\u0301"  # cafe-acute decomposed (e + combining acute)
NFC_CAFE = "caf" + "\u00e9"  # composed
assert NFD_CAFE != NFC_CAFE
assert unicodedata.normalize("NFC", NFD_CAFE) == NFC_CAFE


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _one(spark, text, col):
    return (
        _df(spark, [(1, text)]).select(col.alias("v")).collect()[0]["v"]
    )


# -- rate signals ------------------------------------------------------------


def test_control_char_ratio(spark):
    assert _one(spark, "ab\x00\x1fcd\x7f", enc.control_char_ratio(F.col("text"))) == pytest.approx(3 / 7)
    # whitespace-family controls are layout, not damage
    assert _one(spark, "a\tb\nc\x0b\x0c\rd", enc.control_char_ratio(F.col("text"))) == 0.0
    assert _one(spark, "", enc.control_char_ratio(F.col("text"))) == 0.0


def test_replacement_char_count(spark):
    assert _one(spark, "a�b��", enc.replacement_char_count(F.col("text"))) == 3
    assert _one(spark, "clean", enc.replacement_char_count(F.col("text"))) == 0


def test_mojibake_count(spark):
    assert _one(spark, "cafÃ© arrivÃ©", enc.mojibake_count(F.col("text"))) == 2  # Ã©
    assert _one(spark, "itâ€™s fine", enc.mojibake_count(F.col("text"))) == 1  # â€™
    # a genuinely-French sentence with é ü ß: no indicator bigrams
    assert _one(spark, "déjà vu — üben, straße", enc.mojibake_count(F.col("text"))) == 0


def test_non_ascii_ratio(spark):
    assert _one(spark, "abcé", enc.non_ascii_ratio(F.col("text"))) == pytest.approx(0.25)
    assert _one(spark, "a\tb\nc\r", enc.non_ascii_ratio(F.col("text"))) == 0.0
    assert _one(spark, "日本語", enc.non_ascii_ratio(F.col("text"))) == 1.0


# -- NFC ---------------------------------------------------------------------


def test_nfc_text_composes_and_passes_through(spark):
    rows = [(1, NFD_CAFE), (2, NFC_CAFE), (3, "plain ascii"), (4, None)]
    got = {
        r["doc_id"]: r["v"]
        for r in _df(spark, rows)
        .select("doc_id", enc.nfc_text(F.col("text")).alias("v"))
        .collect()
    }
    assert got[1] == NFC_CAFE
    assert got[2] == NFC_CAFE
    assert got[3] == "plain ascii"
    assert got[4] is None


def test_nfc_matches_duckdb_nfc_normalize_rowwise(spark):
    # the oracle contract: python unicodedata NFC == DuckDB nfc_normalize
    samples = [
        NFD_CAFE,
        NFC_CAFE,
        "A\u030a",  # A + combining ring (composes to U+00C5)
        "\u212b",  # ANGSTROM SIGN (NFC-composes to U+00C5)
        "A\u0327\u0301",  # A + cedilla + acute (canonical reordering)
        "\uff46\uff55\uff4c\uff4c",  # fullwidth: NFC must NOT fold these
        "\ud55c\uad6d\uc5b4",  # precomposed Hangul
        "\u1100\u1161\u11a8",  # Hangul jamo (composes to U+AC01)
        "mixed " + NFC_CAFE + " " + NFD_CAFE + " text",
        "",
    ]
    got = [
        r["v"]
        for r in _df(spark, list(enumerate(samples)))
        .orderBy("doc_id")
        .select(enc.nfc_text(F.col("text")).alias("v"))
        .collect()
    ]
    want = [
        duckdb.sql("select nfc_normalize(?)", params=[s]).fetchone()[0]
        for s in samples
    ]
    assert got == want
    # and both equal python's own normalize
    assert got == [unicodedata.normalize("NFC", s) for s in samples]


# -- mojibake repair ---------------------------------------------------------


def test_repair_mojibake_fixes_classic_cases(spark):
    rows = [
        (1, "cafÃ©"),  # é as latin-1 mojibake
        (2, "itâ€™s"),  # ’ as cp1252 mojibake
        (3, "cafÃÂ©"),  # double mojibake of é
        (4, "clean ascii text"),
        (5, "déjà vu"),  # real accents: cp1252 bytes are invalid UTF-8
        (6, None),
    ]
    got = {
        r["doc_id"]: r["v"]
        for r in _df(spark, rows)
        .select("doc_id", enc.repair_mojibake(F.col("text")).alias("v"))
        .collect()
    }
    assert got[1] == "café"
    assert got[2] == "it’s"
    assert got[3] == "café"
    assert got[4] == "clean ascii text"
    assert got[5] == "déjà vu"
    assert got[6] is None


def test_repair_mojibake_leaves_undecodable_text_alone(spark):
    # 'é©' encodes to latin-1 bytes E9 A9 — not valid UTF-8, so the pass
    # must leave the original untouched rather than corrupt it
    assert _one(spark, "é©", enc.repair_mojibake(F.col("text"))) == "é©"


# -- the chain argument: repair BEFORE fingerprinting ------------------------


def test_nfc_stage_changes_structural_dedup_outcome(spark):
    """The curated-chain property the stage exists for: the same
    boilerplate line shipped composed in one doc and decomposed in
    another only dedups when NFC runs first."""
    from intake_esm_spark.operators import structural

    rows = [
        (1, f"{NFC_CAFE} cookie banner\nkeep me one"),
        (2, f"{NFD_CAFE} cookie banner\nkeep me two"),
    ]
    raw = _df(spark, rows)

    # without repair: fingerprints differ, nothing is boilerplate
    got_raw = {
        r["doc_id"]: r
        for r in structural.line_dedup(raw, min_doc_freq=2).collect()
    }
    assert got_raw[1]["n_kept"] == 2 and got_raw[2]["n_kept"] == 2

    # with the NFC stage first: the line dedups away in BOTH docs
    fixed = raw.withColumn("text", enc.nfc_text(F.col("text")))
    got_fixed = {
        r["doc_id"]: r
        for r in structural.line_dedup(fixed, min_doc_freq=2).collect()
    }
    assert got_fixed[1]["text"] == "keep me one"
    assert got_fixed[2]["text"] == "keep me two"
    assert got_fixed[1]["n_kept"] == 1


def test_fingerprint_nfc_merges_canonical_variants(spark):
    from intake_esm_spark.functions.text import normalized_text

    rows = [(1, NFC_CAFE), (2, NFD_CAFE)]
    fps = (
        _df(spark, rows)
        .select(F.md5(normalized_text(enc.nfc_text(F.col("text")))).alias("f"))
        .collect()
    )
    assert fps[0]["f"] == fps[1]["f"]
