"""Text-analysis column function tests on the driver's documents table plus
hand-built edge cases."""

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.functions import text as tx

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_ws_token_count_edges(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("  leading space",), ("",), ("   ",), ("one",)], ["text"]
    )
    out = [r[0] for r in df.select(tx.ws_token_count(F.col("text"))).collect()]
    assert out == [3, 2, 0, 0, 1]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("Hello, world! 42",)], ["text"])
    # Hello , world ! 42 -> 5
    assert df.select(tx.bpe_ish_token_count(F.col("text"))).collect()[0][0] == 5


def test_ratios_bounded(docs):
    row = docs.select(
        F.min(tx.punct_ratio(F.col("text"))).alias("pmin"),
        F.max(tx.punct_ratio(F.col("text"))).alias("pmax"),
        F.min(tx.quality_score(F.col("text"))).alias("qmin"),
        F.max(tx.quality_score(F.col("text"))).alias("qmax"),
    ).collect()[0]
    assert 0.0 <= row["pmin"] <= row["pmax"] <= 1.0
    assert 0.0 <= row["qmin"] <= row["qmax"] <= 1.0


def test_lang_id_obvious(spark):
    df = spark.createDataFrame(
        [
            ("the cat is in the house and it is warm",),
            ("der hund ist nicht in das haus und sie",),
            ("le chat est dans la maison et les oiseaux",),
            ("xyzzy qwerty",),
        ],
        ["text"],
    )
    out = [r[0] for r in df.select(tx.lang_id(F.col("text"))).collect()]
    assert out == ["en", "de", "fr", "und"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("HELLO   WORLD  ",), ("other",)],
        ["text"],
    )
    fps = [r[0] for r in df.select(tx.fingerprint_md5(F.col("text"))).collect()]
    assert fps[0] == fps[1] == fps[2] != fps[3]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d e f",), ("a b",)], ["text"])
    out = [r[0] for r in df.select(tx.shingles(F.col("text"), 5)).collect()]
    assert out[0] == ["a b c d e", "b c d e f"]
    assert out[1] == ["a b"]


def test_rolling_hashes_deterministic(spark):
    df = spark.createDataFrame([("alpha beta gamma delta epsilon zeta",)], ["text"])
    h1 = df.select(tx.rolling_hashes(F.col("text"))).collect()[0][0]
    h2 = df.select(tx.rolling_hashes(F.col("text"))).collect()[0][0]
    assert h1 == h2 and len(h1) == 2


def test_redact_pii_replaces_and_counts(spark):
    rows = [
        (1, "contact me at jane.doe+spam@example.org or visit https://ex.am/p?q=1 now"),
        (2, "call +1 (555) 123-4567 today"),
        (3, "nothing sensitive here"),
        (4, "two mails: a@b.io and c@d.co"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    counts = tx.redaction_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            tx.redact_pii(F.col("text")).alias("clean"),
            counts["url"].alias("u"),
            counts["email"].alias("e"),
            counts["phone"].alias("p"),
        ).collect()
    }
    assert out[1]["clean"] == "contact me at <EMAIL> or visit <URL> now"
    assert (out[1]["u"], out[1]["e"], out[1]["p"]) == (1, 1, 0)
    assert out[2]["clean"] == "call <PHONE> today"
    assert (out[2]["u"], out[2]["e"], out[2]["p"]) == (0, 0, 1)
    assert out[3]["clean"] == rows[2][1]
    assert out[4]["clean"] == "two mails: <EMAIL> and <EMAIL>"
    assert out[4]["e"] == 2


def test_redact_pii_matches_duckdb_on_pii_text(spark):
    """The redaction patterns must behave identically under Java regex
    (Spark) and RE2 (DuckDB) on text that actually contains PII shapes —
    the fixture corpus has none, so the oracle row only proves identity
    there; this proves the interesting case."""
    import duckdb

    texts = [
        "mail a.b-c_d%e@f-g.example.travel or http://x.y/z#frag and +44 20 7946 0958 ok",
        "edge http://a.b/?q=a@b.cd mixes url-with-email",
        "(555) 123-4567 and 555.123.4567 and 12345678",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r[0] for r in df.select(tx.redact_pii(F.col("text"))).collect()]
    con = duckdb.connect()
    for t, g in zip(texts, got):
        cur = t
        for _, pattern, token in tx.REDACTION_PATTERNS:
            cur = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [cur, pattern, token]
            ).fetchone()[0]
        assert g == cur, t


def test_compression_ratio_separates_repetitive_text(spark):
    from pyspark.sql import functions as F

    rows = [
        (1, "spam " * 200),                      # pathologically repetitive
        (2, "the quick brown fox jumps over the lazy dog and then "
            "discusses seventeen unrelated topics with varied vocabulary "
            "entropy calibration mechanisms during autumn festivals"),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["cr"]
        for r in df.select(
            "doc_id", tx.compression_ratio(F.col("text")).alias("cr")
        ).collect()
    }
    assert got[1] < 0.1          # boilerplate crushes
    assert got[2] > 0.5          # varied prose does not
    assert got[3] is None and got[4] is None
    # deterministic across runs
    again = {
        r["doc_id"]: r["cr"]
        for r in df.select(
            "doc_id", tx.compression_ratio(F.col("text")).alias("cr")
        ).collect()
    }
    assert got == again
