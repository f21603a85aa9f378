"""Dedup-operator tests: exact, MinHash-LSH, SimHash, n-gram Jaccard."""

import pytest
from pyspark.sql import functions as F

from intake_esm_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
        (3, "The  Quick Brown Fox jumps over the lazy dog near the river bank today "),  # normalized dup of 1
        (4, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup (1 word)
        (5, "completely different text about spark catalyst optimizer and shuffle plans"),
        (6, "another unrelated document describing minhash banding and jaccard similarity"),
    ]
    return spark.createDataFrame(base, ["doc_id", "text"])


def test_exact_duplicates(docs):
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["canonical_id"] == 1
    assert g["member_ids"] == [1, 2, 3]


def test_dedup_exact_survivors(docs):
    kept = dedup.dedup_exact(docs)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 4, 5, 6]


def test_minhash_candidates(docs):
    pairs = dedup.minhash_lsh_candidates(
        docs, num_hashes=32, bands=16, shingle_n=3
    ).collect()
    pairset = {(r["id_a"], r["id_b"]) for r in pairs}
    # exact dups always collide in every band
    assert (1, 2) in pairset and (1, 3) in pairset and (2, 3) in pairset
    # near-dup (1,4) shares most shingles - with 16 bands of 2 it should collide
    assert (1, 4) in pairset
    # unrelated docs must not pair
    assert (5, 6) not in pairset


def test_jaccard_pairs(docs):
    out = dedup.jaccard_pairs(docs, shingle_n=3, threshold=0.5)
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert rows[(1, 2)] == 1.0
    assert rows[(1, 3)] == 1.0
    assert 0.5 <= rows[(1, 4)] < 1.0
    assert (5, 6) not in rows


def test_jaccard_with_candidates(docs):
    cands = dedup.minhash_lsh_candidates(docs, num_hashes=32, bands=16, shingle_n=3)
    out = dedup.jaccard_pairs(docs, shingle_n=3, threshold=0.5, candidates=cands)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in pairs and (1, 3) in pairs


def test_simhash_candidates(docs):
    pairs = dedup.simhash_candidates(docs, shingle_n=3, max_hamming=6)
    pairset = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in pairset and (1, 3) in pairset
    assert (5, 6) not in pairset


def test_real_documents_have_dups(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    kept = dedup.dedup_exact(docs).count()
    assert 0 < kept <= n
