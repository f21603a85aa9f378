"""Document chunking (operators/chunking.py)."""

import pytest

from intake_esm_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", "a" * 10),          # 10 chars, size 6 overlap 2 -> starts 0,4,8
        ("d2", "xy"),              # shorter than one chunk
        ("d3", ""),                # empty -> no chunks
        ("d4", None),              # null -> no chunks
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_chunk_boundaries_and_overlap(docs):
    out = chunk_documents(docs, chunk_size=6, overlap=2)
    rows = {(r["doc_id"], r["chunk_id"]): r.asDict() for r in out.collect()}
    # start 8 is NOT emitted: its chunk ("aa") would sit wholly inside
    # chunk@4's coverage (the no-contained-chunk rule)
    assert {(d, c) for d, c in rows} == {("d1", 0), ("d1", 1), ("d2", 0)}
    assert rows[("d1", 0)]["chunk_text"] == "aaaaaa"
    assert rows[("d1", 0)]["char_start"] == 0
    assert rows[("d1", 1)]["char_start"] == 4
    assert rows[("d1", 1)]["chunk_text"] == "aaaaaa"  # covers through the end
    assert rows[("d2", 0)]["chunk_text"] == "xy"


def test_no_chunk_contained_in_predecessor(spark):
    """Every chunk must extend past the previous chunk's end."""
    texts = [("t%d" % n, "x" * n) for n in (1, 99, 100, 101, 499, 500, 501, 1201)]
    df = spark.createDataFrame(texts, "doc_id string, text string")
    out = chunk_documents(df, chunk_size=500, overlap=100).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        prev_end = -1
        for r in rows:
            end = r["char_start"] + len(r["chunk_text"])
            assert end > prev_end, (doc_id, r["char_start"])
            prev_end = end
        # full coverage: last chunk reaches the end of the text
        assert prev_end == len(dict(texts)[doc_id])


def test_chunks_reassemble_document(spark):
    text = "".join(chr(97 + i % 26) for i in range(1234))
    df = spark.createDataFrame([("d", text)], "doc_id string, text string")
    out = sorted(
        chunk_documents(df, chunk_size=100, overlap=0).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert "".join(r["chunk_text"] for r in out) == text
    # with overlap, stripping the overlap prefix of every later chunk
    # also reassembles the document
    ov = sorted(
        chunk_documents(df, chunk_size=100, overlap=30).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert ov[0]["chunk_text"] + "".join(r["chunk_text"][30:] for r in ov[1:]) == text


def test_chunk_validation(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=10, overlap=10)
