"""Document chunking — fixed-size overlapping passages.

Extension (SURVEY §2.9): the passage-preparation primitive ahead of any
embedding or retrieval stage (RAG indexing, long-document windowing for
encoder models): split each document into ``chunk_size``-character
passages whose starts advance by ``chunk_size - overlap``.

100 TB shape: a pure in-row construction — ``sequence`` of start
offsets, ``posexplode``, ``substring`` — ZERO shuffle; the output is a
projection-and-generate over the scan, so it composes with any
downstream plan (the embedding UDF, the packer) without a repartition.
``chunk_id = start // step`` is derived arithmetic, not an ordinality,
so it is partition- and engine-independent by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 500,
    overlap: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per passage: ``(id, chunk_id, char_start, chunk_text)``.

    Starts are ``0, step, 2*step, ...`` for ``step = chunk_size -
    overlap``, emitted while ``start + overlap < length`` (start 0
    always) — the bound guarantees every chunk after the first carries
    at least one character BEYOND the previous chunk's overlap region,
    so no chunk is wholly contained in its predecessor (a tail shorter
    than ``overlap`` would otherwise ship a pure-duplicate passage to
    the embedding stage). The final chunk may be shorter than
    ``chunk_size`` (never empty). Null or empty documents produce no
    rows (explode of an empty sequence).
    """
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    if not 0 <= overlap < chunk_size:
        raise ValueError(
            f"overlap must be in [0, chunk_size), got {overlap} for size {chunk_size}"
        )
    step = chunk_size - overlap
    n = F.length(text_col)
    # last valid start: the largest s with s + overlap < n, i.e.
    # s <= n - overlap - 1 (clamped to 0 so short docs keep start 0)
    starts = F.when(
        n > 0,
        F.sequence(F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(step)),
    ).otherwise(F.array())
    out = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.explode(starts).alias("char_start"),
    )
    return out.select(
        id_col,
        (F.col("char_start") / step).cast("int").alias("chunk_id"),
        "char_start",
        F.substring(
            F.col(text_col), F.col("char_start") + 1, F.lit(chunk_size)
        ).alias("chunk_text"),
    )
