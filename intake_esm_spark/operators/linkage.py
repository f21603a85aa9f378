"""Entity resolution: blocked pairwise record linkage.

Extension (SURVEY §2.9): "are these two records the same real-world
entity" — duplicate account detection, customer-master dedup. The exact
all-pairs comparison is n² and never runs at scale; the standard answer
(Fellegi-Sunter blocking) compares only WITHIN blocks sharing a cheap
key (here: caller-chosen block columns, e.g. nation + name prefix), so
the join output is Σ|block|² — bounded by the block-size distribution
exactly like basket.py's Σ|b|² pair join, with the same kind of guard.

The comparator is Levenshtein edit distance — an integer, computed by
both engines identically (no float drift), which keeps the whole report
oracle-exact. Compose with functions/text.py normalizers upstream for
case/whitespace-insensitive matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def candidate_matches(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    max_distance: int = 2,
    max_block_rows: int = 10000,
) -> DataFrame:
    """Candidate duplicate pairs: records sharing ``block_cols`` whose
    ``name_col`` Levenshtein distance is ≤ ``max_distance``. One row per
    unordered pair (lower id first), with the block key, both names and
    the distance — the human-review queue of an entity-resolution
    pipeline.

    Scale: the self-join is equi-keyed on the block columns (hash
    partition, then the ``id <`` and distance filters evaluate in-row),
    output Σ|block|² — blocks beyond ``max_block_rows`` are dropped up
    front by a count window on the SAME keyed exchange the join needs
    (the basket.py mega-basket pattern; an unblocked name column would
    otherwise quadratically explode on one hot block). Null ids, names,
    or block keys are excluded (no identity / nothing to compare /
    nulls never equi-join anyway)."""
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    if max_block_rows < 2:
        raise ValueError(
            f"max_block_rows must be >= 2, got {max_block_rows}"
        )
    cond = F.col(id_col).isNotNull() & F.col(name_col).isNotNull()
    for c in block_cols:
        cond = cond & F.col(c).isNotNull()
    base = df.filter(cond).select(id_col, name_col, *block_cols)
    wb = Window.partitionBy(*block_cols)
    blocked = (
        base.withColumn("__bs", F.count(F.lit(1)).over(wb))
        .filter(F.col("__bs") <= max_block_rows)
        .drop("__bs")
    )
    left = blocked.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
    )
    right = blocked.select(
        *[F.col(c).alias(f"__r_{c}") for c in block_cols],
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
    )
    jc = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        jc = (F.col(c) == F.col(f"__r_{c}")) & jc
    pairs = left.join(right, jc).withColumn(
        "distance", F.levenshtein("name_a", "name_b")
    )
    return pairs.filter(F.col("distance") <= max_distance).select(
        *block_cols, "id_a", "id_b", "name_a", "name_b", "distance"
    )
