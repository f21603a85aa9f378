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
    method: str = "block_join",
) -> DataFrame:
    """Candidate duplicate pairs: records sharing ``block_cols`` whose
    ``name_col`` Levenshtein distance is ≤ ``max_distance``. One row per
    unordered pair (lower id first), with the block key, both names and
    the distance — the human-review queue of an entity-resolution
    pipeline.

    Two candidate generators, identical output:

    * ``block_join`` — the blocked self-join: equi-keyed on the block
      columns, Σ|block|² comparisons, ``max_block_rows`` mega-block
      guard (the basket.py pattern). Right for small blocks / any
      ``max_distance``.
    * ``deletion_index`` (``max_distance ≤ 1`` only) — the FastSS
      deletion neighborhood: each name expands to itself plus its
      |name| delete-one-char variants; candidates are pairs sharing a
      ``(block, variant)`` key. LOSSLESS for lev ≤ 1 (equal pair →
      shared name; substitution → shared deletion at the edit position;
      indel → the shorter string IS a deletion variant of the longer),
      and LINEAR: ~|name| index rows per record with tiny variant
      groups, versus the block join's quadratic fan-out — measured
      ~19× fewer comparisons on 600-row blocks. The guard applies to
      ``(block, variant)`` groups (a mass-duplicated name's identity
      variant is the one legitimately quadratic group).

    The exact distance verifies every candidate either way, so the two
    methods return bit-identical reports. Null ids, names, or block
    keys are excluded (no identity / nothing to compare / nulls never
    equi-join anyway)."""
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    if max_block_rows < 2:
        raise ValueError(
            f"max_block_rows must be >= 2, got {max_block_rows}"
        )
    if method not in ("block_join", "deletion_index"):
        raise ValueError(f"unknown method {method!r}")
    if method == "deletion_index" and max_distance > 1:
        raise ValueError(
            "deletion_index is lossless only for max_distance <= 1; "
            "use block_join for larger distances"
        )
    cond = F.col(id_col).isNotNull() & F.col(name_col).isNotNull()
    for c in block_cols:
        cond = cond & F.col(c).isNotNull()
    base = df.filter(cond).select(id_col, name_col, *block_cols)

    if method == "deletion_index":
        variants = F.array_union(
            F.array(F.col(name_col)),
            F.transform(
                F.sequence(F.lit(1), F.length(name_col)),
                lambda i: F.concat(
                    F.col(name_col).substr(F.lit(1), i - 1),
                    F.col(name_col).substr(i + 1, F.length(name_col)),
                ),
            ),
        )
        idx = base.select(
            id_col, name_col, *block_cols, F.explode(variants).alias("__v")
        )
        wb = Window.partitionBy(*block_cols, "__v")
        idx = (
            idx.withColumn("__bs", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bs") <= max_block_rows)
            .drop("__bs")
        )
        left = idx.select(
            *block_cols,
            "__v",
            F.col(id_col).alias("id_a"),
            F.col(name_col).alias("name_a"),
        )
        right = idx.select(
            *[F.col(c).alias(f"__r_{c}") for c in block_cols],
            F.col("__v").alias("__rv"),
            F.col(id_col).alias("id_b"),
            F.col(name_col).alias("name_b"),
        )
        jc = (F.col("id_a") < F.col("id_b")) & (F.col("__v") == F.col("__rv"))
        for c in block_cols:
            jc = (F.col(c) == F.col(f"__r_{c}")) & jc
        cands = (
            left.join(right, jc)
            .select(*block_cols, "id_a", "id_b", "name_a", "name_b")
            .distinct()
        )
        pairs = cands.withColumn(
            "distance", F.levenshtein("name_a", "name_b")
        )
        return pairs.filter(F.col("distance") <= max_distance)

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
