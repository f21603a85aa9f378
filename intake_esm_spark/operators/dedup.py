"""Deduplication operators for training-data pipelines.

Four tiers, all expressed as DataFrame plans (no driver-side loops):

* **exact** — hash-groupBy on a normalized-text fingerprint. One shuffle on
  the 16-byte hash; the canonical survivor is min(id) per group.
* **MinHash + LSH** — shingle -> per-permutation min of seeded xxhash64 ->
  band hashes -> explode bands -> self-join on (band_idx, band_hash).
  The join is on short band-hash keys, so candidate generation scales as
  the number of *colliding* pairs, never the full n² — the standard
  Broder MinHash / banding construction (Mining of Massive Datasets ch.3).
* **SimHash** — 64-bit sign-sketch of shingle hashes; near-dups are pairs
  within Hamming distance k, found by band-exact-match on 4 x 16-bit chunks
  (Charikar'02 / Manku et al. WWW'07 chunking trick).
* **exact n-gram Jaccard** — the verification stage for LSH candidates (or
  a standalone exact pass at small scale): explode shingles, equi-join on
  shingle, count intersections, Jaccard = |∩| / (|A|+|B|-|∩|).

Skew note: a degenerate band hash (e.g. many near-empty docs) would hot-spot
the self-join; AQE skew-join handles it at runtime, and the shingle stage
already collapses whitespace-only docs to one shingle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from intake_esm_spark.functions.text import fingerprint_md5, shingles


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of exact duplicates (normalized): one row per duplicated
    fingerprint with the member ids and the canonical (min) id."""
    return (
        df.select(F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("canonical_id"),
            F.sort_array(F.collect_list(id_col)).alias("member_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per distinct normalized text — the min-id survivor.

    Implemented as groupBy(fingerprint) -> min(id) -> semi-join, which
    shuffles only (hash, id) pairs, never the document bodies."""
    survivors = (
        df.select(F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(survivors, on=id_col, how="left_semi")


def minhash_signature(
    text_col: str, num_hashes: int = 32, shingle_n: int = 5
) -> F.Column:
    """array<bigint> MinHash signature: for permutation i, the min over
    shingles of xxhash64(i, shingle). Seeded by position — deterministic
    across runs and engines."""
    sh = F.transform(shingles(F.col(text_col), shingle_n), lambda s: F.xxhash64(s))

    def _seeded_hash(seed: int):
        return lambda h: F.xxhash64(F.lit(seed), h)

    sigs = [
        F.array_min(F.transform(sh, _seeded_hash(i))) for i in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) that collide in >=1 LSH
    band. rows/bands: signature split into ``bands`` bands of
    ``num_hashes/bands`` rows; a pair is a candidate iff some band's hash
    matches exactly."""
    assert num_hashes % bands == 0, "num_hashes must be divisible by bands"
    rows_per_band = num_hashes // bands
    # Explode shingles ONCE, then take per-permutation mins as ordinary
    # aggregates — map-side partial min means the shuffle carries only
    # (id, num_hashes longs) per document, and the shingle/normalization
    # expression tree is evaluated once per shingle instead of once per
    # permutation (the naive expression form was ~100x slower at sf0.1).
    sh_rows = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("__shingle"),
    ).withColumn("__sh_hash", F.xxhash64(F.col("__shingle"))).drop("__shingle")
    sig = sh_rows.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("__sh_hash"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select(id_col, F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return pairs


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for document pairs.

    Without ``candidates`` this is the all-pairs-with-shared-shingle plan
    (exact, for verification / small scale); with ``candidates`` (from LSH)
    the equi-join is semi-joined down to the candidate set first — the
    production path at 100 TB.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    exploded = sh.select("id", F.explode("sh").alias("shingle"))
    if candidates is not None:
        cand_ids = (
            candidates.select(F.col("id_a").alias("id"))
            .unionByName(candidates.select(F.col("id_b").alias("id")))
            .distinct()
        )
        exploded = exploded.join(cand_ids, on="id", how="left_semi")
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, on=["id_a", "id_b"], how="left_semi")
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def simhash(text_col: str, shingle_n: int = 5, bits: int = 64) -> F.Column:
    """64-bit SimHash of the shingle set: per bit, sum +1/-1 over shingle
    hashes' bit values; sketch bit = sign. Built-in-only bit fiddling."""
    sh = F.array_distinct(shingles(F.col(text_col), shingle_n))
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    def _bit_voter(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_cols = []
    for b in range(bits):
        vote = F.aggregate(hashes, F.lit(0), _bit_voter(b))
        bit = F.when(vote > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bit_cols.append(F.shiftleft(bit, b))
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out.bitwiseOR(c)
    return out


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 4 x 16-bit chunks (a pair within
    Hamming distance 3 must agree on at least one chunk), then filter by
    exact Hamming distance via bit_count(xor)."""
    sig = df.select(
        F.col(id_col).alias("id"), simhash(text_col, shingle_n).alias("sh64")
    )
    chunks = sig.select(
        "id",
        "sh64",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("sh64"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cv"),
    ).select("id", "sh64", F.col("cv.chunk").alias("chunk"), F.col("cv.chunk_val").alias("chunk_val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh64").bitwiseXOR(F.col("b.sh64"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs
