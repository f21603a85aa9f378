"""Deterministic global shuffle + token-budget sequence packing.

Training-data pipelines need two "global order" operations the reference
engine (a catalog query engine — no analogue; extension per SURVEY §2.9)
never needed:

* **global shuffle** — a reproducible random-but-fixed ordering of the
  corpus (the order documents are fed to the trainer). ``df.orderBy(rand())``
  is partition- and seed-layout-dependent; ordering by an md5 hash of the
  row key is a pure row function — the SAME order on any engine, any
  partitioning, any run (same trick as ``operators.sampling.hash_bucket``).
* **sequence packing** — concatenate documents (in that shuffled order)
  into fixed token-budget training sequences. Each document is assigned
  the bin containing its FIRST token: ``bin = floor(exclusive_prefix_sum
  (tokens) / budget)``.

The hard part at 100 TB is the **global prefix sum**: a single
``Window.orderBy(...)`` over an unpartitioned window collapses to one
task holding the whole corpus. This module computes it with the classic
two-phase plan instead:

1. every row gets a deterministic *range bucket* = the top bits of its
   60-bit shuffle hash (uniform, so buckets are balanced — no sampling
   pass, no nondeterministic ``repartitionByRange`` boundaries);
2. a running sum WITHIN each bucket (window partitioned by bucket —
   parallel, one shuffle);
3. per-bucket totals (``n_buckets`` rows — bounded, default 1024) are
   cumulated by a window over that TINY aggregate (its single-partition
   exchange holds ≤ n_buckets rows, never corpus data) and
   broadcast-joined back as offsets — all in ONE lazy plan, no driver
   collect, no extra blocking job.

Total cost: one shuffle keyed by the bucket + one broadcast join of a
``n_buckets``-row table. No stage ever sees more than ~1/n_buckets of
the corpus in one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_BUCKETS = 1024
"""Range-bucket fan-out for the distributed prefix sum. 1024 buckets keep
the driver-side offset table trivially small while bounding any single
window task to ~0.1% of the corpus."""

_HASH_SPACE = 1 << 60


def shuffle_key(key: Column, salt: str = "") -> Column:
    """60-bit deterministic shuffle position: ``md5(salt | key)`` as a
    bigint, via ``functions.text.salted_hash60`` (the one definition of
    the salted-md5 construction — same family as sampling buckets).
    Ties are impossible for distinct keys only modulo hash collisions, so
    callers ALWAYS order by ``(shuffle_key, key)`` — a total order."""
    from intake_esm_spark.functions.text import salted_hash60

    return salted_hash60(key, salt)


def _bucket(skey: Column, n_buckets: int) -> Column:
    # Top bits of the uniform hash: value-derived range partitioning —
    # deterministic (unlike repartitionByRange's sampled boundaries) and
    # order-preserving (bucket asc, then skey asc == global skey asc).
    return F.floor(skey / F.lit(_HASH_SPACE // n_buckets)).cast("int")


def global_order_index(
    df: DataFrame,
    key_col: str,
    salt: str = "",
    n_buckets: int = DEFAULT_BUCKETS,
    out_col: str = "position",
    keep_order_key: bool = False,
) -> DataFrame:
    """Attach a 0-based global position in the deterministic shuffle
    order — ``row_number() over (order by shuffle_key, key)`` computed
    without a single-task global window (see module docstring).

    With ``keep_order_key=True`` the 60-bit ``__skey`` order hash is
    retained in the output; by default only ``out_col`` is added.

    **Precondition:** ``key_col`` values are unique (they break hash
    ties; duplicates would make positions partition-dependent)."""
    out = _prefix_sum(df, key_col, F.lit(1).cast("bigint"), salt, n_buckets, out_col)
    # inclusive sum of ones -> 1-based rank; shift to a 0-based index
    out = out.withColumn(out_col, F.col(out_col) - 1)
    return out if keep_order_key else out.drop("__skey")


def pack_token_bins(
    df: DataFrame,
    token_col: str | Column,
    budget: int,
    key_col: str,
    salt: str = "",
    n_buckets: int = DEFAULT_BUCKETS,
    keep_order_key: bool = False,
) -> DataFrame:
    """Greedy contiguous sequence packing: documents are laid end-to-end
    in deterministic shuffle order and cut into ``budget``-token bins.
    Adds ``token_offset`` (exclusive prefix sum — the global token index
    where this document starts) and ``bin_id = floor(token_offset /
    budget)`` (the training sequence containing the document's first
    token; a document longer than the remaining bin space spills into the
    next bin, as trainers concatenate-and-split).

    Semantics are a pure function of (key set, token counts, salt,
    budget) — re-running on a repartitioned or re-ingested corpus packs
    identically, which is what makes training-order reproducible.

    With ``keep_order_key=True`` the 60-bit ``__skey`` order hash is
    retained (e.g. to sort documents within a bin); by default only
    ``token_offset`` and ``bin_id`` are added."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    out = _prefix_sum(df, key_col, tok.cast("bigint"), salt, n_buckets, "__incl")
    out = (
        out.withColumn(
            "token_offset", F.col("__incl") - tok.cast("bigint")
        )
        .withColumn("bin_id", F.floor(F.col("token_offset") / budget).cast("bigint"))
        .drop("__incl")
    )
    return out if keep_order_key else out.drop("__skey")


def _prefix_sum(
    df: DataFrame,
    key_col: str,
    value: Column,
    salt: str,
    n_buckets: int,
    out_col: str,
) -> DataFrame:
    """INCLUSIVE prefix sum of ``value`` over the global order
    ``(shuffle_key(key), key)``, as ``out_col``; also leaves a
    ``__skey`` column for callers that want the order itself.

    Two-phase, one lazy plan: per-bucket window running sums in parallel;
    bucket offsets = an EXCLUSIVE running sum over the per-bucket totals,
    computed by a global-order window over that ≤ ``n_buckets``-row
    aggregate (its single-partition exchange holds bucket totals, never
    corpus rows) and broadcast-joined back. No driver collect — the
    operator composes lazily like any other DataFrame transform.
    ``global_order_index`` passes value=1, turning the prefix sum into a
    1-based rank it then shifts to a 0-based index."""
    skey = shuffle_key(F.col(key_col), salt)
    with_key = df.withColumn("__skey", skey).withColumn(
        "__bucket", _bucket(F.col("__skey"), n_buckets)
    )
    w = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("__skey").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_key.withColumn("__run", F.sum(value).over(w))
    w_off = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        with_key.groupBy("__bucket")
        .agg(F.sum(value).alias("__tot"))
        .withColumn(
            "__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).cast("bigint")
        )
        .select("__bucket", "__off")
    )
    joined = local.join(F.broadcast(offsets), "__bucket", "left")
    result = joined.withColumn(out_col, F.col("__run") + F.col("__off"))
    return result.drop("__bucket", "__run", "__off")


def write_packed_corpus(
    df: DataFrame,
    path: str,
    token_col: str | Column,
    budget: int,
    key_col: str,
    salt: str = "",
    bins_per_shard: int = 1024,
    files_per_shard: int = 1,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Materialize the training corpus: :func:`pack_token_bins` composed
    with a shard-partitioned parquet write — the endpoint a trainer's
    data loader consumes. ``shard = bin_id // bins_per_shard`` groups
    ``bins_per_shard`` consecutive training sequences per directory, so a
    loader streams shard directories in numeric order and reconstructs
    the exact global order from ``(bin_id, token_offset)`` within each —
    no global sort at read time, and resuming from step N means opening
    shard ``N * budget_tokens_per_shard``'s directory, not scanning the
    corpus.

    Write shape mirrors ``write_ivf_index``: an explicit repartition on
    (shard, key-hash-salt) bounds output to ``files_per_shard`` files per
    shard with that many parallel writers — without it every input
    partition would emit a file into every shard directory
    (input_partitions x shards small files, the classic shuffle-write
    explosion). Everything upstream is the two-phase prefix sum — no
    single-task stage anywhere. Determinism: a pure function of
    (key set, token counts, salt, budget), like the packing itself."""
    if bins_per_shard <= 0:
        raise ValueError(f"bins_per_shard must be positive, got {bins_per_shard}")
    if files_per_shard <= 0:
        # pmod(x, 0) is NULL, which would silently degenerate the
        # repartition instead of failing fast like the sibling guards
        raise ValueError(f"files_per_shard must be positive, got {files_per_shard}")
    packed = pack_token_bins(df, token_col, budget, key_col, salt, n_buckets)
    out = packed.withColumn(
        "shard", F.floor(F.col("bin_id") / bins_per_shard).cast("bigint")
    )
    out = out.repartition(
        F.col("shard"),
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(files_per_shard)),
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(path)
