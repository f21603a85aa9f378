"""Distributed dense-vector matrix analytics: exact covariance /
correlation of an embedding column.

Extension (SURVEY §2.9): the dimension-level view of the embedding
table the similarity stack (``simsearch.py``) treats as opaque — which
dimensions are dead (zero variance), which pairs are redundant
(|corr| ≈ 1, the "this projection wastes index budget" signal for the
IVF/PQ builders), and the raw covariance PCA/whitening would start
from.

Scale shape — the part that matters at 100 TB: the naive construction
(posexplode + self-join on the row id) inflates the corpus ``d``-fold
on BOTH join sides and shuffles it; here the ``d(d+1)/2`` upper-triangle
products are generated IN-ROW by a JVM-side higher-order function
(``sequence``/``transform``/``flatten`` — whole-stage-codegen, no
Python), so the only exchange is the partial-aggregated groupBy to the
``(i, j)`` grain: map-side combine reduces every task's output to
≤ d(d+1)/2 rows before the shuffle, making the exchange
dimension²-sized, never data-sized. First moments take the same
in-row explode at the ``i`` grain. The moment frames (d and d(d+1)/2
rows) broadcast back for the final closed-form covariance.

Determinism: components quantize to 6dp doubles, every product to 12dp
DECIMAL(28,12) before the cross-row sum (order-independent — the
chi-square cell rule), first moments to 6dp DECIMAL(18,6); covariance
and correlation are fixed IEEE expressions over those exact sums, so
the DuckDB oracle (a plain unnest + self-join replay — the oracle need
not be scale-shaped) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    include_corr: bool = True,
) -> DataFrame:
    """Exact sample covariance (and Pearson correlation) between every
    ordered pair of vector dimensions ``i ≤ j``: ``cov_ij =
    (Σ v_i·v_j − S_i·S_j/N) / (N − 1)``, ``corr_ij =
    cov_ij / √(cov_ii·cov_jj)``.

    All vectors must share one dimensionality (the embedding-table
    contract the simsearch operators already rely on); null vectors
    are excluded. Returns ``d(d+1)/2`` rows ``(i, j, n_vecs, cov[,
    corr])``, 0-based dims; ``corr`` is null when either diagonal
    degenerates. Requires N ≥ 2."""
    base = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(vec_col).alias("__vec")
    )
    # 6dp-quantized components, computed once per row
    q = base.select(
        F.expr(
            "transform(__vec, x -> round(CAST(x AS DOUBLE), 6))"
        ).alias("__q")
    )
    # in-row upper-triangle pair products: d(d+1)/2 structs per row,
    # all inside whole-stage codegen — no join, no Python
    pairs = q.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, size(__q) - 1), i ->"
                " transform(sequence(i, size(__q) - 1), j ->"
                " struct(i AS i, j AS j,"
                " CAST(round(element_at(__q, i + 1)"
                " * element_at(__q, j + 1), 12) AS DECIMAL(28,12))"
                " AS p))))"
            )
        ).alias("__e")
    ).select("__e.i", "__e.j", "__e.p")
    s2 = pairs.groupBy("i", "j").agg(
        F.sum("p").alias("__s2"),
        F.count(F.lit(1)).alias("__n"),
    )
    moms = (
        q.select(
            F.posexplode("__q").alias("i", "__v")
        )
        .groupBy("i")
        .agg(
            F.sum(F.col("__v").cast("decimal(18,6)")).alias("__s1")
        )
    )
    m_i = moms.select(
        F.col("i").alias("__mi"), F.col("__s1").alias("__s1i")
    )
    m_j = moms.select(
        F.col("i").alias("__mj"), F.col("__s1").alias("__s1j")
    )
    joined = s2.join(
        F.broadcast(m_i), F.col("i") == F.col("__mi")
    ).join(F.broadcast(m_j), F.col("j") == F.col("__mj"))
    nd = F.col("__n").cast("double")
    cov = (
        F.col("__s2").cast("double")
        - F.col("__s1i").cast("double")
        * F.col("__s1j").cast("double")
        / nd
    ) / (nd - F.lit(1.0))
    out = joined.filter(F.col("__n") >= 2).select(
        "i",
        "j",
        F.col("__n").alias("n_vecs"),
        F.round(cov, 6).alias("cov"),
    )
    if not include_corr:
        return out
    diag = out.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("__di"), F.col("cov").alias("__var")
    )
    d_i = diag.select(
        F.col("__di").alias("__ci"), F.col("__var").alias("__vi")
    )
    d_j = diag.select(
        F.col("__di").alias("__cj"), F.col("__var").alias("__vj")
    )
    withd = out.join(
        F.broadcast(d_i), F.col("i") == F.col("__ci")
    ).join(F.broadcast(d_j), F.col("j") == F.col("__cj"))
    corr = F.when(
        (F.col("__vi") > 0) & (F.col("__vj") > 0),
        F.col("cov") / F.sqrt(F.col("__vi") * F.col("__vj")),
    )
    return withd.select(
        "i", "j", "n_vecs", "cov", F.round(corr, 6).alias("corr")
    )
