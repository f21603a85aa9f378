"""Minimal-explosion planner for multi-list-column frames.

Reference: ``MinimalExploder`` (/root/reference/intake_esm/utils.py:187-268,
tests tests/test_utils.py:135-259): list columns whose row-wise lengths are
identical on EVERY row can be exploded together (zip-explode, one pass);
columns with different patterns explode separately (Cartesian semantics,
matching repeated polars ``explode`` calls).

Scale redesign: the reference collects every row's lengths to the driver to
build the patterns. Here the grouping decision needs only pairwise
"always-same-length" booleans, which is ONE aggregation returning
k*(k-1)/2 counters (k = number of list columns — catalog-scale small), and
the explosion itself is ``explode_outer(arrays_zip(*group))`` per group —
all distributed, nothing row-wise on the driver.

``explode_outer`` (not ``explode``) keeps rows whose arrays are empty/null
as null rows, matching polars' explode semantics.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class MinimalExploder:
    """Analyze and minimally explode a DataFrame with multiple list columns."""

    def __init__(self, df: DataFrame) -> None:
        self.df = df
        self._groups: list[list[str]] | None = None

    @property
    def list_columns(self) -> list[str]:
        return [
            f.name for f in self.df.schema.fields if isinstance(f.dataType, T.ArrayType)
        ]

    @property
    def explodable_groups(self) -> list[list[str]]:
        """Columns grouped by identical row-wise length patterns."""
        if self._groups is None:
            self._groups = self._compute_groups()
        return self._groups

    def _compute_groups(self) -> list[list[str]]:
        cols = self.list_columns
        if len(cols) <= 1:
            return [[c] for c in cols]
        pairs = list(combinations(cols, 2))
        # one aggregation: for each pair, do any rows have differing lengths?
        aggs = [
            F.sum(
                F.when(
                    F.coalesce(F.size(F.col(a)), F.lit(-1))
                    != F.coalesce(F.size(F.col(b)), F.lit(-1)),
                    1,
                ).otherwise(0)
            ).alias(f"__{i}")
            for i, (a, b) in enumerate(pairs)
        ]
        row = self.df.agg(*aggs).collect()[0]
        same = {
            (a, b)
            for i, (a, b) in enumerate(pairs)
            if (row[f"__{i}"] or 0) == 0
        }
        # group each column with the first group whose representative shares
        # its length pattern (column order preserved, like the reference)
        groups: list[list[str]] = []
        for c in cols:
            placed = False
            for g in groups:
                rep = g[0]
                if (rep, c) in same or (c, rep) in same:
                    g.append(c)
                    placed = True
                    break
            if not placed:
                groups.append([c])
        return groups

    @property
    def summary(self) -> dict:
        return {
            "total_columns": len(self.df.columns),
            "list_columns": len(self.list_columns),
            "unique_patterns": len(self.explodable_groups),
            "explodable_groups": len(self.explodable_groups),
            "explosion_operations_needed": len(self.explodable_groups),
            "groups": self.explodable_groups,
        }

    def __call__(self) -> DataFrame:
        """Perform the minimal explosion: zip-explode each group in turn
        (sequential explodes across groups = Cartesian product, exactly the
        reference's repeated ``explode(*group)``)."""
        out = self.df
        for group in self.explodable_groups:
            if len(group) == 1:
                out = out.withColumn(group[0], F.explode_outer(F.col(group[0])))
            else:
                zipped = F.explode_outer(F.arrays_zip(*[F.col(c) for c in group]))
                out = out.withColumn("__zip", zipped)
                for c in group:
                    out = out.withColumn(c, F.col("__zip").getField(c))
                out = out.drop("__zip")
        return out
