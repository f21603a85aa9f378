"""Engine operators: relational division, grouping, combine, dedup, similarity, asof."""
