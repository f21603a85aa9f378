"""Logical-plan builders: query normalization, predicate compilation, explode planning."""
