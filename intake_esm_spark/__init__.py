"""intake_esm_spark — a PySpark-native catalog/query engine.

A brand-new engine with the query and data-processing capabilities of
intake/intake-esm (reference: /root/reference), re-expressed Spark-first:

* catalog-as-DataFrame (lazy Catalyst plan instead of pandas/polars frames)
* search semantics (equality / IN-list / regex / null / iterable-membership)
  compiled to Catalyst expressions
* ``require_all_on`` relational division as explode -> collect_set ->
  subset-check semi-join
* group/aggregate dataset assembly over long-format asset tables
* derived-variable registry applied as column expressions
* LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash /
  transitive connected-components clustering), similarity search
  (brute-force, blocked-GEMM, IVF index), deterministic hash sampling,
  text analysis + corpus statistics, multimodal plumbing, streaming
  windows.

Everything is a DataFrame transformation — no collect() in the hot path, so
plans scale from local[32] to a multi-thousand-executor cluster unchanged.
"""

from intake_esm_spark.datastore import ESMDataStore, open_esm_datastore
from intake_esm_spark.derived import DerivedVariable, DerivedVariableRegistry
from intake_esm_spark.session import get_spark
from intake_esm_spark.sources.descriptor import (
    Aggregation,
    AggregationControl,
    Assets,
    ESMCatalogDescriptor,
)

__version__ = "0.1.0"

__all__ = [
    "Aggregation",
    "AggregationControl",
    "Assets",
    "DerivedVariable",
    "DerivedVariableRegistry",
    "ESMCatalogDescriptor",
    "ESMDataStore",
    "get_spark",
    "open_esm_datastore",
]
