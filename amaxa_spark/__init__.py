"""amaxa_spark — a PySpark-native multi-object ETL / graph-slice engine.

Brand-new engine with the query and data-processing capabilities of
davidmreed/amaxa (reference surveyed in SURVEY.md), re-expressed as
idiomatic Spark DataFrame operations:

- every per-table record stream is a DataFrame,
- every lookup ("foreign key") pass is a semi/anti/left join,
- the self-lookup recursion is an iterate-to-fixpoint driver loop,
- the load-time ID map is a join (broadcast under a counted size
  gate, shuffle hash-join above it),
- Catalyst/AQE supply pushdown, pruning and join planning.

Beyond reference parity, the package ships large-scale training-data
pipeline operators: deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard), similarity search over embeddings, text analysis, and
multimodal-column plumbing.
"""

__version__ = "0.1.0"

from amaxa_spark.session import get_spark  # noqa: F401
