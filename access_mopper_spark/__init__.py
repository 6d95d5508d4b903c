"""access_mopper_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ACCESS-Hive/ACCESS-MOPPeR.

The reference (at /root/reference, cited throughout as ``file:line``) is a
single-node xarray/CMOR batch CMORisation tool.  This package re-expresses its
capability surface — catalog-driven variable mapping, a safe calculation DSL,
time resampling with exact bin-edge semantics, masked/weighted/windowed
aggregations, vertical interpolation, schema-inference catalog tooling, and a
metadata-enforcing partitioned sink — as idiomatic Spark DataFrame plans that
Catalyst can optimize, plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) the reference
lacks.

Design point: 1000-executor clusters over ~100 TB.  Every operator here is a
declarative DataFrame transformation (predicate pushdown / column pruning /
broadcast joins / AQE all apply); Python only runs inside Arrow-batched
pandas UDFs for genuinely non-relational kernels (e.g. per-column np.interp).
"""

__version__ = "0.1.0"

from access_mopper_spark.session import get_spark  # noqa: F401
