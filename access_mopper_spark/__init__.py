"""access_mopper_spark — PySpark-native analytics engine with the query
and data-processing capabilities of ACCESS-Hive/ACCESS-MOPPeR, plus
training-data pipeline operators, designed for 100 TB scale.

Public surface:

- :func:`access_mopper_spark.session.get_spark` — tuned SparkSession.
- :mod:`access_mopper_spark.plans.pipeline` — catalog-driven lifecycle
  (``MappingRow``, ``execute_mapping``, ``run_pipeline``).
- :mod:`access_mopper_spark.functions.calc_dsl` — safe calc-string
  compiler (``compile_calc``); :mod:`...functions.macros` — domain
  function registry.
- :mod:`access_mopper_spark.operators` — resample, interp, asof,
  aggregates, bounds, dedup, similarity, multimodal, skew.
- :mod:`access_mopper_spark.queries` — the oracle-checked query registry
  driving ``__spark_entry__``.
"""

from access_mopper_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
__all__ = ["get_spark", "__version__"]
