"""Driver-facing query registry, split into family modules (r9).

Import side effects matter: each family module registers its
@query entries into queries._core.QUERIES/ORACLES at import, in the
original monolithic order, and queries._casts applies the oracle
output-type canonicalization LAST.  The public surface is unchanged:
from access_mopper_spark.queries import QUERIES, ORACLES.
"""

from access_mopper_spark.queries._core import *  # noqa: F401,F403
from access_mopper_spark.queries._core import __all__ as _core_all

from access_mopper_spark.queries import core_relational as _core_relational  # noqa: F401
from access_mopper_spark.queries import curation_dedup as _curation_dedup  # noqa: F401
from access_mopper_spark.queries import interp_domain as _interp_domain  # noqa: F401
from access_mopper_spark.queries import multimodal_streaming as _multimodal_streaming  # noqa: F401
from access_mopper_spark.queries import composites2 as _composites2  # noqa: F401
from access_mopper_spark.queries import pipeline_calendars as _pipeline_calendars  # noqa: F401
from access_mopper_spark.queries import legacy_netcdf as _legacy_netcdf  # noqa: F401
from access_mopper_spark.queries import clusters_search as _clusters_search  # noqa: F401
from access_mopper_spark.queries import corpus_events as _corpus_events  # noqa: F401
from access_mopper_spark.queries import tokenizer_round4 as _tokenizer_round4  # noqa: F401
from access_mopper_spark.queries import catalog_analytics as _catalog_analytics  # noqa: F401
from access_mopper_spark.queries import tpch as _tpch  # noqa: F401
from access_mopper_spark.queries import round5_training as _round5_training  # noqa: F401
from access_mopper_spark.queries import round6_ml_stats as _round6_ml_stats  # noqa: F401
from access_mopper_spark.queries import round7_round8 as _round7_round8  # noqa: F401
from access_mopper_spark.queries import round9_eval as _round9_eval  # noqa: F401
from access_mopper_spark.queries import round10_ops as _round10_ops  # noqa: F401
from access_mopper_spark.queries import round11_ops as _round11_ops  # noqa: F401
from access_mopper_spark.queries import round12_ops as _round12_ops  # noqa: F401
from access_mopper_spark.queries import round12b_ops as _round12b_ops  # noqa: F401

from access_mopper_spark.queries import _casts as _casts_mod  # noqa: F401
from access_mopper_spark.queries._casts import (_RAW_ORACLES,  # noqa: F401
                                                _ORACLE_OUTPUT_CASTS)

__all__ = list(_core_all) + ["_RAW_ORACLES", "_ORACLE_OUTPUT_CASTS"]
