"""sidecar_spark — a PySpark-native engine with the capabilities of the
sidecar caching FileSystem (reference: VladRodionov/sidecar v0.6.0),
plus a Spark SQL query surface and large-scale training-data pipeline
operators.

Two cooperating halves (see SURVEY.md §7):

* ``sidecar_spark.cache`` — the capability port of the reference's
  caching layer (meta cache, page-granular data cache, write-through
  mirror, admission policy, statistics, persistence).
* ``sidecar_spark.engine`` — the query surface: ``Engine(spark)`` with
  ``table()/sql()/write()`` whose reads resolve through the cache and
  return ordinary DataFrames so the full relational operator set is
  Catalyst's.

Everything here is pure Python/PySpark built only on public APIs.
"""

from sidecar_spark.config import SidecarConfig, DataCacheMode, WriteCacheMode, SidecarDataCacheType
from sidecar_spark.stats import Statistics
from sidecar_spark.engine import Engine

__version__ = "0.1.0"

__all__ = [
    "SidecarConfig",
    "DataCacheMode",
    "WriteCacheMode",
    "SidecarDataCacheType",
    "Statistics",
    "Engine",
    "__version__",
]
