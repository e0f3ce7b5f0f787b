"""Custom source implementations.

File-format sources (parquet/csv/json/orc) come from Spark itself and
are exercised by queries/sources_pipeline.py round-trips; this package
holds sources the engine adds on top: the Python DataSource API
connector (pyds.py).
"""

from sidecar_spark.sources.pyds import TelemetrySource  # noqa: F401
