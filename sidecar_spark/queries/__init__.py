"""Query battery — the driver-contract surface (``__spark_entry__.py``).

Every implemented operator gets a named entry: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB
oracle string over the same parquet tables. Column names and rounding
are aligned on both sides because the driver hash-compares values
after sorting columns by name.
"""

from sidecar_spark.queries.registry import QUERIES, ORACLES, query
import sidecar_spark.queries.relational  # noqa: F401  (registers)
import sidecar_spark.queries.tpch_extra  # noqa: F401
import sidecar_spark.queries.text_pipeline  # noqa: F401
import sidecar_spark.queries.dedup_pipeline  # noqa: F401
import sidecar_spark.queries.similarity_pipeline  # noqa: F401
import sidecar_spark.queries.streaming_pipeline  # noqa: F401
import sidecar_spark.queries.sampling_pipeline  # noqa: F401
import sidecar_spark.queries.sources_pipeline  # noqa: F401
import sidecar_spark.queries.timeseries_pipeline  # noqa: F401
import sidecar_spark.queries.graph_pipeline  # noqa: F401
import sidecar_spark.queries.modern_sql  # noqa: F401

__all__ = ["QUERIES", "ORACLES", "query"]
