"""datafusion_query_cache_spark — a PySpark-native incremental aggregate cache.

A from-scratch rebuild of the capabilities of ``pydantic/datafusion-query-cache``
(an incremental query-result cache for time-series aggregations over
append-only data), designed Spark-first: declarative DataFrame programs,
Catalyst-optimized scans, algebraic partial-aggregate state instead of
DataFusion's internal Partial/Final aggregate modes.

Quick start::

    from datafusion_query_cache_spark import (
        CachedSparkSession, QueryCacheConfig, ParquetQueryCache,
    )

    qc = CachedSparkSession(spark, QueryCacheConfig(
        cache=ParquetQueryCache("/tmp/qc-cache"),
        default_temporal_column="ts",
    ))
    df = qc.sql("SELECT date_trunc('hour', ts) AS h, round(avg(value), 2) AS a, "
                "count(*) AS n FROM events WHERE value > 1 GROUP BY 1 ORDER BY 1")

Run 1 computes and stores partial state; run N scans only ``ts >= watermark``
and merges with the stored state. Non-eligible queries run unchanged via
``spark.sql`` — the full Spark SQL surface passes through.
"""

from .cache import MemoryQueryCache, ParquetQueryCache, QueryCache
from .config import QueryCacheConfig
from .log import HistoryLog, LogNoOp, LogStderr
from .session import AuditBucket, AuditReport, CachedSparkSession, Decision, DecisionTrace

__all__ = [
    "CachedSparkSession",
    "Decision",
    "AuditReport",
    "AuditBucket",
    "DecisionTrace",
    "QueryCacheConfig",
    "QueryCache",
    "MemoryQueryCache",
    "ParquetQueryCache",
    "HistoryLog",
    "LogNoOp",
    "LogStderr",
]

__version__ = "0.1.0"
