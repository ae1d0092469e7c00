"""Source/sink helpers beyond Parquet (SURVEY §2e scans/sources/sinks row).

The reference inherits every DataFusion source; the Spark rebuild inherits
``spark.read.*`` the same way — these helpers just make registration uniform
with :mod:`.tables` (schema-first reads, no runaway inference) and document
the scale-relevant options.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def register_csv(
    spark: SparkSession,
    name: str,
    path: str,
    schema: Optional[T.StructType] = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV view. Always pass a schema in production: schema inference reads
    the data twice and silently widens types."""
    r = spark.read.option("header", header).option("delimiter", delimiter)
    df = (r.schema(schema) if schema is not None else r.option("inferSchema", True)).csv(
        path
    )
    df.createOrReplaceTempView(name)
    return df


def register_json(
    spark: SparkSession,
    name: str,
    path: str,
    schema: Optional[T.StructType] = None,
    multiline: bool = False,
) -> DataFrame:
    """JSON-lines view (``multiline=True`` for whole-file documents —
    a whole file per record cannot be split across tasks; avoid at scale)."""
    r = spark.read.option("multiLine", multiline)
    df = (r.schema(schema) if schema is not None else r).json(path)
    df.createOrReplaceTempView(name)
    return df


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: Optional[list] = None,
    mode: str = "overwrite",
) -> None:
    """The scale-correct sink for time-series feeding the cache: partition by
    a coarse time bucket (e.g. a ``date`` derived column) so the cache's
    ``ts >= watermark`` refresh prunes whole partitions, not just row
    groups."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)
