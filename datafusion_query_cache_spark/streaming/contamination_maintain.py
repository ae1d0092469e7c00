"""Continuous decontamination from Structured Streaming.

``ContaminationIndex.update`` is already an incremental fold in BOTH
directions: docs above the doc watermark score against the standing
benchmark set, and benchmark rows above the benchmark watermark anti-join
the stored membership and increment only already-ingested docs. That is
the "fold the delta, advance the frontier" step a streaming micro-batch
delivers, so the frontiers compose exactly like
:mod:`.dedup_maintain`:

* the FILE frontier (Structured Streaming checkpoint) decides when new
  corpus or benchmark files have arrived and triggers an ingest;
* the ID watermarks (index meta) decide which rows are new — a
  re-delivered or overlapping file can never double-ingest a document or
  double-count a benchmark shingle (the membership anti-join makes even
  a re-RELEASED shingle idempotent).

Two maintainers can run against one index path ONLY serialized — the
single-writer token fence turns a lost race into
:class:`~..operators.incremental_dedup.ConcurrentIndexWriter` + reload,
never a silent clobber. The common deployment is ONE maintainer per
direction with ``Trigger.AvailableNow`` on a schedule (docs hourly,
benchmarks on release), which serializes naturally.

Scale notes: per batch the docs direction is one bounded-Arrow job over
the new docs' shingles (see ``operators/incremental_contamination``);
the benchmark direction probes stored doc-shingle parts columnar-side
without re-shingling any text.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..operators.incremental_contamination import ContaminationIndex


class ContaminationMaintainer:
    """Folds each micro-batch arrival signal into ``index`` by running
    one watermarked ingest over the standing table at ``path`` — in the
    ``kind`` direction ("docs" or "benchmark")."""

    def __init__(
        self, index: ContaminationIndex, path: str, kind: str = "docs"
    ) -> None:
        if kind not in ("docs", "benchmark"):
            raise ValueError("kind must be 'docs' or 'benchmark'")
        self.index = index
        self.path = path
        self.kind = kind

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # the batch frame is only the arrival signal; empty ⇒ nothing new
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        standing = spark.read.parquet(self.path)
        if self.kind == "docs":
            self.index.update(docs=standing)
        else:
            self.index.update(benchmark=standing)


def maintain_contamination_index(
    spark: SparkSession,
    index: ContaminationIndex,
    path: str,
    checkpoint_dir: str,
    kind: str = "docs",
    available_now: bool = True,
    processing_time: Optional[str] = None,
):
    """Start a contamination maintainer for one direction; returns the
    ``StreamingQuery``. ``available_now=True`` (default) ingests
    everything new and stops — the scheduled deployment; pass
    ``processing_time`` for a standing maintainer."""
    sch = spark.read.parquet(path).schema
    stream = spark.readStream.schema(sch).parquet(path)
    m = ContaminationMaintainer(index, path, kind)
    writer = (
        stream.writeStream.foreachBatch(m.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
