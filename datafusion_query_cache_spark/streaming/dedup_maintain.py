"""Continuous near-duplicate index maintenance from Structured Streaming.

``MinHashIndex.update`` is already an incremental fold: given the standing
corpus, it ingests exactly the rows past its id watermark and appends the
new signatures/band-keys/pairs as durable parts. That is the same
"fold the delta, advance the frontier" step a streaming micro-batch
delivers, so the two frontiers compose directly:

* the FILE frontier (Structured Streaming checkpoint) decides when new
  corpus files have arrived and triggers an ingest;
* the ID watermark (index meta) decides which DOCS are new — so a
  re-delivered or overlapping file can never double-ingest a document
  (exactly-once at the document level even when the file layer re-fires).

Each micro-batch the maintainer re-opens the standing corpus path (the
index contract: verification of mixed old/new candidate pairs needs the
already-indexed docs' text too) and runs one ``update``. With
``Trigger.AvailableNow`` this is the cron-shaped incremental dedup job: a
scheduled run ingests only what arrived since the last run, in one pass,
then stops. A standing maintainer (``processing_time``) keeps the pair set
fresh continuously while readers consume ``index.pairs()`` — the dedup
twin of :mod:`.maintain`'s aggregate-cache maintainer.

Scale notes: per batch the work is O(new docs) signatures + the banded
probe against the stored keys (see ``operators/incremental_dedup``); the
corpus re-open is a lazy DataFrame — only candidate members' text is ever
read (semi-join inside ``verify_pairs``). Single-writer contract applies
(one maintainer per index), which a streaming query guarantees by
construction.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..operators.incremental_dedup import MinHashIndex


class DedupIndexMaintainer:
    """Folds each micro-batch arrival signal into ``index`` by running one
    watermarked ingest over the standing corpus at ``corpus_path``."""

    def __init__(self, index: MinHashIndex, corpus_path: str) -> None:
        self.index = index
        self.corpus_path = corpus_path

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # the batch frame itself is only the arrival signal (its files are
        # part of the corpus path); an empty batch means nothing new
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        corpus = spark.read.parquet(self.corpus_path)
        self.index.update(corpus)


def maintain_dedup_index(
    spark: SparkSession,
    index: MinHashIndex,
    corpus_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: Optional[str] = None,
):
    """Start the dedup-index maintainer; returns the ``StreamingQuery``.

    ``available_now=True`` (default) ingests everything new and stops —
    the scheduled incremental-dedup deployment; pass ``processing_time``
    for a standing maintainer."""
    sch = spark.read.parquet(corpus_path).schema
    stream = spark.readStream.schema(sch).parquet(corpus_path)
    m = DedupIndexMaintainer(index, corpus_path)
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


def maintain_claimed_index(
    spark: SparkSession,
    index,
    corpus_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: Optional[str] = None,
):
    """Same maintainer for the claimed-digest dedup indexes
    (:class:`~..operators.incremental_para_dedup.ParagraphDedupIndex`,
    :class:`~..operators.incremental_para_dedup.SubstringDedupIndex`):
    their ``update(corpus)`` is the identical fold-the-delta,
    advance-the-frontier step, so the file frontier × id watermark
    composition — and its exactly-once-per-document property — carries
    over verbatim. The maintained ``index.output()`` converges to the
    single-shot batch operator after every wave (pinned by
    ``tests/test_stream_substr_dedup.py``)."""
    return maintain_dedup_index(
        spark,
        index,
        corpus_path,
        checkpoint_dir,
        available_now=available_now,
        processing_time=processing_time,
    )
