"""Streaming dedup-index maintainer: file-frontier triggered watermarked
ingests must converge to exactly the batch pipeline's pair set."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


@pytest.fixture()
def docs(spark):
    return spark.table("documents")


def _batch_pairs(docs):
    from datafusion_query_cache_spark.operators.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(docs, threshold=0.8).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("j")
    )


def test_stream_maintained_index_equals_batch(spark, docs, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_dedup import MinHashIndex
    from datafusion_query_cache_spark.streaming.dedup_maintain import (
        maintain_dedup_index,
    )

    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    corpus_dir = str(tmp_path / "corpus")
    os.makedirs(corpus_dir)
    ckpt = str(tmp_path / "ckpt")
    idx = MinHashIndex(str(tmp_path / "mh-stream"), threshold=0.8)

    # wave 1: first half of the corpus arrives
    docs.filter(F.col("doc_id") <= cut).write.mode("overwrite").parquet(
        str(tmp_path / "w1")
    )
    for f in os.listdir(str(tmp_path / "w1")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(str(tmp_path / "w1"), f), corpus_dir)
    q = maintain_dedup_index(spark, idx, corpus_dir, ckpt)
    q.awaitTermination(120)
    assert idx.watermark_id == cut

    # wave 2: the rest arrives as new files; a fresh AvailableNow run
    # (same checkpoint) ingests only the new files / new docs
    docs.filter(F.col("doc_id") > cut).write.mode("overwrite").parquet(
        str(tmp_path / "w2")
    )
    for f in os.listdir(str(tmp_path / "w2")):
        if f.endswith(".parquet"):
            shutil.copy(
                os.path.join(str(tmp_path / "w2"), f),
                os.path.join(corpus_dir, "w2-" + f),
            )
    q = maintain_dedup_index(spark, idx, corpus_dir, ckpt)
    q.awaitTermination(120)
    assert idx.watermark_id == ids[-1]

    got = idx.pairs(spark).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("j")
    )
    assert rows_set(got) == rows_set(_batch_pairs(docs))

    # a third run with nothing new is a no-op (file frontier empty)
    wm = idx.watermark_id
    q = maintain_dedup_index(spark, idx, corpus_dir, ckpt)
    q.awaitTermination(120)
    assert idx.watermark_id == wm
