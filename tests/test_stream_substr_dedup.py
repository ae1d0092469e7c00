"""Streaming maintainer over the claimed-digest indexes: file-frontier
triggered watermarked ingests of the SUBSTRING index must converge to
exactly the batch operator's output after every wave."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set

W = 12


@pytest.fixture()
def corpus(spark):
    return spark.sql(
        "SELECT d.doc_id, concat(d.text, ' ', r.text) AS text "
        "FROM documents d JOIN documents r ON r.doc_id = d.doc_id % 50"
    )


def _copy_wave(src_dir: str, corpus_dir: str) -> None:
    for f in os.listdir(src_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src_dir, f), corpus_dir)


def test_stream_maintained_substr_index_equals_batch(spark, corpus, tmp_path):
    from datafusion_query_cache_spark.operators.dedup import substring_dedup
    from datafusion_query_cache_spark.operators.incremental_para_dedup import (
        SubstringDedupIndex,
    )
    from datafusion_query_cache_spark.streaming.dedup_maintain import (
        maintain_claimed_index,
    )

    ids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    corpus_dir = str(tmp_path / "corpus")
    os.makedirs(corpus_dir)
    ckpt = str(tmp_path / "ckpt")
    idx = SubstringDedupIndex(str(tmp_path / "sd-stream"), window=W)

    corpus.filter(F.col("doc_id") <= cut).write.mode("overwrite").parquet(
        str(tmp_path / "w1")
    )
    _copy_wave(str(tmp_path / "w1"), corpus_dir)
    q = maintain_claimed_index(spark, idx, corpus_dir, ckpt)
    q.awaitTermination(120)
    assert idx.watermark_id == cut

    corpus.filter(F.col("doc_id") > cut).write.mode("overwrite").parquet(
        str(tmp_path / "w2")
    )
    _copy_wave(str(tmp_path / "w2"), corpus_dir)
    q = maintain_claimed_index(spark, idx, corpus_dir, ckpt)
    q.awaitTermination(120)
    assert idx.watermark_id == ids[-1]

    full = spark.read.parquet(corpus_dir)
    assert rows_set(idx.output(spark)) == rows_set(
        substring_dedup(full, window=W)
    )
