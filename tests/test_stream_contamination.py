"""Streaming contamination maintainer: file-frontier triggered watermarked
ingests (docs direction + a benchmark release) must converge to exactly
the batch decontamination scores."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


@pytest.fixture()
def corpus(spark):
    docs = spark.table("documents")
    return (
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text"),
    )


def _copy_parquet(src: str, dst: str) -> None:
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), dst)


def test_stream_maintained_contamination_equals_batch(spark, corpus, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_contamination import (
        ContaminationIndex,
    )
    from datafusion_query_cache_spark.operators.textstats import (
        contamination_scores,
    )
    from datafusion_query_cache_spark.streaming.contamination_maintain import (
        maintain_contamination_index,
    )

    docs, bench = corpus
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    docs_dir = str(tmp_path / "docs")
    bench_dir = str(tmp_path / "bench")
    os.makedirs(docs_dir)
    os.makedirs(bench_dir)
    idx = ContaminationIndex(str(tmp_path / "ct-stream"), k=8)

    # the benchmark release lands first (its own maintainer + checkpoint)
    bench.write.mode("overwrite").parquet(str(tmp_path / "b1"))
    _copy_parquet(str(tmp_path / "b1"), bench_dir)
    q = maintain_contamination_index(
        spark, idx, bench_dir, str(tmp_path / "ckpt-b"), kind="benchmark"
    )
    q.awaitTermination(120)
    assert idx.bench_watermark is not None

    # wave 1: half the corpus arrives
    docs.filter(F.col("doc_id") <= cut).write.mode("overwrite").parquet(
        str(tmp_path / "w1")
    )
    _copy_parquet(str(tmp_path / "w1"), docs_dir)
    q = maintain_contamination_index(
        spark, idx, docs_dir, str(tmp_path / "ckpt-d"), kind="docs"
    )
    q.awaitTermination(120)
    assert idx.doc_watermark == cut

    # wave 2: the rest arrives as new files; a fresh AvailableNow run
    # (same checkpoint) ingests only the new files / new docs
    docs.filter(F.col("doc_id") > cut).write.mode("overwrite").parquet(
        str(tmp_path / "w2")
    )
    _copy_parquet(str(tmp_path / "w2"), docs_dir)
    idx.reload()  # the maintainer committed; adopt its token
    q = maintain_contamination_index(
        spark, idx, docs_dir, str(tmp_path / "ckpt-d"), kind="docs"
    )
    q.awaitTermination(120)

    idx.reload()
    got = idx.scores(spark)
    assert rows_set(got) == rows_set(contamination_scores(docs, bench, k=8))
