"""Incremental paragraph dedup: ascending ingests ≡ single-shot batch.

Keep-first-(doc_id, pos) is monotone under ascending-id ingests, so the
emitted output parts are immutable and their union must equal the batch
operator over the full corpus."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


@pytest.fixture()
def corpus(spark):
    # synthetic multi-paragraph corpus: each doc gets a second paragraph
    # shared by ~1/50th of the corpus (the op_para_dedup shape)
    return spark.sql(
        "SELECT d.doc_id, concat(d.text, chr(10), r.text) AS text "
        "FROM documents d JOIN documents r ON r.doc_id = d.doc_id % 50"
    )


def _batch(corpus):
    from datafusion_query_cache_spark.operators.dedup import paragraph_dedup

    return paragraph_dedup(corpus)


def test_three_ingests_equal_batch(spark, corpus, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_para_dedup import (
        ParagraphDedupIndex,
    )

    ids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    c1, c2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    idx = ParagraphDedupIndex(str(tmp_path / "pd"))
    out1 = idx.update(corpus.filter(F.col("doc_id") <= c1)).collect()
    assert idx.watermark_id == c1
    idx.update(corpus.filter(F.col("doc_id") <= c2))
    idx.update(corpus)
    assert idx.watermark_id == ids[-1]
    assert rows_set(idx.output(spark)) == rows_set(_batch(corpus))
    # ingest-1 rows were final on emission (outputs immutable)
    out_now = {
        r["doc_id"]: r["text"]
        for r in idx.output(spark).filter(F.col("doc_id") <= c1).collect()
    }
    assert {r["doc_id"]: r["text"] for r in out1} == out_now


def test_update_returns_only_new_docs(spark, corpus, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_para_dedup import (
        ParagraphDedupIndex,
    )

    ids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    c1 = ids[len(ids) // 2]
    idx = ParagraphDedupIndex(str(tmp_path / "pd2"))
    idx.update(corpus.filter(F.col("doc_id") <= c1))
    got = idx.update(corpus)
    new_ids = {r["doc_id"] for r in got.collect()}
    assert new_ids == {i for i in ids if i > c1}
    # empty delta: returns an empty frame, state unchanged
    again = idx.update(corpus)
    assert again.count() == 0
    assert rows_set(idx.output(spark)) == rows_set(_batch(corpus))


def test_durable_and_fenced(spark, corpus, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_dedup import (
        ConcurrentIndexWriter,
    )
    from datafusion_query_cache_spark.operators.incremental_para_dedup import (
        ParagraphDedupIndex,
    )

    ids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    c1 = ids[len(ids) // 2]
    path = str(tmp_path / "pd3")
    a = ParagraphDedupIndex(path)
    a.update(corpus.filter(F.col("doc_id") <= c1))
    b = ParagraphDedupIndex(path)
    assert b.watermark_id == c1
    b.update(corpus)
    assert rows_set(b.output(spark)) == rows_set(_batch(corpus))
    with pytest.raises(ConcurrentIndexWriter):
        a.update(corpus)
    a.reload()
    assert rows_set(a.output(spark)) == rows_set(_batch(corpus))
