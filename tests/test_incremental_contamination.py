"""Incremental contamination index: interleaved doc/benchmark ingests ≡
single-shot batch decontamination.

The invariant is exact equality of the per-doc score frame — incremental
maintenance is an optimization, never an approximation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


@pytest.fixture()
def corpus(spark):
    docs = spark.table("documents")
    return (
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0).select(
            "doc_id", "text"
        ),
    )


def _batch(docs, bench, k=8):
    from datafusion_query_cache_spark.operators.textstats import (
        contamination_scores,
    )

    return contamination_scores(docs, bench, k=k)


def test_interleaved_ingests_equal_batch(spark, corpus, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_contamination import (
        ContaminationIndex,
    )

    docs, bench = corpus
    dids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    bids = sorted(r["doc_id"] for r in bench.select("doc_id").collect())
    d1 = dids[len(dids) // 2]
    b1 = bids[len(bids) // 2]

    idx = ContaminationIndex(str(tmp_path / "ct"), k=8)
    # docs first (no benchmark yet: all scores 0) …
    idx.update(docs=docs.filter(F.col("doc_id") <= d1))
    assert idx.doc_watermark == d1
    # … then the first benchmark release (must increment the OLD docs) …
    idx.update(benchmark=bench.filter(F.col("doc_id") <= b1))
    assert idx.bench_watermark == b1
    # … then both advance in one call
    got = idx.update(docs=docs, benchmark=bench)
    assert rows_set(got) == rows_set(_batch(docs, bench))


def test_benchmark_rerelease_does_not_double_count(spark, corpus, tmp_path):
    """A shingle present in TWO benchmark releases must count once: the
    second release's delta is anti-joined against the stored set."""
    from datafusion_query_cache_spark.operators.incremental_contamination import (
        ContaminationIndex,
    )

    docs, bench = corpus
    idx = ContaminationIndex(str(tmp_path / "ct2"), k=8)
    idx.update(docs=docs, benchmark=bench)
    # re-release: same texts under NEW benchmark ids (all above watermark)
    wm = idx.bench_watermark
    rerelease = bench.select(
        (F.col("doc_id") + F.lit(wm) + 1).alias("doc_id"), "text"
    )
    got = idx.update(benchmark=rerelease)
    assert rows_set(got) == rows_set(_batch(docs, bench))


def test_durable_across_instances_and_fenced(spark, corpus, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_contamination import (
        ContaminationIndex,
    )
    from datafusion_query_cache_spark.operators.incremental_dedup import (
        ConcurrentIndexWriter,
    )

    docs, bench = corpus
    dids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    d1 = dids[len(dids) // 2]
    path = str(tmp_path / "ct3")
    a = ContaminationIndex(path, k=8)
    a.update(docs=docs.filter(F.col("doc_id") <= d1), benchmark=bench)
    # a second instance resumes from the stored watermarks
    b = ContaminationIndex(path, k=8)
    assert b.doc_watermark == d1
    got = b.update(docs=docs)
    assert rows_set(got) == rows_set(_batch(docs, bench))
    # instance `a` lost the race: its next commit must refuse, and
    # reload() recovers
    with pytest.raises(ConcurrentIndexWriter):
        a.update(docs=docs)
    a.reload()
    assert rows_set(a.scores(spark)) == rows_set(_batch(docs, bench))


def test_score_parts_compact(spark, corpus, tmp_path, monkeypatch):
    """Past COMPACT_AT the score parts fold to one; values unchanged."""
    from datafusion_query_cache_spark.operators.incremental_contamination import (
        ContaminationIndex,
    )

    monkeypatch.setattr(ContaminationIndex, "COMPACT_AT", 3)
    docs, bench = corpus
    dids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cuts = [dids[i * len(dids) // 5] for i in (1, 2, 3, 4)] + [dids[-1]]
    idx = ContaminationIndex(str(tmp_path / "ct4"), k=8)
    idx.update(benchmark=bench)
    for c in cuts:
        idx.update(docs=docs.filter(F.col("doc_id") <= c))
    assert len(idx._meta["score_parts"]) <= 3
    assert rows_set(idx.scores(spark)) == rows_set(_batch(docs, bench))


def test_distributed_tier_parity(spark, corpus, tmp_path, monkeypatch):
    """Caps forced to zero: every ingest takes the distributed path and
    the invariant still holds (identical semantics, different tier)."""
    from datafusion_query_cache_spark.operators.incremental_contamination import (
        ContaminationIndex,
    )

    monkeypatch.setattr(ContaminationIndex, "DRIVER_INGEST_MAX_ROWS", 0)
    monkeypatch.setattr(ContaminationIndex, "DRIVER_SCORES_MAX_BYTES", 0)
    docs, bench = corpus
    dids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    d1 = dids[len(dids) // 2]
    idx = ContaminationIndex(str(tmp_path / "ct5"), k=8)
    idx.update(docs=docs.filter(F.col("doc_id") <= d1))
    idx.update(benchmark=bench)
    got = idx.update(docs=docs)
    assert rows_set(got) == rows_set(_batch(docs, bench))
