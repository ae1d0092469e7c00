"""Similarity-search operator tests: brute/LSH/IVF consistency + recall."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark):
    return spark.table("embeddings")


def topk_ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_brute_topk_self_is_first(spark, emb):
    from datafusion_query_cache_spark.operators.similarity import cosine_topk

    q = emb.filter("vec_id = 3").collect()[0]["embedding"]
    ids = topk_ids(cosine_topk(emb, q, k=5))
    assert ids[0] == 3  # cosine(self) == 1.0


def test_topk_join_matches_single(spark, emb):
    from datafusion_query_cache_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_join,
    )

    queries = emb.filter("vec_id IN (0, 7)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    joined = cosine_topk_join(emb, queries, k=5)
    for qid in (0, 7):
        qv = emb.filter(f"vec_id = {qid}").collect()[0]["embedding"]
        single = topk_ids(cosine_topk(emb, qv, k=5))
        multi = [
            r["vec_id"]
            for r in joined.filter(F.col("query_id") == qid)
            .orderBy(F.col("cosine").desc(), "vec_id")
            .collect()
        ]
        assert single == multi


def test_ivf_train_and_probe_recall(spark, emb):
    from datafusion_query_cache_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_topk,
        ivf_train,
    )

    cents = ivf_train(emb, k=8, iters=3)
    assert len(cents) == 8 and len(cents[0]) == 64

    assigned = ivf_assign(emb, cents)
    cells = assigned.groupBy("ivf_cell").count().collect()
    assert sum(r["count"] for r in cells) == emb.count()
    assert all(0 <= r["ivf_cell"] < 8 for r in cells)

    q = emb.filter("vec_id = 11").collect()[0]["embedding"]
    exact = set(topk_ids(cosine_topk(emb, q, k=10)))
    approx = set(topk_ids(ivf_topk(emb, q, cents, k=10, nprobe=4)))
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"IVF recall@10 too low: {recall}"


def test_banded_neardup_recall(spark, emb):
    """The scale-safe banded-LSH near-dup path must reproduce the exact
    brute-force pair set on the fixture (recall 1.0 — candidates are
    verified with the true cosine, so precision is 1.0 by construction).
    This is the property the driver's DuckDB oracle relies on."""
    from datafusion_query_cache_spark.operators.similarity import (
        cosine_neardup_pairs,
        cosine_neardup_pairs_banded,
    )

    exact = {
        (r["id_a"], r["id_b"]) for r in cosine_neardup_pairs(
            emb, threshold=0.4
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"]) for r in cosine_neardup_pairs_banded(
            emb, threshold=0.4
        ).collect()
    }
    assert got.issubset(exact)  # precision 1.0 (exact verification)
    missed = exact - got
    assert not missed, f"banded LSH missed {len(missed)} true pairs: {sorted(missed)[:5]}"


def test_banded_neardup_large_tier_equals_brute(spark, emb):
    """The DISTRIBUTED verification tier (the 100 TB path: band self-join +
    Hamming gate + exact cosine join) must reproduce the brute-force pair
    set exactly, same as the driver/broadcast tier. Forced by a zero byte
    budget — mirrors the dedup tiers' distributed-equals-driver test."""
    from datafusion_query_cache_spark.operators.similarity import (
        cosine_neardup_pairs,
        cosine_neardup_pairs_banded,
    )

    exact = {
        (r["id_a"], r["id_b"]) for r in cosine_neardup_pairs(
            emb, threshold=0.4
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"]) for r in cosine_neardup_pairs_banded(
            emb, threshold=0.4, bucket_bcast_max_bytes=0
        ).collect()
    }
    assert got.issubset(exact)  # precision 1.0 (exact verification)
    missed = exact - got
    assert not missed, f"distributed tier missed {len(missed)} pairs: {sorted(missed)[:5]}"


def test_banded_neardup_byte_gate_scales_with_dim(spark, emb):
    """The tier gate is dimensioned in BYTES (rows × dim × 8): a wide-dim
    corpus must take the distributed tier even when its ROW count is far
    under what the old row gate admitted."""
    import numpy as np

    from datafusion_query_cache_spark.operators import similarity as S

    n = emb.count()
    dim = len(emb.select("embedding").first()[0])
    assert n * dim * 8 > 4096  # budget below forces the distributed tier
    calls = []
    orig = S._neardup_bucket_verify

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    S._neardup_bucket_verify = spy
    try:
        S.cosine_neardup_pairs_banded(
            emb, threshold=0.4, bucket_bcast_max_bytes=4096
        )
        assert not calls, "byte gate admitted a matrix over the budget"
        S.cosine_neardup_pairs_banded(
            emb, threshold=0.4, bucket_bcast_max_bytes=n * dim * 8
        )
        assert calls, "byte gate refused a matrix within the budget"
    finally:
        S._neardup_bucket_verify = orig


def test_banded_neardup_plan_has_no_cartesian(spark, emb):
    from datafusion_query_cache_spark.operators.similarity import (
        cosine_neardup_pairs_banded,
    )

    plan = (
        cosine_neardup_pairs_banded(emb, threshold=0.4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_banded_topk_equals_brute(spark, emb):
    """Banded-pruned top-k must equal brute force on the fixture (recall@10
    1.0 — the property the driver's oracle for op_lsh_cosine_topk needs)."""
    from datafusion_query_cache_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_banded,
    )

    for qid in (0, 11):
        qv = emb.filter(f"vec_id = {qid}").collect()[0]["embedding"]
        brute = [(r["vec_id"], round(r["cosine"], 9)) for r in cosine_topk(emb, qv, k=10).collect()]
        banded = [(r["vec_id"], round(r["cosine"], 9)) for r in cosine_topk_banded(emb, qv, k=10).collect()]
        assert banded == brute


def test_lsh_topk_subset_of_corpus(spark, emb):
    from datafusion_query_cache_spark.operators.similarity import cosine_topk_lsh

    q = emb.filter("vec_id = 0").collect()[0]["embedding"]
    out = cosine_topk_lsh(emb, q, k=10, n_planes=4)
    rows = out.collect()
    assert 0 < len(rows) <= 10
    assert rows[0]["vec_id"] == 0  # query's own bucket contains itself
