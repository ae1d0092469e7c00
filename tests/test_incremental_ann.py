"""Incremental IVF index: frozen-centroid appends, partition-pruned probes,
exhaustive-probe exactness vs brute force."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set


@pytest.fixture()
def emb(spark):
    return spark.table("embeddings")


def _brute(emb, qvec, k=10):
    from datafusion_query_cache_spark.operators.similarity import cosine_topk

    return cosine_topk(emb, qvec, k=k).select(
        "vec_id", F.round("cosine", 6).alias("c")
    )


def test_incremental_exhaustive_probe_equals_brute(spark, emb, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_ann import IVFIndex

    qvec = emb.filter("vec_id = 0").collect()[0]["embedding"]
    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    cut = ids[len(ids) // 2]

    idx = IVFIndex(str(tmp_path / "ivf"), k_cells=8, train_iters=2)
    n1 = idx.update(emb.filter(F.col("vec_id") <= cut))
    n2 = idx.update(emb)
    assert n1 + n2 == len(ids)
    assert idx.watermark_id == ids[-1]

    got = idx.topk(spark, qvec, k=10, nprobe=8).select(
        "vec_id", F.round("cosine", 6).alias("c")
    )
    assert rows_set(got) == rows_set(_brute(emb, qvec))


def test_probe_prunes_cell_partitions(spark, emb, tmp_path):
    """nprobe < k_cells: the probe plan must carry PartitionFilters on
    ivf_cell — the read lists only the probed cell directories."""
    from datafusion_query_cache_spark.operators.incremental_ann import IVFIndex

    qvec = emb.filter("vec_id = 0").collect()[0]["embedding"]
    idx = IVFIndex(str(tmp_path / "ivf2"), k_cells=8, train_iters=2)
    idx.update(emb)
    df = idx.topk(spark, qvec, k=10, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ivf_cell" in m.group(1), plan[:1500]


def test_durable_resume_and_frozen_centroids(spark, emb, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_ann import IVFIndex

    p = str(tmp_path / "ivf3")
    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    cut = ids[len(ids) // 2]
    first = IVFIndex(p, k_cells=8, train_iters=2)
    first.update(emb.filter(F.col("vec_id") <= cut))
    cents = first.centroids

    idx2 = IVFIndex(p, k_cells=8, train_iters=2)
    assert idx2.watermark_id == cut
    idx2.update(emb)
    assert idx2.centroids == cents  # appends never retrain
    assert idx2.update(emb) == 0  # no-op when nothing is new

    with pytest.raises(ValueError):
        IVFIndex(p, k_cells=4)
