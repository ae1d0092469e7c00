"""Incremental MinHash index: ingest in batches ≡ single-shot batch dedup.

The invariant is exact equality of the verified pair set — incremental
maintenance is an optimization, never an approximation."""

from __future__ import annotations

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


def _index_pairs(df):
    return df.select("id_a", "id_b", F.round("jaccard", 6).alias("j"))


def test_incremental_equals_batch_three_ingests(spark, docs, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_dedup import MinHashIndex

    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    c1, c2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]

    idx = MinHashIndex(str(tmp_path / "mh-index"), threshold=0.8)
    idx.update(docs.filter(F.col("doc_id") <= c1))
    assert idx.watermark_id == c1
    idx.update(docs.filter(F.col("doc_id") <= c2))
    got = _index_pairs(idx.update(docs))
    assert idx.watermark_id == ids[-1]

    assert rows_set(got) == rows_set(_batch_pairs(docs))


def test_incremental_durable_across_instances(spark, docs, tmp_path):
    """A new MinHashIndex over the same path resumes from the stored
    watermark — the cross-process deployment shape."""
    from datafusion_query_cache_spark.operators.incremental_dedup import MinHashIndex

    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    p = str(tmp_path / "mh-index2")

    MinHashIndex(p, threshold=0.8).update(docs.filter(F.col("doc_id") <= cut))

    idx2 = MinHashIndex(p, threshold=0.8)
    assert idx2.watermark_id == cut
    got = _index_pairs(idx2.update(docs))
    assert rows_set(got) == rows_set(_batch_pairs(docs))


def test_noop_update_returns_state(spark, docs, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_dedup import MinHashIndex

    p = str(tmp_path / "mh-index3")
    idx = MinHashIndex(p, threshold=0.8)
    first = _index_pairs(idx.update(docs))
    wm = idx.watermark_id
    again = _index_pairs(idx.update(docs))  # no new docs
    assert idx.watermark_id == wm
    assert rows_set(again) == rows_set(first)


def test_param_mismatch_rejected(spark, docs, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_dedup import MinHashIndex

    p = str(tmp_path / "mh-index4")
    MinHashIndex(p, threshold=0.8).update(docs)
    with pytest.raises(ValueError):
        MinHashIndex(p, threshold=0.5)


def test_many_ingests_compact_and_stay_exact(spark, docs, tmp_path):
    """20 tiny ingests: parts compact past the fan-in bound and the pair
    set still equals the single-shot batch."""
    from datafusion_query_cache_spark.operators.incremental_dedup import MinHashIndex

    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    step = max(1, len(ids) // 20)
    cuts = ids[step - 1 :: step]
    if cuts[-1] != ids[-1]:
        cuts.append(ids[-1])

    idx = MinHashIndex(str(tmp_path / "mh-many"), threshold=0.8)
    for c in cuts:
        out = idx.update(docs.filter(F.col("doc_id") <= c))
    assert len(idx._meta["sig_parts"]) <= 17
    assert rows_set(_index_pairs(out)) == rows_set(_batch_pairs(docs))


def test_distributed_tier_equals_driver_tier(spark, docs, tmp_path):
    """The two ingest tiers (driver-side arrow vs fully distributed) must
    be semantically identical: same pair set, interoperable parts."""
    from datafusion_query_cache_spark.operators.incremental_dedup import MinHashIndex

    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    c1, c2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]

    # force every ingest through the distributed path
    dist = MinHashIndex(str(tmp_path / "mh-dist"), threshold=0.8)
    dist.DRIVER_INGEST_MAX_BYTES = 0
    dist.update(docs.filter(F.col("doc_id") <= c1))
    got_dist = _index_pairs(dist.update(docs))
    assert rows_set(got_dist) == rows_set(_batch_pairs(docs))

    # mixed tiers over one index: driver seed, distributed middle, driver end
    mix = MinHashIndex(str(tmp_path / "mh-mix"), threshold=0.8)
    mix.update(docs.filter(F.col("doc_id") <= c1))          # driver tier
    mix.DRIVER_INGEST_MAX_BYTES = 0
    mix.update(docs.filter(F.col("doc_id") <= c2))          # distributed
    mix.DRIVER_INGEST_MAX_BYTES = MinHashIndex.DRIVER_INGEST_MAX_BYTES
    got_mix = _index_pairs(mix.update(docs))                # driver tier
    assert rows_set(got_mix) == rows_set(_batch_pairs(docs))


def test_vacuum_removes_only_orphans(spark, docs, tmp_path):
    """vacuum() deletes crash leftovers (unreferenced part dirs, stale
    meta tmps) past the grace period, never live parts or young dirs."""
    import os
    import time

    from datafusion_query_cache_spark.operators.incremental_dedup import MinHashIndex

    idx = MinHashIndex(str(tmp_path / "mh-vac"), threshold=0.8)
    idx.update(docs)
    before = rows_set(_index_pairs(idx.pairs(spark)))

    # plant crash leftovers: an orphan part dir and a stale meta tmp
    orphan = os.path.join(idx.path, "sigs-deadbeefcafe")
    os.makedirs(orphan)
    tmp_meta = os.path.join(idx.path, ".meta-deadbeef.tmp")
    open(tmp_meta, "w").write("{}")
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    os.utime(tmp_meta, (old, old))
    # and a YOUNG orphan that must survive (in-flight commit protection)
    young = os.path.join(idx.path, "pairs-aaaaaaaaaaaa")
    os.makedirs(young)

    removed = idx.vacuum(grace_s=3600)
    assert sorted(removed) == [".meta-deadbeef.tmp", "sigs-deadbeefcafe"]
    assert not os.path.exists(orphan) and not os.path.exists(tmp_meta)
    assert os.path.exists(young)
    # live parts untouched: the pair set still reads back identically
    assert rows_set(_index_pairs(idx.pairs(spark))) == before
