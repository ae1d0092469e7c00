"""Dedup-operator properties: candidate recall, estimate tolerance, and
verified-pipeline exactness (VERDICT r1 item 7 — the properties that let the
driver VALUE-CHECK op_minhash_pairs / op_simhash_pairs against the exact
all-pairs oracle)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    return spark.table("documents")


@pytest.fixture(scope="module")
def exact_pairs(spark, docs):
    from datafusion_query_cache_spark.operators.dedup import ngram_jaccard_pairs

    return {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }


def test_exact_dedup_counts(spark, docs):
    from datafusion_query_cache_spark.operators.dedup import exact_dedup

    out = exact_dedup(docs)
    agg = out.agg(F.sum("dup_count").alias("s")).collect()[0]
    assert agg["s"] == docs.count()  # every doc lands in exactly one group


def test_minhash_candidate_recall(spark, docs, exact_pairs):
    """Banded MinHash candidates (no estimate filter) must contain every
    exact J ≥ 0.8 pair — the recall half of the pipeline guarantee."""
    from datafusion_query_cache_spark.operators.dedup import minhash_lsh_pairs

    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.0).collect()
    }
    missed = set(exact_pairs) - cand
    assert not missed, f"MinHash banding missed true pairs: {sorted(missed)}"


def test_minhash_estimate_tolerance(spark, docs, exact_pairs):
    """64-hash estimate within the slack the pipeline's pre-filter assumes
    (est_slack=0.25 in minhash_dedup_pairs — assert 2x headroom here)."""
    from datafusion_query_cache_spark.operators.dedup import minhash_lsh_pairs

    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.0).collect()
    }
    for p, j in exact_pairs.items():
        assert p in est
        assert abs(est[p] - j) <= 0.25, f"estimate off by {abs(est[p]-j):.3f} on {p}"


def test_simhash_candidate_recall(spark, docs, exact_pairs):
    """Hamming ≤ 9 banded SimHash candidates cover every exact pair
    (ham ≤ 7 suffices on the fixtures; the pipeline default is 9)."""
    from datafusion_query_cache_spark.operators.dedup import simhash_pairs

    cand = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(docs, max_hamming=9).collect()
    }
    missed = set(exact_pairs) - cand
    assert not missed, f"SimHash banding missed true pairs: {sorted(missed)}"


@pytest.mark.parametrize("pipeline", ["minhash", "simhash"])
def test_verified_pipelines_equal_exact(spark, docs, exact_pairs, pipeline):
    """candidates → exact-verify output == the exact all-pairs answer:
    precision 1.0 by construction, recall 1.0 by the banding gates above.
    This equality is what the driver's DuckDB oracle checks."""
    from datafusion_query_cache_spark.operators.dedup import (
        minhash_dedup_pairs,
        simhash_dedup_pairs,
    )

    fn = minhash_dedup_pairs if pipeline == "minhash" else simhash_dedup_pairs
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in fn(docs, threshold=0.8).collect()
    }
    assert set(got) == set(exact_pairs)
    for p in got:
        assert got[p] == pytest.approx(exact_pairs[p], rel=1e-12)


def test_verify_pairs_restricted_equals_allpairs(spark, docs, exact_pairs):
    """verify_pairs on a candidate superset reproduces the all-pairs answer
    exactly (same shingle definition, same arithmetic)."""
    from datafusion_query_cache_spark.operators.dedup import verify_pairs

    ids = [r["doc_id"] for r in docs.select("doc_id").limit(40).collect()]
    cand = spark.createDataFrame(
        [(a, b) for a in ids for b in ids if a < b], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in verify_pairs(docs, cand, threshold=0.8).collect()
    }
    want = {p: j for p, j in exact_pairs.items() if p[0] in ids and p[1] in ids}
    assert set(got) == set(want)
    for p in got:
        assert got[p] == pytest.approx(want[p], rel=1e-12)


def test_persisted_blocks_bounded_across_batches(spark, docs):
    """r5 VERDICT item 6: the batch pipelines persist intermediates
    (signatures, candidate sets) that a long-running driver re-running
    them per trigger must not accumulate — generational release keeps the
    pinned set at one batch's worth per pipeline."""
    from datafusion_query_cache_spark.operators.dedup import (
        minhash_dedup_pairs,
        simhash_dedup_pairs,
    )

    def n_persisted():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    # settle: one batch of each pipeline establishes the steady-state set
    minhash_dedup_pairs(docs, threshold=0.8).collect()
    simhash_dedup_pairs(docs, threshold=0.8).collect()
    baseline = n_persisted()
    for _ in range(3):
        minhash_dedup_pairs(docs, threshold=0.8).collect()
        simhash_dedup_pairs(docs, threshold=0.8).collect()
        assert n_persisted() <= baseline
