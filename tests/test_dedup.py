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


def test_banding_tradeoff_and_candidate_metric(spark, docs, exact_pairs):
    """(r9 verdict item 7) The banding knob is a REAL tradeoff: (64,8)
    rows=8 has its s-curve midpoint at 0.77, so mid-J pairs (0.5–0.75)
    that the default (64,16) rows=4 banding catches must start dropping
    out of the candidate set — while high-J (≥0.8) pairs survive both.
    The candidates_obs Observation reports the candidate volume."""
    from pyspark.sql import Observation

    from datafusion_query_cache_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    # synthetic corpus with CONTROLLED overlap (the sf fixtures carry only
    # high-J pairs): pair i = a 60-word doc and a copy with its tail
    # replaced — swap 22 words → mid-J (~0.45-0.7 in shingle space),
    # swap 2 → high-J (>0.8)
    rows = []
    for i in range(24):
        words = [f"w{i:02d}word{j:02d}" for j in range(60)]
        rows.append((2 * i, " ".join(words)))
        swap = 22 if i % 2 == 0 else 2
        mut = words[:-swap] + [f"x{i:02d}repl{j:02d}" for j in range(swap)]
        rows.append((2 * i + 1, " ".join(mut)))
    sdocs = spark.createDataFrame(rows, "doc_id long, text string")

    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(sdocs, threshold=0.3).collect()
    }
    mid = {p for p, j in exact.items() if 0.40 <= j < 0.75}
    high = {p for p, j in exact.items() if j >= 0.8}
    assert mid and high, f"construction broke: mid={len(mid)} high={len(high)}"

    obs16 = Observation("cand16")
    cand16 = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            sdocs, bands=16, threshold=0.0, candidates_obs=obs16
        ).collect()
    }
    obs8 = Observation("cand8")
    cand8 = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            sdocs, bands=8, threshold=0.0, candidates_obs=obs8
        ).collect()
    }
    # metric: the observation reports the post-distinct candidate volume,
    # and tighter banding emits no more candidates
    n16, n8 = obs16.get["candidates"], obs8.get["candidates"]
    assert n16 >= len(cand16) and n8 >= len(cand8)
    assert n8 < n16, f"(64,8) should emit fewer candidates: {n8} vs {n16}"
    # recall: default banding catches more mid-J pairs than (64,8)
    r16 = len(mid & cand16) / len(mid)
    r8 = len(mid & cand8) / len(mid)
    assert r8 < r16, f"mid-J recall should drop at rows=8: {r8} vs {r16}"
    # the default banding keeps J>=0.8 recall 1.0 (the pipeline contract);
    # (64,8) has midpoint 0.77, so its high-J recall may already dip at
    # J≈0.85 (candidate prob ≈0.92/pair) — exactly the tradeoff the
    # docstring table warns about, so only BOUND it, don't require 1.0
    missed16 = high - cand16
    assert not missed16, f"default banding missed J>=0.8 pairs: {sorted(missed16)}"
    assert len(high & cand8) / len(high) >= 0.5


def test_paragraph_dedup_hand_corpus(spark):
    """Pin the keep-first-(doc_id, pos) policy on a hand corpus: the
    FIRST occurrence of each exact paragraph survives, later copies are
    removed, docs reassemble in original paragraph order, and a doc that
    loses everything stays with empty text."""
    from datafusion_query_cache_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "alpha\nbeta\ngamma"),
        (2, "beta\ndelta"),        # beta already in doc 1 → removed
        (3, "alpha\nbeta"),        # both seen → empty doc survives
        (4, "epsilon\nepsilon"),   # in-doc dup: keep pos 0, drop pos 1
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_paras"], r["n_kept"])
        for r in paragraph_dedup(df).collect()
    }
    assert got == {
        1: ("alpha\nbeta\ngamma", 3, 3),
        2: ("delta", 2, 1),
        3: ("", 2, 0),
        4: ("epsilon", 2, 1),
    }


def test_paragraph_dedup_min_chars_exempts_short(spark):
    """min_chars: short paragraphs (headings/bullets) are exempt — kept
    everywhere, never deduped."""
    from datafusion_query_cache_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "##\nlong paragraph one"),
        (2, "##\nlong paragraph one"),  # '##' exempt; long para deduped
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_kept"])
        for r in paragraph_dedup(df, min_chars=5).collect()
    }
    assert got == {
        1: ("##\nlong paragraph one", 2),
        2: ("##", 1),
    }


def test_paragraph_dedup_plan_shape(spark):
    """The dedup decision must shuffle digests, not text: the winner
    aggregation's exchange carries (h, w) only, and partial aggregation
    (map-side combine) sits below it."""
    from datafusion_query_cache_spark.operators.dedup import paragraph_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = paragraph_dedup(docs, sep=" ")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan or "partial min" in plan.lower(), plan[:2000]
    assert out.count() == docs.count()
