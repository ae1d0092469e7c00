"""Term-statistics operators: internal consistency invariants (the driver's
DuckDB oracle does the cross-engine value check)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def docs(spark):
    return spark.table("documents")


def test_term_frequencies_sum_equals_token_count(spark, docs):
    from datafusion_query_cache_spark.operators.textstats import (
        term_frequencies,
        token_count,
    )

    total_tf = term_frequencies(docs).agg(F.sum("tf")).collect()[0][0]
    total_tokens = docs.select(
        token_count(F.col("text")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total_tf == total_tokens


def test_bigram_total_is_tokens_minus_docs(spark, docs):
    from datafusion_query_cache_spark.operators.textstats import (
        bigram_frequencies,
        token_count,
    )

    total_bg = bigram_frequencies(docs).agg(F.sum("n")).collect()[0][0]
    per_doc = docs.select(
        F.greatest(token_count(F.col("text")) - 1, F.lit(0)).alias("n")
    )
    expect = per_doc.agg(F.sum("n")).collect()[0][0]
    assert total_bg == expect


def test_tfidf_topk_shape_and_determinism(spark, docs):
    from datafusion_query_cache_spark.operators.textstats import tfidf_top_terms

    out = tfidf_top_terms(docs, k=3)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")
    )
    bad = per_doc.filter(
        (F.col("n") > 3) | (F.col("n") != F.col("mx"))
    ).count()
    assert bad == 0  # ≤k rows per doc, ranks contiguous from 1
    # deterministic: two runs bit-equal (ties broken by term)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, tfidf_top_terms(docs, k=3).collect()))
    assert a == b
