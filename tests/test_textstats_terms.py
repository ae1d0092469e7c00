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


def test_contamination_scores_exact_and_hashed(spark):
    """Decontamination: per-doc shingle overlap against a benchmark —
    the hashed (8-byte-key) variant must agree with the exact string
    join; membership semantics pinned on a hand corpus."""
    from pyspark.sql import functions as F

    from datafusion_query_cache_spark.operators.textstats import (
        contamination_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "zzzzqqqqwwwweeee totally novel"),
            (3, "the quick brown cat sits"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, "the quick brown fox sleeps")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_contaminated)
        for r in contamination_scores(docs, bench, k=8).collect()
    }
    goth = {
        r.doc_id: (r.n_shingles, r.n_contaminated)
        for r in contamination_scores(docs, bench, k=8, hashed=True).collect()
    }
    assert got == goth
    # doc 1 shares a long prefix with the benchmark → heavy overlap;
    # doc 2 shares nothing
    assert got[1][1] > got[3][1] > 0
    assert got[2][1] == 0
    # ratio column bounded
    for r in contamination_scores(docs, bench, k=8).collect():
        assert 0.0 <= r.contamination <= 1.0


def test_contamination_scores_matches_duckdb(spark):
    import duckdb

    from pyspark.sql import functions as F

    from datafusion_query_cache_spark.operators.textstats import (
        contamination_scores,
    )

    docs = spark.table("documents")
    got = {
        r.doc_id: (r.n_shingles, r.n_contaminated)
        for r in contamination_scores(
            docs.filter(F.col("doc_id") % 7 != 0),
            docs.filter(F.col("doc_id") % 7 == 0),
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    exp = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            """
WITH bench AS (
  SELECT DISTINCT substring(d.text, CAST(i AS INT), 8) AS sh
  FROM documents d,
       UNNEST(generate_series(1, greatest(length(d.text) - 7, 1))) AS t(i)
  WHERE d.doc_id % 7 = 0),
dsh AS (
  SELECT d.doc_id, substring(d.text, CAST(i AS INT), 8) AS sh
  FROM documents d,
       UNNEST(generate_series(1, greatest(length(d.text) - 7, 1))) AS t(i)
  WHERE d.doc_id % 7 <> 0 GROUP BY 1, 2)
SELECT doc_id, COUNT(*) AS ns,
       CAST(SUM(CASE WHEN sh IN (SELECT sh FROM bench) THEN 1 ELSE 0 END)
            AS BIGINT) AS nc
FROM dsh GROUP BY 1"""
        ).fetchall()
    }
    assert got == exp


def test_repetition_features_hand_corpus(spark):
    """Gopher-style repetition metrics pinned on a hand corpus."""
    from datafusion_query_cache_spark.operators.textstats import (
        repetition_features,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),       # 6 words, 2 distinct; 'a b' ×3 of 5
            (2, "one two three four"),  # all unique
            (3, "x"),                   # single word: no 2-grams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in repetition_features(docs).collect()}
    assert got[1]["n_words"] == 6
    # the operator rounds to 6 decimals
    assert abs(got[1]["dup_word_ratio"] - (1 - 2 / 6)) < 1e-6
    assert abs(got[1]["top_ngram_ratio"] - 3 / 5) < 1e-6
    assert abs(got[1]["dup_ngram_ratio"] - 1.0) < 1e-6  # both grams repeat
    assert got[2]["dup_word_ratio"] == 0.0
    assert got[2]["dup_ngram_ratio"] == 0.0
    assert got[3]["top_ngram_ratio"] == 0.0  # no grams at all


def test_bigram_rarity_hand_corpus(spark):
    """Pin the rarity semantics: a bigram shared by two docs is not
    rare, hapax bigrams are, degenerate docs (0-1 tokens) score 0."""
    from datafusion_query_cache_spark.operators.textstats import bigram_rarity

    rows = [
        (1, "the cat sat"),   # "the cat" x2 in corpus, "cat sat" hapax
        (2, "the cat ran"),
        (3, "zz"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_rare"], r["rare_ratio"])
        for r in bigram_rarity(df).collect()
    }
    assert got == {
        1: (2, 1, 0.5),
        2: (2, 1, 0.5),
        3: (0, 0, 0.0),
        4: (0, 0, 0.0),
    }


def test_redact_pii_hand_corpus(spark):
    """Pin the redaction + counting semantics (counts on the ORIGINAL
    text per category; sequential redaction email -> ipv4 -> phone)."""
    from datafusion_query_cache_spark.operators.textstats import redact_pii

    rows = [
        (1, "contact bob.smith+x@example.co.uk or 192.168.1.1 now"),
        (2, "call +1 415 555 1212 or 4155551212 ok"),
        (3, "no pii here"),
        (4, "edge a@b.io. and 999.999.999.999 and 1.2.3.4x"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in redact_pii(df).collect()
    }
    assert got == {
        1: ("contact <PII> or <PII> now", 1, 1, 0),
        2: ("call <PII> or <PII> ok", 0, 0, 2),
        3: ("no pii here", 0, 0, 0),
        # naive ipv4 (no octet range check, the C4 convention): 999.999...
        # IS a match; 1.2.3.4x is not (no word boundary before x)
        4: ("edge <PII>. and <PII> and 1.2.3.4x", 1, 1, 0),
    }


def test_token_contamination_matches_char_machinery(spark):
    """unit='word' shares the full plan shape with the char grain; pin
    the token shingler's semantics directly: 5-gram overlap between two
    tiny corpora, docs shorter than n yield no row."""
    from datafusion_query_cache_spark.operators.textstats import (
        contamination_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "one two three four"),       # 4 tokens < 5: no row
            (3, "The  Quick Brown  Fox Jumps today"),  # case/ws-normalized
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps right now")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"])
        for r in contamination_scores(docs, bench, k=5, unit="word").collect()
    }
    # doc1: 5 shingles, exactly 1 matches ("the quick brown fox jumps")
    assert got[1] == (5, 1)
    assert 2 not in got
    # doc3 normalizes to "the quick brown fox jumps today": 2 shingles,
    # the first matches
    assert got[3] == (2, 1)
    # hashed variant agrees at this scale
    goth = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"])
        for r in contamination_scores(
            docs, bench, k=5, unit="word", hashed=True
        ).collect()
    }
    assert goth == got
