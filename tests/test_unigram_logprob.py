"""Unigram-LM quality proxy (r17): mean -ln p(token) under the corpus's
own Lidstone-smoothed unigram distribution with a min-frequency vocab
cut. Handmade-oracle semantics, hashed-key parity, empty/OOV edges."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datafusion_query_cache_spark.operators.textstats import unigram_logprob


def test_handmade_semantics(spark):
    rows = [
        (1, "a a b"),
        (2, "a zzz"),   # zzz is corpus-hapax -> OOV
        (3, ""),
        (4, "A b"),     # lowercased: A counts as a
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["nll"])
        for r in unigram_logprob(df, min_count=2, alpha=0.5).collect()
    }
    # counts: a=4, b=2, zzz=1 -> vocab {a, b}; T=7, V=2
    denom = 7 + 0.5 * 3
    nll = lambda cs: round(
        sum(math.log(denom) - math.log(c + 0.5) for c in cs) / len(cs)
        + 1e-9,
        6,
    )
    assert got[1] == (3, 0, nll([4, 4, 2]))
    assert got[2] == (2, 1, nll([4, 0]))
    assert got[3] == (0, 0, 0.0)
    assert got[4] == (2, 0, nll([4, 2]))
    # ordering sanity: the OOV-bearing doc scores strictly higher
    assert got[2][2] > got[1][2]


def test_hashed_matches_string_keys(spark):
    docs = spark.table("documents").select("doc_id", "text")
    a = sorted(tuple(r) for r in unigram_logprob(docs).collect())
    b = sorted(
        tuple(r) for r in unigram_logprob(docs, hashed=True).collect()
    )
    assert a == b


def test_partitioning_insensitive(spark):
    docs = spark.table("documents").select("doc_id", "text")
    a = sorted(tuple(r) for r in unigram_logprob(docs).collect())
    b = sorted(
        tuple(r)
        for r in unigram_logprob(
            docs.repartition(13).sortWithinPartitions(F.rand(3))
        ).collect()
    )
    assert a == b
