"""Sequence packing: distributed prefix-sum assignment ≡ the single
window definition, hand-pinned and plan-audited."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _pack(df, budget, **kw):
    from datafusion_query_cache_spark.operators.packing import pack_sequences

    return pack_sequences(df, budget, **kw)


def test_hand_corpus_pin(spark):
    rows = [
        (1, "a b c"),        # 3 tokens, before=0  → seq 0 pos 0
        (2, "d e"),          # 2 tokens, before=3  → seq 0 pos 3
        (3, "f g h i"),      # 4 tokens, before=5  → seq 1 pos 1 (overflow doc 3 crossed)
        (4, "j"),            # 1 token,  before=9  → seq 2 pos 1
        (5, ""),             # 0 tokens, before=10 → seq 2 pos 2
        (6, "k l"),          # 2 tokens, before=10 → seq 2 pos 2
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["seq_id"], r["seq_pos"])
        for r in _pack(df, budget=4).collect()
    }
    assert got == {
        1: (3, 0, 0),
        2: (2, 0, 3),
        3: (4, 1, 1),
        4: (1, 2, 1),
        5: (0, 2, 2),
        6: (2, 2, 2),
    }


def test_matches_single_window_definition(spark):
    """The two-phase distributed prefix sum must equal the one-window
    definition exactly, regardless of bucket count."""
    docs = spark.table("documents")
    from pyspark.sql.window import Window

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    from datafusion_query_cache_spark.operators.textstats import token_count

    expect = (
        docs.select(
            "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
        )
        .withColumn("b4", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            "doc_id",
            "n_tokens",
            F.floor(F.col("b4") / F.lit(512)).cast("long").alias("seq_id"),
            (F.col("b4") % F.lit(512)).cast("long").alias("seq_pos"),
        )
    )
    for nb in (1, 7, 128):
        got = _pack(docs, budget=512, n_buckets=nb)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, expect.collect())
        ), f"n_buckets={nb}"


def test_no_global_single_partition_sort(spark):
    """The scale contract: the plan must not contain a global (empty
    partition-spec) window — every Window sort is keyed by the bucket."""
    docs = spark.table("documents")
    got = _pack(docs, budget=512)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # a global window plans 'Window [...], [id ASC]' with NO partition
    # spec: Spark renders partitioned windows as 'partitionBy' exchanges
    # hashpartitioning(__b...); assert the window's exchange is keyed
    assert "hashpartitioning(__b" in plan, plan[:2000]


def test_sequence_stats(spark):
    rows = [(1, "a b c"), (2, "d e"), (3, "f g h i"), (4, "j")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    from datafusion_query_cache_spark.operators.packing import sequence_stats

    got = {
        r["seq_id"]: (r["n_docs"], r["n_tokens"], r["fill_ratio"], r["overflow"])
        for r in sequence_stats(_pack(df, budget=4), budget=4).collect()
    }
    # seq0: docs 1,2 → 5 tokens (overflow 1); seq1: doc 3 → 4; seq2: doc 4 → 1
    assert got == {
        0: (2, 5, 1.0, 1),
        1: (1, 4, 1.0, 0),
        2: (1, 1, 0.25, 0),
    }


def test_budget_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError):
        _pack(df, budget=0)
