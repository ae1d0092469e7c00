"""Deterministic hash-threshold sampling/splitting (operators/sampling.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datafusion_query_cache_spark.operators.sampling import (
    _hex_threshold,
    stratified_sample,
    train_val_test_split,
)


def test_hex_thresholds_exact():
    assert _hex_threshold(0.0) == "00000000"
    assert _hex_threshold(0.5) == "80000000"
    assert _hex_threshold(0.25) == "40000000"
    assert _hex_threshold(0.8) == "cccccccc"
    assert _hex_threshold(1.0) == "gggggggg"  # sorts above all hex


def test_split_matches_duckdb_expression(spark):
    import duckdb

    df = train_val_test_split(
        spark.table("documents"), "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    got = sorted(
        tuple(r) for r in df.groupBy("split").count().collect()
    )
    con = duckdb.connect()
    con.register("documents", spark.table("documents").toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT CASE "
            "WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,8) < 'cccccccc' "
            "THEN 'train' "
            "WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,8) < 'e6666666' "
            "THEN 'val' ELSE 'test' END AS split, count(*) AS n "
            "FROM documents GROUP BY 1"
        ).fetchall()
    )
    assert got == want
    # weights roughly respected
    by = dict((r[0], r[1]) for r in got)
    total = sum(by.values())
    assert by["train"] / total == pytest.approx(0.8, abs=0.1)


def test_split_stable_under_repartition_and_append(spark):
    docs = spark.table("documents")
    w = {"train": 0.8, "val": 0.2}
    a = train_val_test_split(docs, "doc_id", w)
    b = train_val_test_split(docs.repartition(13), "doc_id", w)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # appending data never reassigns existing rows
    half = docs.limit(200)
    c = {r["doc_id"]: r["split"] for r in train_val_test_split(half, "doc_id", w).collect()}
    full = {r["doc_id"]: r["split"] for r in a.collect()}
    assert all(full[k] == v for k, v in c.items())


def test_split_salt_independence_and_null_remainder(spark):
    docs = spark.table("documents")
    a = {r["doc_id"]: r["split"] for r in
         train_val_test_split(docs, "doc_id", {"x": 0.5}, salt="s1").collect()}
    b = {r["doc_id"]: r["split"] for r in
         train_val_test_split(docs, "doc_id", {"x": 0.5}, salt="s2").collect()}
    assert a != b  # different experiments, different assignment
    # remainder (1 - 0.5) is NULL-labelled
    n_null = sum(1 for v in a.values() if v is None)
    assert 0 < n_null < len(a)


def test_stratified_sample_nested_and_exact(spark):
    docs = spark.table("documents")
    s1 = stratified_sample(docs, "lang", {"en": 0.2}, "doc_id")
    s2 = stratified_sample(docs, "lang", {"en": 0.5}, "doc_id")
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in s2.select("doc_id").collect()}
    assert ids1 <= ids2  # same salt → nested samples
    # default_fraction=0 drops other strata entirely
    assert s1.filter(F.col("lang") != "en").count() == 0


def test_mixture_upsample_exact_and_stable(spark):
    from datafusion_query_cache_spark.operators.sampling import (
        mixture_upsample,
    )

    docs = spark.table("documents")
    fac = {"en": 2.5, "fr": 0.5, "de": 0.0}
    up = mixture_upsample(docs, "lang", fac, "doc_id", default_factor=1.0)
    rows = up.select("doc_id", "lang", "copy_id").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault((r["doc_id"], r["lang"]), []).append(r["copy_id"])
    # per-row exact semantics: n = floor(f) + {0,1}; copies numbered 1..n
    from datafusion_query_cache_spark.operators.sampling import (
        _PREFIX,
        _hex_threshold,
    )
    import hashlib

    src = docs.select("doc_id", "lang").collect()
    seen_frac_extra = 0
    for r in src:
        f = fac.get(r["lang"], 1.0)
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:_PREFIX]
        n = int(f) + (1 if h < _hex_threshold(f - int(f)) else 0)
        got = sorted(by_doc.get((r["doc_id"], r["lang"]), []))
        assert got == list(range(1, n + 1)), (r["doc_id"], r["lang"], f)
        if r["lang"] == "en" and n == 3:
            seen_frac_extra += 1
    assert seen_frac_extra > 0  # the fractional top-up actually fires
    # de dropped entirely
    assert up.filter(F.col("lang") == "de").count() == 0
    # stability: repartition/rerun changes nothing
    up2 = mixture_upsample(
        docs.repartition(13), "lang", fac, "doc_id", default_factor=1.0
    )
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, up2.select("doc_id", "lang", "copy_id").collect())
    )


def test_shuffle_shards_deterministic_and_interleaving(spark):
    from datafusion_query_cache_spark.operators.sampling import (
        shuffle_shards,
    )

    docs = spark.table("documents")
    a = shuffle_shards(docs, "doc_id", n_shards=4, salt="s").collect()
    b = shuffle_shards(
        docs.repartition(13), "doc_id", n_shards=4, salt="s"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # stable
    by = {}
    for r in a:
        by.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by.items():
        assert sorted(ps) == list(range(len(ps)))  # dense positions
    # appends interleave: adding docs must not reorder existing rows'
    # RELATIVE order within a shard
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    half = shuffle_shards(
        docs.filter(F.col("doc_id") <= ids[len(ids) // 2]),
        "doc_id", n_shards=4, salt="s",
    ).collect()
    full_rank = {
        (r["shard"], r["doc_id"]): r["pos"] for r in a
    }
    for shard in by:
        sub = sorted(
            (r["pos"], r["doc_id"]) for r in half if r["shard"] == shard
        )
        full_order = sorted(
            (full_rank[(shard, d)], d) for _p, d in sub
        )
        assert [d for _p, d in sub] == [d for _p, d in full_order]
    # a different salt is a different permutation
    c = shuffle_shards(docs, "doc_id", n_shards=4, salt="t").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))
