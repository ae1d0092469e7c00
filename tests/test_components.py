"""Connected components + canonical-keep vs a driver-side union-find oracle."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from datafusion_query_cache_spark.operators.components import (
    connected_components,
    near_dedup_keep,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = min node id in component
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    want = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            want[x] = m
    return want


def _check(spark, n_nodes, edges):
    e = spark.createDataFrame(
        [(u, v) for u, v in edges] or [(0, 0)], "id_a long, id_b long"
    )
    nodes = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    got = {
        r["id"]: r["component"]
        for r in connected_components(e, nodes=nodes, node_col="doc_id").collect()
    }
    assert got == _union_find(n_nodes, edges)


def test_components_shapes(spark):
    # chain (worst case for pure neighbor-min: needs pointer jumping),
    # star, two blobs, isolated nodes
    chain = [(i, i + 1) for i in range(40)]
    star = [(50, 50 + i) for i in range(1, 8)]
    blob = [(60 + i, 60 + j) for i in range(5) for j in range(i + 1, 5)]
    _check(spark, 70, chain + star + blob)


def test_components_random(spark):
    rng = random.Random(7)
    n = 200
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(120)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    _check(spark, n, edges)


def test_components_no_edges(spark):
    _check(spark, 10, [])


def test_near_dedup_keep(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}", float(i % 4)) for i in range(12)],
        "doc_id long, text string, q double",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (8, 9)], "id_a long, id_b long"
    )
    # min-id canonical: {0,1,2}->0, {5,6}->5, {8,9}->8, rest singleton
    kept = near_dedup_keep(docs, pairs)
    got = {r["doc_id"]: r["cluster_size"] for r in kept.collect()}
    assert got == {0: 3, 3: 1, 4: 1, 5: 2, 7: 1, 8: 2, 10: 1, 11: 1}
    # quality canonical: cluster {0,1,2} keeps doc 2 (q=2.0 highest),
    # {5,6} keeps 6 (q=2.0 > 1.0), {8,9} keeps 9 (q=1.0 > 0.0)
    kept_q = near_dedup_keep(docs, pairs, quality_col="q")
    assert {r["doc_id"] for r in kept_q.collect()} == {2, 3, 4, 6, 7, 9, 10, 11}
