"""Exact substring dedup at sliding-window grain (Lee et al. 2022 /
RefinedWeb span removal), batch + incremental.

Batch contract: winner per distinct window text = min (id, pos); every
losing occurrence removes its full token span; a token survives iff no
losing span covers it. Incremental contract (metamorphic, the
paragraph-index invariant): any ascending sequence of updates covering
corpus C yields output == substring_dedup(C)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows_set

W = 12


@pytest.fixture()
def corpus(spark):
    # each doc gets a trailing span shared by ~1/50th of the corpus —
    # long real-text spans so 12-token windows actually collide
    return spark.sql(
        "SELECT d.doc_id, concat(d.text, ' ', r.text) AS text "
        "FROM documents d JOIN documents r ON r.doc_id = d.doc_id % 50"
    )


def _batch(corpus, window=W):
    from datafusion_query_cache_spark.operators.dedup import substring_dedup

    return substring_dedup(corpus, window=window)


def test_semantics_handmade(spark):
    from datafusion_query_cache_spark.operators.dedup import substring_dedup

    rows = [
        (1, "a b c d e f g h"),
        (2, "x y a b c d e z"),  # interior span loses to doc 1
        (3, "a b c d e f g h"),  # exact duplicate -> fully removed
        (4, "q r s"),            # shorter than the window: untouched
        (5, ""),
        (6, "a  b   c d e f g h"),  # whitespace variant normalizes -> dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_kept"])
        for r in substring_dedup(df, window=4).collect()
    }
    assert got[1] == ("a b c d e f g h", 8, 8)
    assert got[2] == ("x y z", 8, 3)  # spans [2,6) and [3,7) removed
    assert got[3] == ("", 8, 0)
    assert got[4] == ("q r s", 3, 3)
    assert got[5] == ("", 0, 0)
    assert got[6] == ("", 8, 0)


def test_adversarial_boilerplate_docs_exact_and_linear(spark):
    """Boilerplate-heavy long docs — most windows duplicated, the case
    this operator exists to clean — must be (a) bit-exact vs a
    pure-Python span-union oracle and (b) nowhere near the pre-r17
    quadratic shapes (re-split-per-window + per-occurrence token-array
    copies + per-token x per-span trim measured ~56s on this corpus;
    the r17 shape runs it in ~4s — the 60s bound is a loose tripwire,
    not a benchmark)."""
    import time

    from datafusion_query_cache_spark.operators.dedup import substring_dedup

    W4 = 40
    # 24 docs x ~3000 tokens: shared boilerplate + per-doc unique runs
    def doc(i):
        boiler = " ".join(f"b{j % 211}q{j % 17}" for j in range(2400))
        uniq = " ".join(f"u{i}w{j}" for j in range(600))
        return boiler + " " + uniq if i % 2 else uniq + " " + boiler

    rows = [(i, doc(i)) for i in range(24)]

    # python oracle: winner per distinct window = min (id, pos); every
    # losing occurrence removes [p, p+W); survivors rejoin with spaces
    first = {}
    toks_by_id = {i: t.split() for i, t in rows}
    for i in sorted(toks_by_id):
        tk = toks_by_id[i]
        for p in range(len(tk) - W4 + 1):
            key = tuple(tk[p : p + W4])
            first.setdefault(key, (i, p))
    expect = {}
    for i, tk in toks_by_id.items():
        rm = [False] * len(tk)
        for p in range(len(tk) - W4 + 1):
            if first[tuple(tk[p : p + W4])] != (i, p):
                for q in range(p, p + W4):
                    rm[q] = True
        kept = [t for t, r in zip(tk, rm) if not r]
        expect[i] = (" ".join(kept), len(tk), len(kept))

    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    t0 = time.time()
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_kept"])
        for r in substring_dedup(df, window=W4).collect()
    }
    wall = time.time() - t0
    assert got == expect
    assert wall < 60.0, f"adversarial corpus took {wall:.1f}s (quadratic regression?)"


def test_multibyte_whitespace_is_not_a_token_boundary(spark, tmp_path):
    """Tokenization contract pin (r17 fuzz axis): the splitter is Java
    regex \\s+, which is ASCII-only — U+00A0 (NBSP) / U+2003 (em space)
    are NOT boundaries, so they stay INSIDE tokens (unlike Python's
    str.split()). Batch and incremental must agree bit-exactly on such
    text, and a doc differing only by multi-byte whitespace is NOT a
    duplicate of its ASCII-spaced twin."""
    from datafusion_query_cache_spark.operators.dedup import substring_dedup
    from datafusion_query_cache_spark.operators.incremental_para_dedup import (
        SubstringDedupIndex,
    )

    base = " ".join(f"w{i}" for i in range(8))
    nbsp = base.replace("w3 w4", "w3 w4")  # fuses two tokens
    em = base.replace("w5 w6", "w5 w6")
    rows = [(1, base), (2, base), (3, nbsp), (4, em)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_kept"])
        for r in substring_dedup(df, window=8).collect()
    }
    # doc 2 is the only exact duplicate; 3/4 have 7 tokens (one fused)
    assert out[1] == (base, 8, 8)
    assert out[2] == ("", 8, 0)
    assert out[3][1] == 7 and out[3][2] == 7
    assert out[4][1] == 7 and out[4][2] == 7
    assert " " in out[3][0] and " " in out[4][0]
    idx = SubstringDedupIndex(str(tmp_path / "mb"), window=8)
    idx.update(df.filter(F.col("doc_id") <= 2))
    idx.update(df)
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_kept"])
        for r in idx.output(spark).collect()
    }
    assert got == out


def test_keep_first_is_partitioning_insensitive(spark, corpus):
    a = rows_set(_batch(corpus))
    b = rows_set(_batch(corpus.repartition(17).sortWithinPartitions(F.rand(7))))
    assert a == b


def test_dedup_actually_fires_on_corpus(spark, corpus):
    out = _batch(corpus)
    trimmed = out.filter(F.col("n_kept") < F.col("n_tokens")).count()
    assert trimmed > 0  # the synthetic shared spans must collide


def test_three_ingests_equal_batch(spark, corpus, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_para_dedup import (
        SubstringDedupIndex,
    )

    ids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    c1, c2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    idx = SubstringDedupIndex(str(tmp_path / "sd"), window=W)
    out1 = idx.update(corpus.filter(F.col("doc_id") <= c1)).collect()
    assert idx.watermark_id == c1
    idx.update(corpus.filter(F.col("doc_id") <= c2))
    idx.update(corpus)
    assert idx.watermark_id == ids[-1]
    assert rows_set(idx.output(spark)) == rows_set(_batch(corpus))
    # ingest-1 rows were final on emission (outputs immutable)
    out_now = {
        r["doc_id"]: r["text"]
        for r in idx.output(spark).filter(F.col("doc_id") <= c1).collect()
    }
    assert {r["doc_id"]: r["text"] for r in out1} == out_now


def test_update_returns_only_new_docs_and_empty_delta(spark, corpus, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_para_dedup import (
        SubstringDedupIndex,
    )

    ids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    c1 = ids[len(ids) // 2]
    idx = SubstringDedupIndex(str(tmp_path / "sd2"), window=W)
    idx.update(corpus.filter(F.col("doc_id") <= c1))
    got = idx.update(corpus)
    assert {r["doc_id"] for r in got.collect()} == {i for i in ids if i > c1}
    again = idx.update(corpus)
    assert again.count() == 0
    assert rows_set(idx.output(spark)) == rows_set(_batch(corpus))


def test_durable_and_fenced(spark, corpus, tmp_path):
    from datafusion_query_cache_spark.operators.incremental_dedup import (
        ConcurrentIndexWriter,
    )
    from datafusion_query_cache_spark.operators.incremental_para_dedup import (
        SubstringDedupIndex,
    )

    ids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    c1 = ids[len(ids) // 2]
    path = str(tmp_path / "sd3")
    a = SubstringDedupIndex(path, window=W)
    a.update(corpus.filter(F.col("doc_id") <= c1))
    b = SubstringDedupIndex(path, window=W)
    assert b.watermark_id == c1
    b.update(corpus)
    assert rows_set(b.output(spark)) == rows_set(_batch(corpus))
    with pytest.raises(ConcurrentIndexWriter):
        a.update(corpus)
    # parameter pinning: a different window refuses the existing index
    with pytest.raises(ValueError):
        SubstringDedupIndex(path, window=W + 1)


def test_seen_parts_compact_under_many_ingests(spark, corpus, tmp_path, monkeypatch):
    """Read fan-in stays bounded: past COMPACT_AT claimed-digest parts,
    an ingest folds them into one (dead dirs removed after the atomic
    swap) — and the batch invariant still holds across the fold."""
    from datafusion_query_cache_spark.operators.incremental_para_dedup import (
        SubstringDedupIndex,
        _ClaimedDigestIndex,
    )

    monkeypatch.setattr(_ClaimedDigestIndex, "COMPACT_AT", 3)
    ids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    idx = SubstringDedupIndex(str(tmp_path / "sdc"), window=W)
    n_waves = 8
    for i in range(1, n_waves + 1):
        cut = ids[min(len(ids) - 1, i * len(ids) // n_waves - 1)]
        idx.update(corpus.filter(F.col("doc_id") <= cut))
    idx.update(corpus)
    assert len(idx._meta["seen_parts"]) <= 4  # folded, not 9+
    assert rows_set(idx.output(spark)) == rows_set(_batch(corpus))
    # dead part dirs actually removed from disk
    import os as _os

    on_disk = {
        d for d in _os.listdir(str(tmp_path / "sdc")) if d.startswith("seen-")
    }
    assert on_disk == set(idx._meta["seen_parts"])
