"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference surface (SURVEY §7.8): exact dedup, MinHash+LSH, SimHash,
and exact n-gram Jaccard — each expressed with built-in Spark SQL functions
(higher-order array functions + ``xxhash64``) so the whole pipeline stays
JVM-side inside whole-stage codegen. No Python UDFs anywhere.

Scale notes (the design target is ~100 TB of documents on a real cluster):

* Exact dedup is one hash-shuffle on a 16-byte digest, not the full text.
* MinHash: signatures are computed scan-side (no shuffle); LSH banding turns
  the O(n²) pair problem into ``bands`` shuffles keyed by (band, band-hash),
  and candidate pairs are generated only *within* buckets via a self-join on
  the bucket key. Skewed buckets (e.g. boilerplate) are the classic hazard —
  ``max_bucket`` caps them, the same guard production LSH pipelines use.
* Exact n-gram Jaccard explodes shingles (row blow-up ≈ chars/doc); it is
  the *oracle* path for small data and the verifier for MinHash — at scale
  you run it only on LSH candidate pairs (``verify_pairs``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .spread import spread_input

#: per-pipeline persisted frames, released generationally (see
#: :func:`_persist_generational`)
_PERSISTED: Dict[str, List[DataFrame]] = {}


def _persist_generational(key: str, df: DataFrame) -> DataFrame:
    """Persist ``df``, releasing whatever the PREVIOUS call under ``key``
    persisted — UNLESS the previous generation computes the same plan, in
    which case it is returned as-is (its cached blocks ARE this result).

    The batch pipelines return LAZY results, so their intermediate frames
    (signatures, candidate sets) cannot unpersist inside the call — the
    caller hasn't materialized anything yet. Without release, a
    long-running driver that re-runs a pipeline per trigger (a streaming
    maintainer's foreachBatch, a standing dashboard) accumulates cached
    blocks forever: Spark's CacheManager pins DataFrame-persisted blocks
    until an explicit unpersist. Generational release bounds the pinned
    set at ONE batch's worth per pipeline.

    The ``sameResult`` check preserves plain ``.persist()``'s repeat-run
    economics: Spark's CacheManager serves any plan-identical DataFrame
    from the existing cache, so a dashboard re-running the SAME pipeline
    over the SAME source must keep hitting the warm generation —
    unconditional eviction at call entry would throw those blocks away
    and recompute from scratch every run (a measured 2× on the bench's
    minhash row). Same-plan reuse carries Spark's standard cache
    staleness semantics, identical to what ``.persist()`` alone did.
    Unpersisting a superseded generation is always safe — a consumer
    still holding its result just recomputes that lineage."""
    olds = _PERSISTED.get(key, [])
    for old in olds:
        try:
            if (
                old._jdf.queryExecution().analyzed()
                .sameResult(df._jdf.queryExecution().analyzed())
            ):
                return old  # warm generation already computes this plan
        except Exception:
            pass  # session torn down / plan comparison unavailable
    for old in olds:
        try:
            old.unpersist()
        except Exception:
            pass  # session torn down / already released
    _PERSISTED[key] = [df.persist()]
    return df


def _shingles(text: Column, k: int) -> Column:
    """Distinct character k-shingles of ``text`` as an array column.

    Built-ins only: sequence → transform → array_distinct; evaluated
    vectorized in the JVM, no Python round-trip.
    """
    n = F.length(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
            lambda i: F.substring(text, i, F.lit(k)),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups by full-text digest.

    Returns one row per distinct text: ``keep_id`` (min id), ``dup_count``.
    The shuffle key is ``md5(text)`` (16 bytes) rather than the document
    body — at 100 TB this is the difference between shuffling 100 TB and
    shuffling ~32 GB of digests.
    """
    # NOT spread (r17-OPT measured): one md5 per doc is too cheap — the
    # small-input exchange + stats probe cost more than the single-task
    # hash pass they parallelize (bench row 0.16s -> 0.52s with spread)
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 0,
) -> DataFrame:
    """Corpus-level exact sub-document dedup (C4 / RefinedWeb style):
    remove every paragraph whose exact text already appeared EARLIER in
    the corpus, then reassemble each document from its surviving
    paragraphs in original order.

    Keep policy (design note): "first" = the occurrence with the smallest
    ``(id, pos)`` — deterministic, order-insensitive to partitioning, and
    the policy C4 uses ("keep one of every three-sentence span"). A
    document whose every paragraph first appeared elsewhere stays in the
    corpus with empty text (``n_kept = 0``) — dropping it is a separate
    filter decision the caller owns. ``min_chars`` exempts short
    paragraphs (headings, list bullets) from dedup entirely — production
    line-dedup pipelines only dedup lines long enough to be boilerplate.

    Returns ``(id_col, text_col [reassembled], n_paras, n_kept)``.

    Scale shape (100 TB): document TEXT never rides a dedup shuffle. The
    winner decision shuffles ONLY 16-byte md5 digests + (id, pos) (with
    map-side combine), folds to a per-doc keep-position set (a second
    tiny (id, int-array) shuffle), and the reassembly is SCAN-SIDE: the
    keep-set joins back on ``id_col`` and an index-aware ``F.filter``
    over ``split(text)`` rebuilds each doc in place — original order for
    free, no explode-join-collect round trip for the text. No Python
    UDFs; everything is built-in expressions inside whole-stage codegen.
    """
    import re as _re

    df = spread_input(df)
    pat = _re.escape(sep)
    did = F.col(id_col)
    arr = F.split(F.col(text_col), pat)
    paras = df.select(did, F.posexplode(arr).alias("pos", "para"))
    eligible = (
        paras if min_chars <= 0 else paras.filter(F.length("para") >= min_chars)
    )
    # winner per exact paragraph (min (id, pos)), folded to a per-doc
    # keep-position set — 16-byte digest shuffle, then an (id, ints) one
    keep_pos = (
        eligible.select(
            F.unhex(F.md5("para")).alias("h"),
            F.struct(id_col, "pos").alias("w"),
        )
        .groupBy("h")
        .agg(F.min("w").alias("w"))
        .groupBy(F.col(f"w.{id_col}").alias(id_col))
        .agg(F.collect_set(F.col("w.pos")).alias("__keep_pos"))
    )
    kp = F.coalesce(F.col("__keep_pos"), F.array().cast("array<int>"))
    if min_chars > 0:
        # exempt paragraphs are decided scan-side: no (id, pos) rows for
        # them ever exist, they are simply always kept here
        kept_arr = F.filter(
            arr,
            lambda x, i: F.array_contains(kp, i)
            | (F.length(x) < F.lit(min_chars)),
        )
    else:
        kept_arr = F.filter(arr, lambda x, i: F.array_contains(kp, i))
    # two-step select (r17 hardening, see substring_dedup): aliasing
    # the rejoined string to the input column's name in the SAME select
    # as expressions whose HOF lambdas reference that name risks
    # lateral-column-alias capture; compute the kept array once under a
    # non-colliding name, rename after
    return (
        df.join(keep_pos, [id_col], "left")
        .select(
            did,
            kept_arr.alias("__kept"),
            F.size(arr).cast("long").alias("n_paras"),
        )
        .select(
            id_col,
            F.array_join("__kept", sep).alias(text_col),
            "n_paras",
            F.size("__kept").cast("long").alias("n_kept"),
        )
    )


def _span_trimmed(toks_sql: str, nt_sql: str, rm_sql: str, W: int):
    """Tokens surviving the UNION of width-``W`` losing spans, in order.

    O(tokens + spans), never O(tokens x spans): the sorted span starts
    fold into the complement GAP intervals (int pairs only — with equal
    widths a sorted start merges into the running covered interval iff
    ``start <= prev_end``), then the kept array is one ``slice`` of the
    token array per gap. A boilerplate-heavy doc — most windows
    duplicated, the common case this operator exists to clean — has its
    spans merge to O(1) intervals, so the trim is linear where the old
    per-token ``F.exists`` scan was quadratic in doc length.

    Preserves the span-union removal rule pinned in
    :func:`substring_dedup`'s docstring bit-exactly (same kept set,
    same order).

    r18: built as ONE ``F.expr`` string instead of ~40 Column-API py4j
    round-trips (each ``F.struct``/``F.when``/lambda call crosses the
    py4j socket while constructing the tree) — the same driver-residue
    fix the minhash aggregates took in r16. The expression Catalyst
    sees is identical (``if`` IS ``CASE WHEN``); every standing-ingest
    commit rebuilds this tree, so construction cost is a per-ingest
    driver tax. Inputs are SQL fragments (column references resolved in
    the caller's select), not Columns.
    """
    sql = (
        "flatten(transform(aggregate("
        f"array_sort({rm_sql}), "
        "struct(0 AS prev, "
        "cast(array() AS array<struct<lo:int,hi:int>>) AS gaps), "
        "(acc, s) -> struct("
        f"greatest(acc.prev, s + {int(W)}) AS prev, "
        "if(s > acc.prev, "
        "concat(acc.gaps, array(struct(acc.prev AS lo, s AS hi))), "
        "acc.gaps) AS gaps), "
        f"acc -> if({nt_sql} > acc.prev, "
        f"concat(acc.gaps, array(struct(acc.prev AS lo, {nt_sql} AS hi))), "
        "acc.gaps)), "
        f"g -> slice({toks_sql}, g.lo + 1, g.hi - g.lo)))"
    )
    return F.expr(sql)


def substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 50,
) -> DataFrame:
    """Exact SUBSTRING dedup at sliding-window grain (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better";
    RefinedWeb): every exact ``window``-token span that already appeared
    earlier in the corpus is REMOVED — only its first occurrence's text
    survives. Finer than :func:`paragraph_dedup` (boilerplate that never
    aligns to paragraph boundaries) and coarser than near-dup.

    Semantics (the oracle-pinned contract):

    * tokens = whitespace split, empties dropped (the ``textstats``
      tokenization, case-preserving); reassembly joins with single
      spaces, so inter-token whitespace is normalized.
    * occurrences = every start position ``0 <= p <= n_tokens - window``
      (docs shorter than ``window`` are untouched);
    * winner per distinct window text = min ``(id, pos)`` — the
      keep-first policy of :func:`paragraph_dedup`, deterministic and
      partitioning-insensitive;
    * every LOSING occurrence removes its full span ``[p, p+window)``;
      a token survives iff NO losing span covers it (spans union —
      a loser overlapping a winner still trims the overlap, exactly the
      span-removal rule of the reference pipelines).

    Returns ``(id, text [reassembled], n_tokens, n_kept)``.

    Scale shape (100 TB): window TEXT never rides a shuffle. ALL of a
    doc's window hashes are computed in ONE scan-side projection
    (``transform`` over the start positions, ``xxhash64`` over each
    token-slice array → 8 bytes each) and only the hash array is
    exploded — an occurrence row is (id, pos, h), 24 bytes, and the
    token array is never duplicated per occurrence (the pre-r17 shape
    exploded FIRST and carried the full token array on every occurrence
    row: O(n_tokens²) string copies per doc, ~40s on a 6k-token
    boilerplate doc corpus vs ~2s for this shape). The winner decision
    is ``min(struct(id,pos)) OVER (PARTITION BY h)`` — ONE key
    exchange, no frequency-table branch or join-back (the single-pass
    window shape of ``bigram_rarity``); loser positions fold to a
    per-doc int array (an (id, ints) shuffle), and trimming is a
    scan-side merged-interval gap slice (:func:`_span_trimmed`,
    O(tokens + spans)). No UDFs.
    """
    from pyspark.sql import Window as _W

    df = spread_input(df)
    W = int(window)
    # tokenize ONCE into a materialized column: every reference below
    # goes through `__tk`, never the raw split expression. Inlining the
    # split into the transform lambda re-splits the WHOLE text once per
    # window position — O(n_tokens^2) per doc (observed: 54s vs 2s on a
    # 60-doc 6k-token boilerplate corpus). CollapseProject keeps the
    # alias because it is non-cheap and multiply-referenced.
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0
    )
    base = df.select(F.col(id_col), toks.alias("__tk"))
    tk = F.col("__tk")
    nt = F.size(tk)
    starts = F.when(
        nt >= W, F.sequence(F.lit(0), nt - F.lit(W))
    ).otherwise(F.array().cast("array<int>"))
    # hash the token-slice ARRAY directly: no concat string alloc,
    # equally injective — windows have a fixed token count and tokens
    # carry no whitespace. Hash key is unchanged from the explode-first
    # shape (same xxhash64 over the same slice).
    win_h = F.transform(
        starts, lambda p: F.xxhash64(F.slice(tk, p + 1, W))
    )
    occ = base.select(
        F.col(id_col), F.posexplode(win_h).alias("pos", "h")
    )
    wmin = F.min(F.struct(id_col, "pos")).over(_W.partitionBy("h"))
    losers = occ.withColumn("__w", wmin).filter(
        (F.col(id_col) != F.col(f"__w.{id_col}"))
        | (F.col("pos") != F.col("__w.pos"))
    )
    rm = losers.groupBy(id_col).agg(F.collect_set("pos").alias("__rm"))
    kept_arr = _span_trimmed(
        "__tk",
        "size(__tk)",
        "coalesce(__rm, cast(array() AS array<int>))",
        W,
    )
    # two-step select: the kept array is computed ONCE under a name that
    # cannot collide with `text_col` — aliasing the rejoined string to
    # the input column's name in the SAME select lets Spark's
    # lateral-column-alias resolution capture the `text_col` references
    # inside the trim's HOF lambdas (observed on 4.1: n_kept re-split
    # the REJOINED text while n_tokens read the original)
    return (
        base.join(rm, [id_col], "left")
        .select(
            F.col(id_col),
            kept_arr.alias("__kept"),
            nt.cast("long").alias("n_tokens"),
        )
        .select(
            id_col,
            F.array_join("__kept", " ").alias(text_col),
            "n_tokens",
            F.size("__kept").cast("long").alias("n_kept"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 5,
    spread: bool = True,
) -> DataFrame:
    """MinHash signatures: ``sig[i] = min over shingles of xxhash64(sh, i)``.

    One pass over the data, no shuffle: shingling, hashing and the per-seed
    min all run inside a single projection (whole-stage codegen).
    """
    # Shape: explode shingles → one xxhash64 per (doc, shingle) → groupBy doc
    # with `num_hashes` min-aggregates over cheap per-seed linear mixes
    # h_i(x) = (a_i·x + b_i) mod p (classic universal family). Exploding is
    # deliberate: the mins become map-side partial aggregates (combine before
    # shuffle), and nothing is recomputed per seed — one hash per shingle.
    # Operands stay < 2^61 (30-bit base × 31-bit coefficients): never
    # overflows a long even under ANSI mode.
    p = (1 << 31) - 1  # Mersenne prime
    coeffs = []
    state = 0x9E3779B9
    for _ in range(num_hashes):
        state = (state * 0x5DEECE66D + 0xB) % (1 << 48)  # LCG, deterministic
        a = (state % (p - 1)) + 1
        state = (state * 0x5DEECE66D + 0xB) % (1 << 48)
        b = state % p
        coeffs.append((a, b))
    # explode positions then substr — no per-doc array materialization, and
    # duplicate shingles are harmless (min over a multiset == min over set).
    # ``spread=False`` lets O(new)-delta callers (incremental ingests whose
    # inputs are small BY DESIGN and whose job counts are gate-committed)
    # skip the small-input repartition: on a tiny delta the extra AQE stage
    # job costs more than the single-task scan it parallelizes, and at
    # cluster scale spread_input is a no-op for them anyway.
    if spread:
        df = spread_input(df)
    exploded = df.select(
        F.col(id_col),
        F.col(text_col),
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.length(F.col(text_col)) - F.lit(shingle_k - 1), F.lit(1)),
            )
        ).alias("__i"),
    ).select(
        id_col,
        F.xxhash64(F.col(text_col).substr(F.col("__i"), F.lit(shingle_k)))
        .bitwiseAND(F.lit((1 << 30) - 1))
        .alias("__h"),
    )
    # one F.expr per aggregate (not nested Column builders): the 64
    # min-aggregates are plan-construction-bound otherwise (~7 py4j round
    # trips each ≈ 0.5s of driver chatter per call — measured r14); the
    # parsed SQL lowers to the identical Catalyst expressions
    mins = exploded.groupBy(id_col).agg(
        *[
            F.expr(f"min(pmod(__h * {a}L + {b}L, {p}L)) AS __m{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    arr = ", ".join(f"__m{i}" for i in range(num_hashes))
    return mins.select(
        F.col(id_col), F.expr(f"array({arr})").alias("minhash")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 5,
    bands: int = 16,
    threshold: float = 0.6,
    max_bucket: int = 1000,
    candidates_obs=None,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH over MinHash signatures.

    Pipeline: signature → explode ``bands`` band-hashes → self-join within
    (band, hash) buckets → estimated Jaccard = fraction of matching
    signature positions → filter ≥ threshold.

    ``(bands, rows=num_hashes//bands)`` sets the s-curve: a pair with true
    Jaccard J becomes a candidate with probability ``1-(1-J^rows)^bands``,
    steepest around the midpoint ``(1/bands)^(1/rows)``. Pick the banding
    whose midpoint sits at (or just below) your verify threshold — a lower
    midpoint costs candidate volume, a higher one costs recall:

    ====================  ========  ==============================
    (num_hashes, bands)   midpoint  use for verify threshold ≈
    ====================  ========  ==============================
    (64, 32)  rows=2      0.18      0.2 – 0.35
    (64, 16)  rows=4      0.50      0.5 – 0.7   (default)
    (128, 16) rows=8      0.71      0.7 – 0.8   (tighter estimator too)
    (64, 8)   rows=8      0.77      0.8 – 0.9
    ====================  ========  ==============================

    At 1B docs the candidate:verify ratio (1,762:1 at sf0.1 with the
    default banding at threshold 0.6) is the cost driver — pass a
    ``pyspark.sql.Observation`` as ``candidates_obs`` and read
    ``obs.get["candidates"]`` after the first action to see the candidate
    volume a production run actually pushed through the distinct shuffle.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, distinct.
    """
    rows = num_hashes // bands
    # persist: the signature table is referenced three times below (banding +
    # both sides of the signature re-join); without it the whole
    # shingle→hash→min pipeline recomputes per reference. At cluster scale
    # this is ~0.5 KB/doc — MEMORY_AND_DISK, or swap for a parquet
    # checkpoint when the corpus is huge.
    sigs = _persist_generational(
        "minhash_sigs",
        minhash_signatures(df, text_col, id_col, num_hashes, shingle_k),
    )

    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.slice(F.col("minhash"), b * rows + 1, rows)),
            )
        ).alias("band", "band_hash"),
    )

    # skew guard: drop degenerate buckets (boilerplate/empty docs) that would
    # otherwise produce a quadratic pair explosion on one executor
    bucket_sizes = banded.groupBy("band", "band_hash").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    banded = banded.join(
        bucket_sizes.filter(F.col("bucket_n") <= max_bucket).drop("bucket_n"),
        ["band", "band_hash"],
    )

    # candidate ids first, signatures re-attached after: the distinct() runs
    # on (id, id) pairs — 16 bytes — instead of dragging two 64-long
    # signature arrays through the dedup shuffle.
    a = banded.select("band", "band_hash", F.col(id_col).alias("id_a"))
    b = banded.select("band", "band_hash", F.col(id_col).alias("id_b"))
    cand = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if candidates_obs is not None:
        # post-distinct candidate count: the volume the verify join pays
        cand = cand.observe(
            candidates_obs, F.count(F.lit(1)).alias("candidates")
        )
    sig_a = sigs.select(F.col(id_col).alias("id_a"), F.col("minhash").alias("sig_a"))
    sig_b = sigs.select(F.col(id_col).alias("id_b"), F.col("minhash").alias("sig_b"))
    pairs = cand.join(sig_a, "id_a").join(sig_b, "id_b")

    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        ).cast("double")
        / F.lit(float(num_hashes))
    )
    return (
        pairs.select("id_a", "id_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity pairs (the small-scale oracle).

    Explodes distinct shingles, self-joins on shingle, and computes
    ``|A∩B| / (|A|+|B|-|A∩B|)``. Quadratic in the worst case — at scale run
    it only on candidate pairs from :func:`minhash_lsh_pairs`.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = spread_input(df).select(
        F.col(id_col),
        F.explode(_shingles(F.col(text_col), shingle_k)).alias("sh"),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    a = sh.select(F.col(id_col).alias("id_a"), "sh")
    b = sh.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def verify_pairs(
    df: DataFrame,
    cand: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT n-gram Jaccard verification of candidate pairs — the second
    stage of every LSH dedup pipeline (candidates → verify → keep).

    Each side's distinct-shingle array is attached by id and intersected
    per pair (``array_intersect``, JVM-side): cost is
    O(|candidates| · doc_len) with no shingle-keyed shuffle, unlike the
    all-pairs :func:`ngram_jaccard_pairs` which is the small-data oracle.

    ``cand`` is referenced twice (member-id set + the pair join) — persist
    it when it is an expensive derived frame, or pass a local relation.

    Returns (id_a, id_b, jaccard) with jaccard ≥ threshold.
    """
    # shingle ONLY docs that appear in a candidate pair: a semi-join first
    # (AQE broadcasts the small id set) keeps the expensive shingle
    # projection off the 99%+ of the corpus no candidate touches — at
    # 100 TB, shingling the full corpus to verify a few pairs is the cost
    member_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    shs = df.join(member_ids, id_col, "left_semi").select(
        F.col(id_col), _shingles(F.col(text_col), shingle_k).alias("__shs")
    )
    a = shs.select(F.col(id_col).alias("id_a"), F.col("__shs").alias("__sa"))
    b = shs.select(F.col(id_col).alias("id_b"), F.col("__shs").alias("__sb"))
    joined = (
        cand.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect(F.col("__sa"), F.col("__sb"))).alias("__c"),
            F.size(F.col("__sa")).alias("__na"),
            F.size(F.col("__sb")).alias("__nb"),
        )
    )
    jac = F.col("__c").cast("double") / (
        F.col("__na") + F.col("__nb") - F.col("__c")
    )
    return joined.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    shingle_k: int = 5,
    bands: int = 16,
    est_slack: float = 0.25,
    max_bucket: int = 1000,
    candidates_obs=None,
) -> DataFrame:
    """Production MinHash dedup pipeline: LSH candidates → exact verify.

    The estimate pre-filter keeps ``est ≥ threshold - est_slack`` (the
    64-hash estimator's error is ≲0.12 on the fixtures; slack 0.25 is a 2×
    margin), then :func:`verify_pairs` recomputes the true Jaccard — so the
    OUTPUT is exact: precision 1.0 by construction, recall = the banding
    recall (1-(1-J^r)^B ≈ 0.9998 at J=0.8 with 16 bands of 4; verified
    1.0 on the sf fixtures in tests/test_dedup.py). This is what makes the
    operator value-checkable against the exact all-pairs oracle.

    ``num_hashes``/``bands`` select the banding s-curve — see the table on
    :func:`minhash_lsh_pairs`; ``candidates_obs`` (an ``Observation``)
    reports the candidate volume so the candidate:verify ratio is visible
    in production (r9 profile: 1,762:1 at sf0.1, banding-dominated)."""
    # persist: verify_pairs references the candidate set twice (member ids
    # + pair join); uncached, the whole banding pipeline would run twice
    cand = minhash_lsh_pairs(
        df,
        text_col,
        id_col,
        num_hashes,
        shingle_k,
        bands,
        threshold=max(0.0, threshold - est_slack),
        max_bucket=max_bucket,
        candidates_obs=candidates_obs,
    )
    cand = _persist_generational("minhash_cand", cand)
    return verify_pairs(
        df, cand.select("id_a", "id_b"), text_col, id_col, shingle_k, threshold
    )


def simhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_hamming: int = 9,
    shingle_k: int = 5,
    sim_shingle_k: int = 4,
) -> DataFrame:
    """Production SimHash dedup pipeline: Hamming-banded candidates →
    exact n-gram Jaccard verify (same contract as
    :func:`minhash_dedup_pairs`). ``max_hamming=9`` holds candidate recall
    1.0 for J ≥ 0.8 pairs on the fixtures (ham ≤ 7 suffices; 9 is margin)
    while candidates stay ~10⁻³ of all pairs."""
    cand = _persist_generational(
        "simhash_cand",
        simhash_pairs(
            df, text_col, id_col, max_hamming=max_hamming,
            shingle_k=sim_shingle_k,
        ),
    )
    return verify_pairs(
        df, cand.select("id_a", "id_b"), text_col, id_col, shingle_k, threshold
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    shingle_k: int = 4,
) -> DataFrame:
    """64-bit SimHash fingerprints from character shingles.

    For each bit b: sign of Σ over shingles of ±1 depending on bit b of
    ``xxhash64(shingle)``. Built-ins only: aggregate over the shingle array.
    Near-dup detection = small Hamming distance between fingerprints.
    """
    # Shape mirrors minhash_signatures: explode shingle positions, hash each
    # ONCE, then 64 cheap conditional-sum aggregates (one per bit) with
    # map-side combine. bit_vector[b] = Σ ±1 by bit b of the shingle hash.
    # (SimHash classically weights by shingle frequency, so the multiset —
    # no distinct — is the right semantics here.)
    df = spread_input(df)
    exploded = df.select(
        F.col(id_col),
        F.col(text_col),
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.length(F.col(text_col)) - F.lit(shingle_k - 1), F.lit(1)),
            )
        ).alias("__i"),
    ).select(
        id_col,
        F.xxhash64(F.col(text_col).substr(F.col("__i"), F.lit(shingle_k))).alias("__h"),
    )
    bitsums = exploded.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"__b{b}")
            for b in range(bits)
        ]
    )
    fp = None
    for b in range(bits):
        term = F.when(
            F.col(f"__b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp.bitwiseXOR(term)
    return bitsums.select(F.col(id_col), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 64,
    shingle_k: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Blocking: split the 64-bit fingerprint into ``max_hamming+1`` bands — by
    pigeonhole, any pair within distance ``max_hamming`` agrees exactly on at
    least one band, so candidates are found with equi-joins (shuffle on the
    band value), never a cross join.
    """
    nbands = max_hamming + 1
    width = bits // nbands
    # persist: referenced by both sides of the band self-join below
    fps = _persist_generational(
        "simhash_fps", simhash(df, text_col, id_col, bits, shingle_k)
    )
    banded = fps.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(nbands - 1)),
                lambda b: F.call_function(
                    "shiftright", F.col("simhash"), b * F.lit(width)
                ).bitwiseAND(F.lit((1 << width) - 1)),
            )
        ).alias("band", "band_val"),
    )
    a = banded.select(
        "band", "band_val", F.col(id_col).alias("id_a"), F.col("simhash").alias("fp_a")
    )
    b = banded.select(
        "band", "band_val", F.col(id_col).alias("id_b"), F.col("simhash").alias("fp_b")
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
