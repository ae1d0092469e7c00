"""Incremental near-duplicate maintenance: a durable MinHash band index.

The batch pipeline (``dedup.minhash_dedup_pairs``) recomputes signatures and
all candidate pairs from scratch every run — O(corpus) per run. At 100 TB the
corpus is ingested continuously and re-scanning it per batch is the dominant
cost, so production dedup keeps an INDEX: per-doc MinHash signatures + their
LSH band keys, persisted once, and each ingest batch only

1. computes signatures for the NEW docs (``id > watermark`` — append-only
   contract, same watermark discipline as the aggregate cache),
2. joins the new docs' band keys against the FULL index (old ∪ new) — so
   every pair with at least one new member is found, and old–old pairs are
   already in the stored pair set,
3. verifies candidates exactly (n-gram Jaccard on the corpus text) and
   appends them to the durable pair set.

Invariant (the test/oracle contract): after any sequence of ``update()``
calls covering corpus C, ``pairs()`` equals the single-shot batch
``minhash_dedup_pairs(C)`` with the same parameters — incremental ingest is
a pure optimization, not an approximation.

Scale notes — per-update cost, made concrete (BENCH gate: an ingest must
beat the batch recompute it replaces):

- signatures + band keys are computed for NEW docs only; the stored docs'
  band keys are PERSISTED as index parts (~16 tiny int rows/doc) and only
  ever read — never recomputed from signatures (the r3 O(corpus) rescan).
- the ``max_bucket`` skew cap uses a MAINTAINED bucket-count table
  (band, band_hash, n): each ingest aggregates counts of the new keys
  (O(new)), folds them into the stored counts (a shuffle of pre-aggregated
  int triples, O(distinct buckets) — not the corpus key set), and filters
  the NEW side with an anti-join against the over-cap buckets (a small,
  typically broadcast-able frame). The index side needs no cap filter: an
  equi-join against a cap-filtered probe side produces nothing for over-cap
  buckets anyway.
- the candidate probe is one equi-join of O(new) keys against the stored
  band keys on (band, band_hash); on a real cluster, write the band parts
  with ``sources.bucketing.write_bucketed`` on that key to make the probe
  exchange-free on the index side.
- stored state is ~0.5 KB/doc of signatures + ~130 B/doc of band keys +
  the verified pair set and bucket counts.

Cap caveat (documented superset): if a band bucket crosses ``max_bucket``
ACROSS ingests, pairs persisted while it was under the cap are retained,
while a single-shot batch run would drop the whole bucket — ``pairs()`` is
then a superset of ``minhash_dedup_pairs(C)`` restricted to those buckets.
Retention is deliberate: verified true near-dup pairs are never discarded
because a bucket later became hot.

Reference framing: the reference caches aggregate state keyed by a watermark
(``src/aggregate.rs``); this applies the identical watermark/refresh
discipline to a similarity index instead of an aggregate.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import minhash_signatures, verify_pairs

_PAIR_SCHEMA = "id_a long, id_b long, jaccard double"
_COUNT_SCHEMA = "band int, band_hash long, n long"


class ConcurrentIndexWriter(RuntimeError):
    """Another writer committed to this index path since this instance last
    read or wrote its meta. Committing anyway would silently orphan that
    writer's ingested parts (this instance's part list doesn't include
    them) and delete parts the other writer's meta still references — so
    the commit is refused instead. The index is SINGLE-WRITER by contract
    (a streaming maintainer guarantees it by construction: one query, one
    foreachBatch at a time); on this error, ``reload()`` and re-run the
    ingest against the fresh state."""


def _band_keys(sigs: DataFrame, id_col: str, bands: int, rows: int) -> DataFrame:
    """(id, band, band_hash) keys from a signature frame — identical
    arithmetic to the batch path (``dedup.minhash_lsh_pairs``), so an
    incrementally-built index finds exactly the batch candidates."""
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.slice(F.col("minhash"), b * rows + 1, rows)),
            )
        ).alias("band", "band_hash"),
    )


class MinHashIndex:
    """Durable incremental MinHash/LSH near-dup index at ``path``.

    Layout: ``meta.json`` (watermark id, part lists, params) + one parquet
    dir per ingested signature/pair batch; meta is swapped atomically after
    parts are fully written (same crash contract as ``ParquetQueryCache``).

    Concurrency contract: ONE writer (the ingest job) at a time — meta is
    read-modify-write over the part list, so concurrent updaters could drop
    each other's parts. Readers are always safe (atomic meta swap). This is
    the standard single-maintainer shape of an ingest pipeline; serialize
    updates externally if multiple ingest jobs share one index. The
    contract is FENCED, not just documented: every commit stamps a fresh
    ``token`` into meta, and a commit whose instance last saw a different
    token raises :class:`ConcurrentIndexWriter` instead of clobbering
    (tested in tests/test_stream_dedup.py).
    """

    def __init__(
        self,
        path: str,
        threshold: float = 0.8,
        num_hashes: int = 64,
        shingle_k: int = 5,
        bands: int = 16,
        est_slack: float = 0.25,
        max_bucket: int = 1000,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        if num_hashes % bands:
            raise ValueError("num_hashes must divide evenly into bands")
        self.path = path
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.shingle_k = shingle_k
        self.bands = bands
        self.rows = num_hashes // bands
        self.est_slack = est_slack
        self.max_bucket = max_bucket
        self.text_col = text_col
        self.id_col = id_col
        os.makedirs(path, exist_ok=True)
        self._meta: Optional[dict] = None
        mp = os.path.join(path, "meta.json")
        if os.path.exists(mp):
            with open(mp) as f:
                self._meta = json.load(f)
            params = self._meta.get("params", {})
            mine = self._params()
            if params != mine:
                raise ValueError(
                    f"index at {path} was built with {params}, not {mine}"
                )
        # single-writer fence: the commit token this instance last saw
        # (None for a vacant index or pre-token meta)
        self._token: Optional[str] = (self._meta or {}).get("token")

    def _fence(self) -> None:
        """Raise :class:`ConcurrentIndexWriter` if meta on disk carries a
        different commit token than this instance last saw."""
        mp = os.path.join(self.path, "meta.json")
        if not os.path.exists(mp):
            return
        try:
            with open(mp) as f:
                disk_token = json.load(f).get("token")
        except (json.JSONDecodeError, OSError):
            return  # unreadable mid-swap: benign, writer holds the pen
        if disk_token != self._token:
            raise ConcurrentIndexWriter(
                f"index at {self.path}: meta was committed by another "
                "writer since this instance loaded it; reload() and "
                "re-run the ingest"
            )

    def vacuum(self, grace_s: float = 3600.0) -> List[str]:
        """Delete crash leftovers: part dirs the current meta no longer
        references (parts written before an interrupted commit, or dead
        parts whose post-swap deletion was cut short) and stale
        ``.meta-*.tmp`` files. Skips anything younger than ``grace_s`` so
        an in-flight commit's freshly-written parts are never raced;
        fenced like every write. Returns removed names."""
        import re as _re

        self._fence()
        live: set = set()
        meta = self._meta or {}
        for kind in ("sig_parts", "band_parts", "count_parts", "pair_parts"):
            live.update(meta.get(kind, []))
        removed: List[str] = []
        now = time.time()
        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            stale_tmp = name.startswith(".meta-") and name.endswith(".tmp")
            orphan = (
                _re.match(r"^(sigs|bands|counts|pairs)-", name) is not None
                and name not in live
                and os.path.isdir(full)
            )
            if not (stale_tmp or orphan):
                continue
            try:
                if now - os.path.getmtime(full) < grace_s:
                    continue
            except OSError:
                continue
            if orphan:
                shutil.rmtree(full, ignore_errors=True)
            else:
                try:
                    os.remove(full)
                except OSError:
                    continue
            removed.append(name)
        return removed

    def reload(self) -> None:
        """Re-read meta from disk — recovery step after
        :class:`ConcurrentIndexWriter` (adopts the other writer's commit;
        the next ``update`` ingests from ITS watermark)."""
        self._meta = None
        mp = os.path.join(self.path, "meta.json")
        if os.path.exists(mp):
            with open(mp) as f:
                self._meta = json.load(f)
        self._token = (self._meta or {}).get("token")

    def _params(self) -> dict:
        return {
            "threshold": self.threshold,
            "num_hashes": self.num_hashes,
            "shingle_k": self.shingle_k,
            "bands": self.bands,
            "est_slack": self.est_slack,
            "max_bucket": self.max_bucket,
        }

    @property
    def watermark_id(self) -> Optional[int]:
        return self._meta["watermark_id"] if self._meta else None

    def _parts(self, kind: str) -> List[str]:
        if not self._meta:
            return []
        return [os.path.join(self.path, p) for p in self._meta.get(kind, [])]

    def _read(self, spark: SparkSession, kind: str, schema=None) -> Optional[DataFrame]:
        parts = self._parts(kind)
        if not parts:
            return None
        rd = spark.read.schema(schema) if schema is not None else spark.read
        out = rd.parquet(parts[0])
        for p in parts[1:]:
            out = out.unionByName(rd.parquet(p))
        return out

    def signatures(self, spark: SparkSession) -> Optional[DataFrame]:
        return self._read(spark, "sig_parts")

    def _band_schema(self) -> str:
        return f"{self.id_col} long, band int, band_hash long"

    def band_keys(self, spark: SparkSession) -> Optional[DataFrame]:
        """Stored per-doc LSH band keys. Indexes written before band keys
        were persisted migrate transparently: recomputed from signatures
        here once, then stored as a part by the next ``update()``."""
        got = self._read(spark, "band_parts", self._band_schema())
        if got is None and self._meta is not None:
            sigs = self.signatures(spark)
            if sigs is not None:
                got = _band_keys(sigs, self.id_col, self.bands, self.rows)
        return got

    def bucket_counts(self, spark: SparkSession) -> Optional[DataFrame]:
        """Maintained (band, band_hash) → member count — the skew-cap input,
        folded incrementally instead of re-aggregated over the corpus."""
        got = self._read(spark, "count_parts", _COUNT_SCHEMA)
        if got is None and self._meta is not None:
            bk = self.band_keys(spark)
            if bk is not None:
                got = bk.groupBy("band", "band_hash").agg(
                    F.count(F.lit(1)).cast("long").alias("n")
                )
        return got

    def pairs(self, spark: SparkSession) -> DataFrame:
        """The maintained exact near-dup pair set (id_a < id_b, jaccard).

        Equals the single-shot batch pair set over the ingested corpus,
        EXCEPT for buckets that crossed ``max_bucket`` across ingests —
        pairs verified while the bucket was under the cap are retained
        (superset; see the module docstring's cap caveat).

        Tiny pair sets (≤ ``DRIVER_PAIRS_MAX_BYTES`` on disk — near-dup
        pairs are a vanishing fraction of any real corpus) return as a
        driver-read LocalRelation instead of a parquet scan job; big sets
        take the distributed read."""
        parts = self._parts("pair_parts")
        if not parts:
            return spark.createDataFrame([], _PAIR_SCHEMA)
        try:
            fps, total = [], 0
            for p in parts:
                for r, _d, fs in os.walk(p):
                    for f in fs:
                        if f.endswith(".parquet"):
                            fp = os.path.join(r, f)
                            total += os.path.getsize(fp)
                            fps.append(fp)
            if total <= self.DRIVER_PAIRS_MAX_BYTES:
                import pyarrow as pa
                import pyarrow.parquet as pq

                from ..cache import arrow_to_spark, dense_arrow

                tabs = [pq.read_table(f) for f in fps]
                tbl = (
                    pa.concat_tables(tabs) if len(tabs) > 1 else tabs[0]
                )
                return arrow_to_spark(spark, dense_arrow(tbl), _PAIR_SCHEMA)
        except Exception:
            pass
        got = self._read(spark, "pair_parts", _PAIR_SCHEMA)
        if got is None:
            return spark.createDataFrame([], _PAIR_SCHEMA)
        return got

    #: the driver (arrow) ingest tier handles batches/indexes up to these
    #: BYTE sizes (``docs × num_hashes × 8`` — the signature matrix is
    #: what the driver actually materializes, so the gate is dimensioned
    #: in bytes, not a row count that's blind to signature width):
    #: signatures+band hashes still come from ONE Spark job (so the
    #: hashes are bit-identical to the distributed path), but candidate
    #: generation, the estimate pre-filter, exact verification, and part
    #: writes run driver-side over the collected state — an ingest is ~3
    #: small Spark jobs instead of 5 jobs + 4 write commits. Past either
    #: cap the fully distributed path runs instead (identical semantics —
    #: the invariant tests exercise both). Same tiering pattern as
    #: _ParquetEntry.put's DRIVER_COLLECT_MAX_ROWS. At the default 64
    #: hashes the budgets admit ~100k-doc ingests / ~2M-doc indexes.
    DRIVER_INGEST_MAX_BYTES = 48 << 20
    DRIVER_INDEX_MAX_BYTES = 1 << 30
    #: pair sets at or under this ON-DISK size return as a LocalRelation
    #: (driver pyarrow read — no Spark scan job); larger sets scan
    DRIVER_PAIRS_MAX_BYTES = 8 << 20
    COMPACT_AT = 16

    def _sig_bytes(self, docs: int) -> int:
        return docs * self.num_hashes * 8

    def update(self, corpus: DataFrame) -> DataFrame:
        """Ingest every corpus row with ``id > watermark``; return the full
        maintained pair set afterwards. ``corpus`` must contain the already-
        indexed docs too (their text re-verifies mixed old/new candidates) —
        it is the standing table, not the delta."""
        spark = corpus.sparkSession
        # single-writer fence, checked BEFORE any state read: a stale
        # instance would otherwise read part paths another writer's commit
        # already garbage-collected (the commit-time fence alone fires too
        # late to protect those reads). Best-effort detection — the
        # contract remains one writer at a time; this turns a silent
        # clobber into an explicit error + reload() recovery.
        self._fence()
        wm = self.watermark_id
        new = corpus if wm is None else corpus.filter(F.col(self.id_col) > F.lit(wm))

        meta = self._meta or {}
        compact = len(meta.get("sig_parts", [])) + 1 > self.COMPACT_AT
        # the driver tier handles neither compaction nor the one-time
        # migration of a pre-band-part index (both fold corpus-sized state)
        migrate = self._meta is not None and not meta.get("band_parts")
        n_idx = meta.get("n_docs")
        small = self._meta is None or (
            n_idx is not None
            and self._sig_bytes(n_idx) <= self.DRIVER_INDEX_MAX_BYTES
        )
        if small and not compact and not migrate:
            # OPTIMISTIC driver tier: compute signatures + band hashes for
            # up to cap+1 new rows in ONE job and gate on the collected
            # row count — fusing the old separate max/count stats job into
            # the signature job (one fewer Spark job per steady-state
            # ingest; the stats job alone was ~0.2s of the O(new) path).
            cap_n = self.DRIVER_INGEST_MAX_BYTES // (self.num_hashes * 8)
            tbl = self._sig_band_arrow(new.limit(cap_n + 1))
            if tbl.num_rows == 0:
                return self.pairs(spark)  # nothing new: state answers
            if tbl.num_rows <= cap_n:
                ids = tbl.column(self.id_col)
                import pyarrow.compute as _pc

                hi = _pc.max(ids).as_py()
                return self._ingest_driver(
                    spark, corpus, tbl, int(hi), tbl.num_rows
                )
            # over the driver cap: fall through to the distributed tier
            # (rare — re-runs the stats job below on the full delta)
        stats = new.agg(
            F.max(self.id_col).alias("hi"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        hi, n_new = stats["hi"], int(stats["n"] or 0)
        if hi is None:
            return self.pairs(spark)  # nothing new: state already answers
        return self._ingest_distributed(spark, corpus, new, int(hi), n_new)

    def _gen_pairs(
        self,
        corpus: DataFrame,
        probe: DataFrame,
        b_side: DataFrame,
        sigs_all: DataFrame,
    ) -> DataFrame:
        """Candidates with ≥1 NEW member (probe keys × index keys within a
        band bucket) → signature-estimate pre-filter → exact verify. Shared
        by the driver and distributed paths — identical semantics."""
        a = probe.select(
            "band", "band_hash", F.col(self.id_col).alias("__n")
        )
        b = b_side.select(
            "band", "band_hash", F.col(self.id_col).alias("__o")
        )
        cand = (
            a.join(b, ["band", "band_hash"])
            .filter(F.col("__n") != F.col("__o"))
            .select(
                F.least("__n", "__o").alias("id_a"),
                F.greatest("__n", "__o").alias("id_b"),
            )
            .distinct()
        )
        sa = sigs_all.select(
            F.col(self.id_col).alias("id_a"), F.col("minhash").alias("sig_a")
        )
        sb = sigs_all.select(
            F.col(self.id_col).alias("id_b"), F.col("minhash").alias("sig_b")
        )
        est = (
            F.size(
                F.filter(
                    F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                    lambda m: m,
                )
            ).cast("double")
            / F.lit(float(self.num_hashes))
        )
        # persist: verify_pairs references the candidate set twice; without
        # the cache the band join + estimate would run twice
        cand = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(est >= F.lit(max(0.0, self.threshold - self.est_slack)))
            .select("id_a", "id_b")
        ).persist()
        return verify_pairs(
            corpus,
            cand,
            self.text_col,
            self.id_col,
            self.shingle_k,
            self.threshold,
        )

    def _read_pdf(self, kind: str):
        """Driver-side pyarrow read of a part list (gated small state)."""
        parts = self._parts(kind)
        if not parts:
            return None
        import pandas as pd
        import pyarrow.dataset as pads

        pdfs = [
            pads.dataset(
                p,
                format="parquet",
                ignore_prefixes=[".", "_SUCCESS", "_committed", "_started"],
            )
            .to_table()
            .to_pandas()
            for p in parts
        ]
        return pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]

    def _swap_meta(
        self,
        watermark_id: int,
        sig_parts: List[str],
        band_parts: List[str],
        count_parts: List[str],
        pair_parts: List[str],
        dead: List[str],
        n_docs: Optional[int],
    ) -> None:
        # single-writer fence: refuse to commit over a meta some OTHER
        # instance wrote since this one last loaded — a silent
        # last-write-wins here would orphan that writer's parts and delete
        # parts its meta still references
        self._fence()
        mp = os.path.join(self.path, "meta.json")
        meta = {
            "watermark_id": watermark_id,
            "sig_parts": sig_parts,
            "band_parts": band_parts,
            "count_parts": count_parts,
            "pair_parts": pair_parts,
            "n_docs": n_docs,
            "params": self._params(),
            "token": uuid.uuid4().hex,
        }
        tmp = os.path.join(self.path, f".meta-{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, mp)
        self._meta = meta
        self._token = meta["token"]
        for p in dead:
            shutil.rmtree(os.path.join(self.path, p), ignore_errors=True)

    def _sig_band_arrow(self, new: DataFrame):
        """Signatures + band hashes for the delta in ONE Spark job,
        collected through Arrow (bit-identical hashes to the distributed
        path)."""
        rows = self.rows
        sig_band = minhash_signatures(
            new, self.text_col, self.id_col, self.num_hashes,
            self.shingle_k, spread=False,
        ).select(
            F.col(self.id_col),
            F.col("minhash"),
            F.transform(
                F.sequence(F.lit(0), F.lit(self.bands - 1)),
                lambda bx: F.xxhash64(
                    F.slice(F.col("minhash"), bx * rows + 1, rows)
                ),
            ).alias("__bands"),
        )
        return sig_band.toArrow()

    def _ingest_driver(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        tbl,
        hi: int,
        n_new: int,
    ) -> DataFrame:
        """Driver-tier ingest (size-gated): takes the delta's pre-collected
        signature/band Arrow table (:meth:`_sig_band_arrow`); banding
        explode, count folding, skew cap, candidate merge, the
        signature-estimate pre-filter, exact character-shingle
        verification, and all part writes run driver-side. The only other
        Spark job fetches the candidate members' texts. Semantics equal
        the distributed path — ``test_incremental_dedup.py`` pins
        incremental ≡ batch across both tiers."""
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        pdf = tbl.to_pandas()
        ids = pdf[self.id_col].to_numpy()
        band_mat = (
            np.vstack(pdf["__bands"].to_numpy())
            if len(pdf)
            else np.empty((0, self.bands), dtype=np.int64)
        )
        band_pdf = pd.DataFrame(
            {
                self.id_col: np.repeat(ids, self.bands),
                "band": np.tile(np.arange(self.bands, dtype=np.int32), len(pdf)),
                "band_hash": band_mat.reshape(-1).astype(np.int64),
            }
        )

        # fold count deltas into the stored count table; cap-filter the
        # probe side only (see _ingest_distributed for why that suffices)
        new_counts = (
            band_pdf.groupby(["band", "band_hash"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        old_counts = self._read_pdf("count_parts")
        counts = (
            new_counts
            if old_counts is None
            else pd.concat([old_counts, new_counts])
            .groupby(["band", "band_hash"], as_index=False)["n"]
            .sum()
        )
        over = counts[counts["n"] > self.max_bucket][["band", "band_hash"]]
        if len(over):
            probe_pdf = band_pdf.merge(
                over, on=["band", "band_hash"], how="left", indicator=True
            )
            probe_pdf = probe_pdf[probe_pdf["_merge"] == "left_only"].drop(
                columns="_merge"
            )
        else:
            probe_pdf = band_pdf

        # candidates with ≥1 NEW member: probe × (old ∪ new) band keys
        old_band_pdf = self._read_pdf("band_parts")
        all_band_pdf = (
            band_pdf
            if old_band_pdf is None
            else pd.concat([band_pdf, old_band_pdf], ignore_index=True)
        )
        merged = probe_pdf.merge(
            all_band_pdf, on=["band", "band_hash"], suffixes=("_n", "_o")
        )
        na, no = f"{self.id_col}_n", f"{self.id_col}_o"
        merged = merged[merged[na] != merged[no]]
        cand = pd.DataFrame(
            {
                "id_a": np.minimum(merged[na], merged[no]),
                "id_b": np.maximum(merged[na], merged[no]),
            }
        ).drop_duplicates(ignore_index=True)

        # signature-estimate pre-filter (same arithmetic as _gen_pairs)
        old_sig_pdf = self._read_pdf("sig_parts")
        if old_sig_pdf is None:
            sig_ids, sig_rows = ids, pdf["minhash"].to_numpy()
        else:
            sig_ids = np.concatenate(
                [ids, old_sig_pdf[self.id_col].to_numpy()]
            )
            sig_rows = np.concatenate(
                [pdf["minhash"].to_numpy(), old_sig_pdf["minhash"].to_numpy()]
            )
        order = np.argsort(sig_ids)
        sig_ids_s = sig_ids[order]
        sig_mat = (
            np.vstack(sig_rows[order])
            if len(sig_rows)
            else np.empty((0, self.num_hashes), dtype=np.int64)
        )
        if len(cand):
            ia = np.searchsorted(sig_ids_s, cand["id_a"].to_numpy())
            ib = np.searchsorted(sig_ids_s, cand["id_b"].to_numpy())
            est = (sig_mat[ia] == sig_mat[ib]).mean(axis=1)
            cand = cand[est >= max(0.0, self.threshold - self.est_slack)]

        # exact verify: fetch the candidate members' texts (one small
        # Spark job) and intersect distinct character k-shingles — the
        # same definition verify_pairs evaluates JVM-side
        fresh_rows: list = []
        if len(cand):
            member = np.unique(
                np.concatenate([cand["id_a"].to_numpy(), cand["id_b"].to_numpy()])
            )
            mdf = spark.createDataFrame(
                pd.DataFrame({self.id_col: member}),
                schema=f"{self.id_col} long",
            )
            texts = {
                r[0]: r[1]
                for r in corpus.join(mdf, self.id_col)
                .select(self.id_col, self.text_col)
                .collect()
            }
            k = self.shingle_k

            def _shingle_set(t: str):
                m = max(len(t) - k + 1, 1)
                return {t[i : i + k] for i in range(m)}

            sh = {i: _shingle_set(texts[i]) for i in texts}
            for id_a, id_b in cand.itertuples(index=False):
                a, b = sh.get(int(id_a)), sh.get(int(id_b))
                if a is None or b is None:
                    continue  # member text absent from corpus: unverifiable
                c = len(a & b)
                j = c / (len(a) + len(b) - c)
                if j >= self.threshold:
                    fresh_rows.append((int(id_a), int(id_b), float(j)))
        fresh_pdf = pd.DataFrame(
            fresh_rows, columns=["id_a", "id_b", "jaccard"]
        )

        # pyarrow part writes (each part dir = one Spark-readable file)
        import pyarrow as pa

        def _write(t, dirname: str) -> None:
            p = os.path.join(self.path, dirname)
            os.makedirs(p, exist_ok=True)
            pq.write_table(t, os.path.join(p, "part-0.parquet"))

        sig_dir = f"sigs-{uuid.uuid4().hex[:12]}"
        band_dir = f"bands-{uuid.uuid4().hex[:12]}"
        cnt_dir = f"counts-{uuid.uuid4().hex[:12]}"
        pair_dir = f"pairs-{uuid.uuid4().hex[:12]}"
        _write(tbl.select([self.id_col, "minhash"]), sig_dir)
        _write(
            pa.table(
                {
                    self.id_col: band_pdf[self.id_col].to_numpy(),
                    "band": band_pdf["band"].to_numpy().astype(np.int32),
                    "band_hash": band_pdf["band_hash"].to_numpy(),
                }
            ),
            band_dir,
        )
        _write(
            pa.table(
                {
                    "band": counts["band"].to_numpy().astype(np.int32),
                    "band_hash": counts["band_hash"].to_numpy().astype(np.int64),
                    "n": counts["n"].to_numpy().astype(np.int64),
                }
            ),
            cnt_dir,
        )
        _write(
            pa.table(
                {
                    "id_a": fresh_pdf["id_a"].to_numpy().astype(np.int64),
                    "id_b": fresh_pdf["id_b"].to_numpy().astype(np.int64),
                    "jaccard": fresh_pdf["jaccard"].to_numpy().astype(np.float64),
                }
            ),
            pair_dir,
        )
        old_meta = self._meta or {}
        base = 0 if self._meta is None else old_meta.get("n_docs")
        self._swap_meta(
            hi,
            sig_parts=old_meta.get("sig_parts", []) + [sig_dir],
            band_parts=old_meta.get("band_parts", []) + [band_dir],
            count_parts=[cnt_dir],
            pair_parts=old_meta.get("pair_parts", []) + [pair_dir],
            dead=old_meta.get("count_parts", []),
            n_docs=None if base is None else base + n_new,
        )
        return self.pairs(spark)

    def _ingest_distributed(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        new: DataFrame,
        hi: int,
        n_new: int,
    ) -> DataFrame:
        """Fully distributed ingest (large batches/indexes, compaction,
        and pre-band-part migration)."""
        new_sigs = minhash_signatures(
            new, self.text_col, self.id_col, self.num_hashes,
            self.shingle_k, spread=False,
        ).persist()

        # O(new) banding: stored docs' keys come from the persisted band
        # parts, never recomputed from signatures (the r3 O(corpus) rescan)
        banded_new = _band_keys(
            new_sigs, self.id_col, self.bands, self.rows
        ).persist()
        old_sigs = self.signatures(spark)
        old_bands = self.band_keys(spark) if self._meta else None

        # skew cap over the FULL bucket (old ∪ new), but from MAINTAINED
        # counts: fold O(new) count deltas into the stored count table —
        # a shuffle of pre-aggregated int triples, not the corpus key set
        new_counts = banded_new.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        old_counts = self.bucket_counts(spark)
        counts = (
            new_counts
            if old_counts is None
            else old_counts.unionByName(new_counts)
            .groupBy("band", "band_hash")
            .agg(F.sum("n").alias("n"))
        ).persist()
        # cap-filter the NEW side only, via anti-join against the (few) hot
        # buckets — AQE broadcasts it. The index side needs no filter: an
        # equi-join against a cap-filtered probe side yields nothing for
        # over-cap buckets anyway, and batch drops exactly those buckets.
        over_cap = counts.filter(F.col("n") > self.max_bucket).select(
            "band", "band_hash"
        )
        probe = banded_new.join(over_cap, ["band", "band_hash"], "left_anti")

        b_side = (
            banded_new
            if old_bands is None
            else banded_new.unionByName(old_bands)
        )
        sigs_all = (
            new_sigs if old_sigs is None else new_sigs.unionByName(old_sigs)
        )
        fresh_pairs = self._gen_pairs(corpus, probe, b_side, sigs_all)

        pair_out = fresh_pairs.select(
            "id_a", "id_b", F.col("jaccard").cast("double").alias("jaccard")
        )

        # persist: new sig/band/pair parts (O(new) writes) + the folded
        # count table (always one compacted part — pre-aggregated triples),
        # then atomic meta swap. Past COMPACT_AT parts, fold everything into
        # one part instead — read fan-in stays bounded over any number of
        # ingests (same policy as the cache's row-set append).
        sig_dir = f"sigs-{uuid.uuid4().hex[:12]}"
        band_dir = f"bands-{uuid.uuid4().hex[:12]}"
        cnt_dir = f"counts-{uuid.uuid4().hex[:12]}"
        pair_dir = f"pairs-{uuid.uuid4().hex[:12]}"
        old_sig_parts = (self._meta or {}).get("sig_parts", [])
        old_band_parts = (self._meta or {}).get("band_parts", [])
        old_cnt_parts = (self._meta or {}).get("count_parts", [])
        old_pair_parts = (self._meta or {}).get("pair_parts", [])
        compact = len(old_sig_parts) + 1 > self.COMPACT_AT
        # pre-band-part index (migration): fold the recomputed old keys in
        fold_bands = compact or (self._meta is not None and not old_band_parts)

        sig_out = new_sigs if not compact or old_sigs is None else (
            new_sigs.unionByName(old_sigs)
        )
        sig_out.write.mode("overwrite").parquet(
            os.path.join(self.path, sig_dir)
        )
        band_out = banded_new if not fold_bands or old_bands is None else (
            banded_new.unionByName(old_bands)
        )
        band_out.write.mode("overwrite").parquet(
            os.path.join(self.path, band_dir)
        )
        counts.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.path, cnt_dir)
        )
        if compact:
            pair_out = pair_out.unionByName(
                self.pairs(spark).select("id_a", "id_b", "jaccard")
            )
        pair_out.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.path, pair_dir)
        )
        if compact:
            sig_parts, pair_parts = [sig_dir], [pair_dir]
        else:
            sig_parts = old_sig_parts + [sig_dir]
            pair_parts = old_pair_parts + [pair_dir]
        band_parts = [band_dir] if fold_bands else old_band_parts + [band_dir]
        dead = list(old_cnt_parts)
        if compact:
            dead += old_sig_parts + old_pair_parts
        if fold_bands:
            dead += old_band_parts
        new_sigs.unpersist()
        banded_new.unpersist()
        counts.unpersist()
        old_meta = self._meta or {}
        base = 0 if self._meta is None else old_meta.get("n_docs")
        self._swap_meta(
            int(hi),
            sig_parts=sig_parts,
            band_parts=band_parts,
            count_parts=[cnt_dir],
            pair_parts=pair_parts,
            dead=dead,
            n_docs=None if base is None else base + n_new,
        )
        return self.pairs(spark)

    def clear(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
        os.makedirs(self.path, exist_ok=True)
        self._meta = None
