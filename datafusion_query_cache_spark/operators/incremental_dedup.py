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

Scale notes: per-update cost is O(new docs) signatures + an equi-join of the
new band keys against the index (shuffled on (band, band_hash) — the index
side can be bucketed on that key to make the join co-located); stored state
is ~0.5 KB/doc of signatures + the verified pair set. The same ``max_bucket``
skew cap as the batch path bounds boilerplate buckets.

Reference framing: the reference caches aggregate state keyed by a watermark
(``src/aggregate.rs``); this applies the identical watermark/refresh
discipline to a similarity index instead of an aggregate.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import minhash_signatures, verify_pairs

_PAIR_SCHEMA = "id_a long, id_b long, jaccard double"


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
    updates externally if multiple ingest jobs share one index.
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

    def pairs(self, spark: SparkSession) -> DataFrame:
        """The maintained exact near-dup pair set (id_a < id_b, jaccard)."""
        got = self._read(spark, "pair_parts", _PAIR_SCHEMA)
        if got is None:
            return spark.createDataFrame([], _PAIR_SCHEMA)
        return got

    def update(self, corpus: DataFrame) -> DataFrame:
        """Ingest every corpus row with ``id > watermark``; return the full
        maintained pair set afterwards. ``corpus`` must contain the already-
        indexed docs too (their text re-verifies mixed old/new candidates) —
        it is the standing table, not the delta."""
        spark = corpus.sparkSession
        wm = self.watermark_id
        new = corpus if wm is None else corpus.filter(F.col(self.id_col) > F.lit(wm))

        new_sigs = minhash_signatures(
            new, self.text_col, self.id_col, self.num_hashes, self.shingle_k
        ).persist()
        hi = new_sigs.agg(F.max(self.id_col)).collect()[0][0]
        if hi is None:
            new_sigs.unpersist()
            return self.pairs(spark)  # nothing new: state already answers

        banded_new = _band_keys(new_sigs, self.id_col, self.bands, self.rows)
        old_sigs = self.signatures(spark)
        if old_sigs is not None:
            banded_all = banded_new.unionByName(
                _band_keys(old_sigs, self.id_col, self.bands, self.rows)
            )
        else:
            banded_all = banded_new

        # skew cap over the FULL bucket (old ∪ new) — same bound the batch
        # path applies, so incremental == batch even on capped buckets
        sizes = banded_all.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).alias("n")
        )
        ok = sizes.filter(F.col("n") <= self.max_bucket).drop("n")
        banded_all = banded_all.join(ok, ["band", "band_hash"])
        banded_new = banded_new.join(ok, ["band", "band_hash"])

        # candidates with ≥1 NEW member: new keys × all keys; normalize to
        # id_a < id_b; ids only through the distinct (16-byte shuffle)
        a = banded_new.select(
            "band", "band_hash", F.col(self.id_col).alias("__n")
        )
        b = banded_all.select(
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

        # estimate pre-filter on signatures (old ∪ new), then exact verify
        sigs_all = (
            new_sigs if old_sigs is None else new_sigs.unionByName(old_sigs)
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
        cand = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(est >= F.lit(max(0.0, self.threshold - self.est_slack)))
            .select("id_a", "id_b")
        )
        fresh_pairs = verify_pairs(
            corpus,
            cand,
            self.text_col,
            self.id_col,
            self.shingle_k,
            self.threshold,
        )

        # persist: new sig part + new pair part, then atomic meta swap.
        # Past COMPACT_AT parts, fold everything into one part instead —
        # read fan-in stays bounded over any number of ingests (same policy
        # as the cache's row-set append).
        COMPACT_AT = 16
        sig_dir = f"sigs-{uuid.uuid4().hex[:12]}"
        pair_dir = f"pairs-{uuid.uuid4().hex[:12]}"
        old_sig_parts = (self._meta or {}).get("sig_parts", [])
        old_pair_parts = (self._meta or {}).get("pair_parts", [])
        compact = len(old_sig_parts) + 1 > COMPACT_AT

        sig_out = new_sigs if not compact or old_sigs is None else (
            new_sigs.unionByName(old_sigs)
        )
        sig_out.write.mode("overwrite").parquet(os.path.join(self.path, sig_dir))
        pair_out = fresh_pairs.select(
            "id_a", "id_b", F.col("jaccard").cast("double").alias("jaccard")
        )
        if compact:
            pair_out = pair_out.unionByName(
                self.pairs(spark).select("id_a", "id_b", "jaccard")
            )
        pair_out.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.path, pair_dir)
        )
        new_sigs.unpersist()
        if compact:
            sig_parts, pair_parts = [sig_dir], [pair_dir]
        else:
            sig_parts = old_sig_parts + [sig_dir]
            pair_parts = old_pair_parts + [pair_dir]
        meta = {
            "watermark_id": int(hi),
            "sig_parts": sig_parts,
            "pair_parts": pair_parts,
            "params": self._params(),
        }
        tmp = os.path.join(self.path, f".meta-{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.path, "meta.json"))
        self._meta = meta
        if compact:
            for p in old_sig_parts + old_pair_parts:
                shutil.rmtree(os.path.join(self.path, p), ignore_errors=True)
        return self.pairs(spark)

    def clear(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
        os.makedirs(self.path, exist_ok=True)
        self._meta = None
