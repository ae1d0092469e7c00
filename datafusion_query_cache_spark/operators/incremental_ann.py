"""Incremental ANN maintenance: a durable IVF index over an embedding column.

Same watermark discipline as :mod:`.incremental_dedup` (and the aggregate
cache itself), applied to approximate-nearest-neighbor search:

- ``build``/first ``update`` trains the coarse quantizer (bounded-sample
  k-means, ``similarity.ivf_train``) and stores the centroids in the index
  metadata;
- each subsequent ``update`` assigns ONLY new vectors (``id > watermark``)
  to the fixed centroids and appends them as a parquet part PARTITIONED BY
  ``ivf_cell`` — the classic IVF layout mapped onto hive partitioning, so a
  probe reads only the ``nprobe`` matching cell directories
  (``PartitionFilters``), never the full corpus;
- ``topk`` picks probe cells driver-side against the tiny centroid table and
  runs exact cosine inside them.

Centroids are FROZEN after build (appends never retrain) — the standard IVF
deployment contract; call ``rebuild`` when drift warrants it. With
``nprobe >= len(centroids)`` the probe is exhaustive and the result provably
equals brute-force top-k — the oracle the driver checks. Drift policy: the
exhaustive probe stays exact under ANY drift (only narrow-probe recall
decays), so a maintainer should periodically sample narrow-probe recall
against an exhaustive probe and trigger ``rebuild`` below a floor (~0.9);
``tests/test_incremental_ann.py::test_recall_probe_under_drift_and_rebuild``
is the executable form of this policy.

Scale notes: per-update cost is O(new vectors) assignment (JVM-side argmin,
no UDF) + a partitioned write; probes read nprobe/k of the data before any
distance math. State is the vectors themselves laid out for pruning — the
index IS the table layout, nothing is duplicated.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import cosine, ivf_assign, ivf_train


class IVFIndex:
    """Durable incremental IVF index at ``path``.

    Concurrency contract: ONE writer at a time (read-modify-write part
    list); readers always safe (atomic meta swap) — same as
    :class:`..incremental_dedup.MinHashIndex`, and FENCED the same way:
    commits stamp a token, a stale instance raises
    :class:`..incremental_dedup.ConcurrentIndexWriter` instead of
    clobbering, ``reload()`` recovers, ``vacuum()`` collects crash
    leftovers."""

    def __init__(
        self,
        path: str,
        k_cells: int = 16,
        train_iters: int = 5,
        sample_rows: int = 100_000,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> None:
        self.path = path
        self.k_cells = k_cells
        self.train_iters = train_iters
        self.sample_rows = sample_rows
        self.vec_col = vec_col
        self.id_col = id_col
        os.makedirs(path, exist_ok=True)
        self._meta: Optional[dict] = None
        mp = os.path.join(path, "meta.json")
        if os.path.exists(mp):
            with open(mp) as f:
                self._meta = json.load(f)
            if self._meta.get("k_cells") != k_cells:
                raise ValueError(
                    f"index at {path} has k_cells={self._meta.get('k_cells')}, "
                    f"not {k_cells}"
                )
        self._token: Optional[str] = (self._meta or {}).get("token")

    def _fence(self) -> None:
        """Raise ConcurrentIndexWriter if meta on disk carries a different
        commit token than this instance last saw (same contract and
        rationale as MinHashIndex._fence)."""
        from .incremental_dedup import ConcurrentIndexWriter

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

    def reload(self) -> None:
        """Re-read meta from disk — recovery after ConcurrentIndexWriter."""
        self._meta = None
        mp = os.path.join(self.path, "meta.json")
        if os.path.exists(mp):
            with open(mp) as f:
                self._meta = json.load(f)
        self._token = (self._meta or {}).get("token")

    def vacuum(self, grace_s: float = 3600.0) -> List[str]:
        """Delete crash leftovers: ``cells-*`` dirs the current meta no
        longer references and stale ``.meta-*.tmp`` files; skips anything
        younger than ``grace_s`` (in-flight commit protection)."""
        import re as _re
        import time as _time

        self._fence()
        live = set((self._meta or {}).get("parts", []))
        removed: List[str] = []
        now = _time.time()
        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            stale_tmp = name.startswith(".meta-") and name.endswith(".tmp")
            orphan = (
                _re.match(r"^cells-", name) is not None
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

    @property
    def watermark_id(self) -> Optional[int]:
        return self._meta["watermark_id"] if self._meta else None

    @property
    def centroids(self) -> Optional[List[List[float]]]:
        return self._meta["centroids"] if self._meta else None

    def _parts(self) -> List[str]:
        if not self._meta:
            return []
        return [os.path.join(self.path, p) for p in self._meta["parts"]]

    def vectors(self, spark: SparkSession) -> Optional[DataFrame]:
        """The indexed vectors as (id, vec array<double>, ivf_cell) — each
        part is its own hive-partitioned root, so parts are read
        individually and unioned (cell pruning still applies per part)."""
        parts = self._parts()
        if not parts:
            return None
        out = spark.read.parquet(parts[0])
        for p in parts[1:]:
            out = out.unionByName(spark.read.parquet(p))
        return out

    def update(self, corpus: DataFrame) -> int:
        """Ingest every corpus row with ``id > watermark``. First call
        trains the centroids on the new batch. Returns rows ingested."""
        self._fence()  # before any stale-part read (see MinHashIndex)
        wm = self.watermark_id
        new = corpus if wm is None else corpus.filter(F.col(self.id_col) > F.lit(wm))
        if self._meta is None:
            cents = ivf_train(
                new, self.vec_col, self.k_cells, self.train_iters, self.sample_rows
            )
        else:
            cents = self._meta["centroids"]

        assigned = ivf_assign(new, cents, self.vec_col).select(
            F.col(self.id_col),
            F.col(self.vec_col).cast("array<double>").alias("vec"),
            "ivf_cell",
        )
        assigned = assigned.persist()
        agg = assigned.agg(
            F.max(self.id_col).alias("hi"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        if agg["hi"] is None:
            assigned.unpersist()
            return 0
        part = f"cells-{uuid.uuid4().hex[:12]}"
        old_parts = (self._meta or {}).get("parts", [])
        # fold all parts into one past the fan-in bound (same policy as the
        # cache's row-set append) — probes then list one root's cell dirs
        COMPACT_AT = 16
        compact = len(old_parts) + 1 > COMPACT_AT
        out = assigned
        if compact:
            prev = self.vectors(new.sparkSession)
            if prev is not None:
                out = out.unionByName(prev)
        # one task per live cell writes its directory (bounded files/cell)
        out.repartition(F.col("ivf_cell")).write.mode(
            "overwrite"
        ).partitionBy("ivf_cell").parquet(os.path.join(self.path, part))
        assigned.unpersist()
        self._fence()  # single-writer commit fence (token mismatch raises)
        meta = {
            "watermark_id": int(agg["hi"]),
            "centroids": [list(map(float, c)) for c in cents],
            "parts": [part] if compact else old_parts + [part],
            "k_cells": self.k_cells,
            "token": uuid.uuid4().hex,
        }
        tmp = os.path.join(self.path, f".meta-{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.path, "meta.json"))
        self._meta = meta
        self._token = meta["token"]
        if compact:
            for p in old_parts:
                shutil.rmtree(os.path.join(self.path, p), ignore_errors=True)
        return int(agg["n"])

    def topk(
        self,
        spark: SparkSession,
        query_vec: Sequence[float],
        k: int = 10,
        nprobe: int = 4,
    ) -> DataFrame:
        """Exact cosine top-k inside the ``nprobe`` cells nearest the query.
        ``nprobe >= k_cells`` ⇒ exhaustive ⇒ equals brute force."""
        if self._meta is None:
            raise ValueError("index is empty — call update() first")
        cents = self._meta["centroids"]

        def l2(a, b):
            return sum((x - y) * (x - y) for x, y in zip(a, b))

        order = sorted(range(len(cents)), key=lambda i: l2(query_vec, cents[i]))
        probe = order[: max(1, nprobe)]
        vecs = self.vectors(spark)
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        return (
            vecs.filter(F.col("ivf_cell").isin(probe))
            .select(
                F.col(self.id_col), cosine(F.col("vec"), q).alias("cosine")
            )
            .orderBy(F.col("cosine").desc(), F.col(self.id_col))
            .limit(k)
        )

    def rebuild(self, corpus: DataFrame) -> int:
        """Retrain centroids and re-ingest the full corpus (drift repair)."""
        shutil.rmtree(self.path, ignore_errors=True)
        os.makedirs(self.path, exist_ok=True)
        self._meta = None
        self._token = None
        return self.update(corpus)
