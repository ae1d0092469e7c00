"""Incremental benchmark decontamination: a durable contamination index.

The batch op (``textstats.contamination_scores``) re-shingles the whole
corpus per run — O(corpus) every time the benchmark set gains a release or
the corpus gains an ingest. A standing pipeline re-checks in BOTH
directions continuously, and both directions are mergeable state:

* a document's distinct shingle set is STATIC once ingested — store it
  once (``docsh`` parts: (id, sh), deduped);
* the benchmark membership set grows APPEND-ONLY — store its distinct
  shingles (``bench`` parts) behind a benchmark-id watermark.

Per-update cost (the bench contract: O(new) < batch recompute):

* ``update(docs=...)`` shingles ONLY rows above the doc watermark,
  scores them against the stored benchmark set (broadcast-sized in any
  real pipeline: benchmarks are tiny next to corpora), and appends their
  shingle sets + score rows. Old docs are untouched.
* ``update(benchmark=...)`` shingles ONLY benchmark rows above the
  benchmark watermark, anti-joins the already-stored membership set
  (so a shingle never double-counts across releases), probes the TRULY
  new shingles against the stored doc-shingle parts — a columnar scan of
  8-byte hashes / k-char strings, no text re-shingling — and appends the
  per-doc increments as delta score rows.

Tiering (the job-count floor, same pattern as
:class:`~.incremental_dedup.MinHashIndex`): a steady-state doc ingest is
ONE Spark job — the new docs' RAW (id, shingle) pairs collect through a
``limit(cap+1)``-bounded Arrow transfer (no Spark-side dedup shuffle —
a pyarrow ``group_by`` dedups 100k pairs in ~40 ms driver-side), and
the membership probe, score rows, part writes and watermark all run
driver-side over columnar buffers. Past the row cap (or a corpus-sized
stored side) the fully distributed path runs instead — identical
semantics, exercised by the same invariant tests. ``scores()`` returns
a fully-folded LocalRelation when the score parts are small on disk (no
scan job, no re-aggregation), mirroring ``MinHashIndex.pairs``.

``scores()`` folds score parts by doc: ``n_shingles`` arrives once with
the doc's ingest row (increments carry 0), ``n_contaminated`` sums —
deltas are disjoint by construction (new-shingle sets are anti-joined
against the stored membership), so the fold is exact, not approximate.

Invariant (test/oracle contract): after any interleaving of doc and
benchmark ingests covering corpus C and benchmark B, ``scores()`` equals
the single-shot ``contamination_scores(C, B)`` with the same parameters.

Durability/concurrency: parquet parts + atomic ``meta.json`` swap,
SINGLE writer fenced by a commit token
(:class:`~.incremental_dedup.ConcurrentIndexWriter` on a lost race).

Reference framing: the reference caches aggregate state behind a
watermark (``src/aggregate.rs``); this applies the identical
watermark/refresh discipline to a decontamination check.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .incremental_dedup import ConcurrentIndexWriter
from .textstats import char_shingles

_SCORE_SCHEMA = "doc_id long, n_shingles long, n_contaminated long"


class ContaminationIndex:
    """Durable incremental contamination index at ``path``.

    Layout: ``meta.json`` (watermarks, part lists, params, commit token)
    plus parquet part dirs per ingest: ``docsh-*`` (doc shingle sets),
    ``bench-*`` (benchmark membership deltas), ``score-*`` (score rows /
    increments).
    """

    #: fold score parts into one when the list grows past this — keeps
    #: the ``scores()`` read O(parts)-bounded on long-running pipelines
    COMPACT_AT = 16
    #: driver (Arrow) ingest tier: max distinct (id, shingle) rows pulled
    #: through the bounded collect per ingest (hashed rows are 16 B;
    #: raw k-char rows ~50 B → worst case ~75 MB)
    DRIVER_INGEST_MAX_ROWS = 1_500_000
    #: max ON-DISK bytes of a stored side (bench set / doc shingle sets)
    #: the driver tier will read locally; past it, distribute
    DRIVER_PARTS_MAX_BYTES = 256 << 20
    #: score parts at or under this on-disk size return as a
    #: LocalRelation from ``scores()`` (no Spark scan job)
    DRIVER_SCORES_MAX_BYTES = 8 << 20

    def __init__(
        self,
        path: str,
        k: int = 8,
        hashed: bool = False,
        text_col: str = "text",
        id_col: str = "doc_id",
        bench_id_col: str = "doc_id",
    ) -> None:
        self.path = path
        self.k = k
        self.hashed = hashed
        self.text_col = text_col
        self.id_col = id_col
        self.bench_id_col = bench_id_col
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
        self._token: Optional[str] = (self._meta or {}).get("token")

    # ------------------------------------------------------------- meta

    def _params(self) -> dict:
        return {"k": self.k, "hashed": self.hashed}

    def _sh_type(self) -> str:
        return "long" if self.hashed else "string"

    def _fence(self) -> None:
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
        self._meta = None
        mp = os.path.join(self.path, "meta.json")
        if os.path.exists(mp):
            with open(mp) as f:
                self._meta = json.load(f)
        self._token = (self._meta or {}).get("token")

    def _swap_meta(self, meta: dict) -> None:
        self._fence()
        meta["params"] = self._params()
        meta["token"] = uuid.uuid4().hex
        meta["written_at"] = time.time()
        tmp = os.path.join(self.path, f".meta-{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.path, "meta.json"))
        self._meta = meta
        self._token = meta["token"]

    @property
    def doc_watermark(self) -> Optional[int]:
        return (self._meta or {}).get("doc_watermark")

    @property
    def bench_watermark(self) -> Optional[int]:
        return (self._meta or {}).get("bench_watermark")

    # ------------------------------------------------------------ reads

    def _part_paths(self, meta: dict, kind: str) -> List[str]:
        return [os.path.join(self.path, p) for p in meta.get(kind, [])]

    def _part_files(self, meta: dict, kind: str):
        """(parquet file paths, total on-disk bytes) for a part kind."""
        fps, total = [], 0
        for p in self._part_paths(meta, kind):
            for r, _d, fs in os.walk(p):
                for f in fs:
                    if f.endswith(".parquet"):
                        fp = os.path.join(r, f)
                        total += os.path.getsize(fp)
                        fps.append(fp)
        return fps, total

    def _read_with(
        self, spark: SparkSession, meta: dict, kind: str, schema: str
    ) -> Optional[DataFrame]:
        parts = self._part_paths(meta, kind)
        if not parts:
            return None
        rd = spark.read.schema(schema)
        out = rd.parquet(parts[0])
        for p in parts[1:]:
            out = out.unionByName(rd.parquet(p))
        return out

    def _read_arrow(self, meta: dict, kind: str, max_bytes: int):
        """Local pyarrow read of a part kind, or None when over the byte
        gate (caller distributes) — empty parts give an empty table."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        fps, total = self._part_files(meta, kind)
        if total > max_bytes:
            return None
        if not fps:
            return pa.table({})
        tabs = [pq.read_table(f) for f in fps]
        return pa.concat_tables(tabs) if len(tabs) > 1 else tabs[0]

    def _doc_sh_schema(self) -> str:
        return f"{self.id_col} long, sh {self._sh_type()}"

    def benchmark_shingles(self, spark: SparkSession) -> Optional[DataFrame]:
        return self._read_with(
            spark, self._meta or {}, "bench_parts", f"sh {self._sh_type()}"
        )

    def doc_shingles(self, spark: SparkSession) -> Optional[DataFrame]:
        return self._read_with(
            spark, self._meta or {}, "docsh_parts", self._doc_sh_schema()
        )

    def scores(self, spark: SparkSession) -> DataFrame:
        """Per-doc ``(id, n_shingles, n_contaminated, contamination)`` —
        the same shape and values as the batch op over everything
        ingested so far. Small score sets fold driver-side and return as
        a LocalRelation (no scan job)."""
        meta = self._meta or {}
        if not meta.get("score_parts"):
            return spark.createDataFrame([], _SCORE_SCHEMA).select(
                F.col("doc_id").alias(self.id_col),
                "n_shingles",
                "n_contaminated",
                F.lit(0.0).alias("contamination"),
            )
        rows = None
        try:
            tbl = self._read_arrow(
                meta, "score_parts", self.DRIVER_SCORES_MAX_BYTES
            )
            if tbl is not None and tbl.num_rows:
                import pyarrow as pa
                import pyarrow.compute as pc

                from ..cache import arrow_to_spark, dense_arrow

                folded = tbl.group_by("doc_id").aggregate(
                    [("n_shingles", "sum"), ("n_contaminated", "sum")]
                ).rename_columns(
                    ["doc_id", "n_shingles", "n_contaminated"]
                )
                folded = pa.table(
                    {
                        "doc_id": folded.column("doc_id"),
                        "n_shingles": pc.cast(
                            folded.column("n_shingles"), pa.int64()
                        ),
                        "n_contaminated": pc.cast(
                            folded.column("n_contaminated"), pa.int64()
                        ),
                    }
                )
                # the fold is COMPLETE here — the LocalRelation needs no
                # Spark-side re-aggregation (an identity groupBy was
                # ~0.4s of scheduler cost per scores() read)
                rows = arrow_to_spark(
                    spark, dense_arrow(folded), _SCORE_SCHEMA
                )
        except Exception:
            rows = None
        if rows is None:
            rows = (
                self._read_with(spark, meta, "score_parts", _SCORE_SCHEMA)
                .groupBy("doc_id")
                .agg(
                    F.sum("n_shingles").cast("long").alias("n_shingles"),
                    F.sum("n_contaminated")
                    .cast("long")
                    .alias("n_contaminated"),
                )
            )
        return rows.select(
            F.col("doc_id").alias(self.id_col),
            "n_shingles",
            "n_contaminated",
            F.round(
                F.col("n_contaminated").cast("double")
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("contamination"),
        )

    # ----------------------------------------------------------- writes

    def _write_part(self, df: DataFrame, prefix: str) -> str:
        name = f"{prefix}-{uuid.uuid4().hex[:12]}"
        df.write.parquet(os.path.join(self.path, name))
        return name

    def _write_part_arrow(self, tbl, prefix: str) -> str:
        import pyarrow.parquet as pq

        name = f"{prefix}-{uuid.uuid4().hex[:12]}"
        d = os.path.join(self.path, name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl, os.path.join(d, "part-0.parquet"))
        return name

    def _shingles(self, df: DataFrame, id_col: str, keep_id: bool) -> DataFrame:
        # spread=False: ingest deltas are small BY DESIGN — the spread's
        # fixed exchange is pure overhead here (the same protective
        # guard minhash_signatures(spread=False) carries for the MinHash
        # ingest; r18 extends it to the contamination ingest alongside
        # the batch-side revert in contamination_scores)
        return char_shingles(
            df, self.text_col, id_col, self.k, self.hashed, keep_id,
            spread=False,
        )

    # ----------------------------------------------------------- ingest

    def update(
        self,
        docs: Optional[DataFrame] = None,
        benchmark: Optional[DataFrame] = None,
    ) -> DataFrame:
        """Ingest rows above the respective watermark from ``docs`` and/or
        ``benchmark`` (each the STANDING table, not a delta), then return
        the full maintained score frame.

        Order inside one call: the benchmark delta lands first (its truly
        new shingles increment the ALREADY-stored docs), then the doc
        delta scores against the full benchmark INCLUDING this call's
        release — together exactly the batch semantics over the unioned
        state."""
        if docs is None and benchmark is None:
            raise ValueError("update() needs docs and/or benchmark")
        spark = (docs if docs is not None else benchmark).sparkSession
        self._fence()
        meta = dict(self._meta or {})
        changed = False

        if benchmark is not None:
            wm = meta.get("bench_watermark")
            fresh = (
                benchmark
                if wm is None
                else benchmark.filter(F.col(self.bench_id_col) > F.lit(wm))
            )
            # the driver tier works on a LOCAL meta copy and its effects
            # are adopted only when every write succeeded: a mid-tier
            # failure must leave the distributed fallback a PRISTINE meta
            # (a half-appended bench part would anti-join the delta to
            # empty and silently drop the release's per-doc increments;
            # a half-appended docsh part would double-count — r15 ADVICE)
            done = False
            m2 = dict(meta)
            try:
                done, ch = self._ingest_bench_driver(spark, m2, fresh)
            except Exception:
                done = False
            if done:
                meta = m2
                changed = changed or ch
            else:
                changed = self._ingest_bench_distributed(
                    spark, meta, fresh
                ) or changed

        if docs is not None:
            wm = meta.get("doc_watermark")
            fresh = (
                docs
                if wm is None
                else docs.filter(F.col(self.id_col) > F.lit(wm))
            )
            done = False
            m2 = dict(meta)  # same atomic-adopt discipline as the bench tier
            try:
                done, ch = self._ingest_docs_driver(spark, m2, fresh)
            except Exception:
                done = False
            if done:
                meta = m2
                changed = changed or ch
            else:
                changed = self._ingest_docs_distributed(
                    spark, meta, fresh
                ) or changed

        if len(meta.get("score_parts", [])) > self.COMPACT_AT:
            folded = (
                self._read_with(spark, meta, "score_parts", _SCORE_SCHEMA)
                .groupBy("doc_id")
                .agg(
                    F.sum("n_shingles").cast("long").alias("n_shingles"),
                    F.sum("n_contaminated")
                    .cast("long")
                    .alias("n_contaminated"),
                )
            )
            cname = self._write_part(folded, "score")
            dead = meta.get("score_parts", [])
            meta["score_parts"] = [cname]
            self._swap_meta(meta)
            import shutil

            for p in dead:
                shutil.rmtree(os.path.join(self.path, p), ignore_errors=True)
            return self.scores(spark)

        if changed:
            self._swap_meta(meta)
        return self.scores(spark)

    # ------------------------------------------------- docs: driver tier

    def _ingest_docs_driver(self, spark, meta, fresh):
        """One-job ingest: bounded Arrow collect of the new docs' distinct
        (id, shingle) pairs; probe/score/write run driver-side. Returns
        (handled, changed) — handled=False defers to the distributed
        path."""
        import pyarrow as pa
        import pyarrow.compute as pc

        bench_tbl = self._read_arrow(
            meta, "bench_parts", self.DRIVER_PARTS_MAX_BYTES
        )
        if bench_tbl is None:
            return False, False  # benchmark side too big for local probe
        cap = self.DRIVER_INGEST_MAX_ROWS
        # collect RAW (id, shingle) pairs — no Spark-side dedup: the
        # (id, sh) groupBy added a shuffle stage (~0.3s/ingest) that a
        # 40 ms pyarrow group_by replaces driver-side
        raw = (
            self._shingles(fresh, self.id_col, keep_id=True)
            .limit(cap + 1)
            .toArrow()  # the ONE Spark job
        )
        if raw.num_rows > cap:
            return False, False
        if raw.num_rows == 0:
            return True, False  # nothing above the watermark
        tbl = raw.group_by([self.id_col, "sh"]).aggregate([])
        hi = pc.max(tbl.column(self.id_col)).as_py()
        if bench_tbl.num_rows:
            hits = pc.is_in(tbl.column("sh"), value_set=bench_tbl.column("sh"))
            hits = pc.fill_null(hits, False)
        else:
            hits = pa.array([False] * tbl.num_rows, type=pa.bool_())
        scored = (
            tbl.append_column("__hit", pc.cast(hits, pa.int64()))
            .group_by(self.id_col)
            .aggregate([("sh", "count"), ("__hit", "sum")])
            .rename_columns(["doc_id", "n_shingles", "n_contaminated"])
        )
        scored = scored.set_column(
            1, "n_shingles", pc.cast(scored.column("n_shingles"), pa.int64())
        ).set_column(
            2,
            "n_contaminated",
            pc.cast(scored.column("n_contaminated"), pa.int64()),
        )
        meta["docsh_parts"] = meta.get("docsh_parts", []) + [
            self._write_part_arrow(tbl, "docsh")
        ]
        meta["score_parts"] = meta.get("score_parts", []) + [
            self._write_part_arrow(scored, "score")
        ]
        meta["doc_watermark"] = int(hi)
        return True, True

    def _ingest_docs_distributed(self, spark, meta, fresh) -> bool:
        hi = fresh.agg(F.max(self.id_col).alias("hi")).collect()[0]["hi"]
        if hi is None:
            return False
        dsh = (
            self._shingles(fresh, self.id_col, keep_id=True)
            .groupBy(self.id_col, "sh")
            .agg(F.lit(1).alias("__one"))
            .select(self.id_col, "sh")
        )
        dname = self._write_part(dsh, "docsh")
        meta["docsh_parts"] = meta.get("docsh_parts", []) + [dname]
        meta["doc_watermark"] = int(hi)
        dsh_stored = spark.read.schema(self._doc_sh_schema()).parquet(
            os.path.join(self.path, dname)
        )
        bench_all = self._read_with(
            spark, meta, "bench_parts", f"sh {self._sh_type()}"
        )
        if bench_all is None:
            scored = dsh_stored.groupBy(
                F.col(self.id_col).alias("doc_id")
            ).agg(
                F.count(F.lit(1)).cast("long").alias("n_shingles"),
                F.lit(0).cast("long").alias("n_contaminated"),
            )
        else:
            scored = (
                dsh_stored.join(
                    bench_all.withColumn("__hit", F.lit(1)), ["sh"], "left"
                )
                .groupBy(F.col(self.id_col).alias("doc_id"))
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_shingles"),
                    F.coalesce(F.sum("__hit"), F.lit(0))
                    .cast("long")
                    .alias("n_contaminated"),
                )
            )
        meta["score_parts"] = meta.get("score_parts", []) + [
            self._write_part(scored, "score")
        ]
        return True

    # -------------------------------------------- benchmark: driver tier

    def _ingest_bench_driver(self, spark, meta, fresh):
        """One-job benchmark release: collect the release's distinct
        shingles (with per-shingle max id, so the watermark rides the
        same job), anti the stored membership locally, and compute the
        per-doc increments against locally-read doc-shingle parts.
        Returns (handled, changed)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        stored_b = self._read_arrow(
            meta, "bench_parts", self.DRIVER_PARTS_MAX_BYTES
        )
        docsh = self._read_arrow(
            meta, "docsh_parts", self.DRIVER_PARTS_MAX_BYTES
        )
        if stored_b is None or docsh is None:
            return False, False  # a stored side is too big: distribute
        cap = self.DRIVER_INGEST_MAX_ROWS
        raw = (
            self._shingles(fresh, self.bench_id_col, keep_id=True)
            .limit(cap + 1)
            .toArrow()  # raw pairs; distinct + max run driver-side
        )
        if raw.num_rows > cap:
            return False, False
        if raw.num_rows == 0:
            return True, False
        hi = pc.max(raw.column(self.bench_id_col)).as_py()
        sh = pc.unique(raw.column("sh").combine_chunks())
        if stored_b.num_rows:
            fresh_mask = pc.invert(
                pc.fill_null(
                    pc.is_in(sh, value_set=stored_b.column("sh")), False
                )
            )
            delta = sh.filter(fresh_mask)
        else:
            delta = sh
        meta["bench_watermark"] = int(hi)
        if len(delta) == 0:
            return True, True  # watermark advanced; membership unchanged
        meta["bench_parts"] = meta.get("bench_parts", []) + [
            self._write_part_arrow(pa.table({"sh": delta}), "bench")
        ]
        if docsh.num_rows:
            hits = pc.fill_null(
                pc.is_in(docsh.column("sh"), value_set=delta), False
            )
            inc = (
                docsh.filter(hits)
                .group_by(self.id_col)
                .aggregate([("sh", "count")])
                .rename_columns(["doc_id", "n_contaminated"])
            )
            if inc.num_rows:
                inc = inc.set_column(
                    1,
                    "n_contaminated",
                    pc.cast(inc.column("n_contaminated"), pa.int64()),
                ).append_column(
                    "n_shingles",
                    pa.array([0] * inc.num_rows, type=pa.int64()),
                ).select(["doc_id", "n_shingles", "n_contaminated"])
                meta["score_parts"] = meta.get("score_parts", []) + [
                    self._write_part_arrow(inc, "score")
                ]
        return True, True

    def _ingest_bench_distributed(self, spark, meta, fresh) -> bool:
        hi = fresh.agg(F.max(self.bench_id_col).alias("hi")).collect()[0][
            "hi"
        ]
        if hi is None:
            return False
        new_sh = self._shingles(
            fresh, self.bench_id_col, keep_id=False
        ).distinct()
        stored = self._read_with(
            spark, meta, "bench_parts", f"sh {self._sh_type()}"
        )
        if stored is not None:
            # a shingle that re-appears in a later release must not
            # double-count against docs already credited
            new_sh = new_sh.join(stored, ["sh"], "left_anti")
        bname = self._write_part(new_sh, "bench")
        meta["bench_parts"] = meta.get("bench_parts", []) + [bname]
        meta["bench_watermark"] = int(hi)
        dsh = self._read_with(
            spark, meta, "docsh_parts", self._doc_sh_schema()
        )
        if dsh is not None:
            delta = spark.read.schema(f"sh {self._sh_type()}").parquet(
                os.path.join(self.path, bname)
            )
            # increments for already-ingested docs: columnar probe of the
            # stored shingle sets, no text re-shingling; the delta is one
            # benchmark release — broadcast
            inc = (
                dsh.join(F.broadcast(delta), ["sh"])
                .groupBy(F.col(self.id_col).alias("doc_id"))
                .agg(
                    F.lit(0).cast("long").alias("n_shingles"),
                    F.count(F.lit(1)).cast("long").alias("n_contaminated"),
                )
            )
            meta["score_parts"] = meta.get("score_parts", []) + [
                self._write_part(inc, "score")
            ]
        return True
