"""Refresh-shuffle narrowing must be gated by source size (r9 verdict #1).

The r9 regression: ``_refresh_confs`` pinned ``spark.sql.shuffle.partitions=2``
+ AQE off unconditionally — an sf0.1-calibrated constant that DOUBLED the
x1000 dynamic warm refresh (A/B: 0.53s at width 8 vs 1.03s at width 2).
The fix gates narrowing on the summed on-disk bytes of the query's source
tables, knowable only for sources registered through
``register_parquet_view``; everything else keeps the session's own shuffle
settings and AQE coalescing — the plan that survives a 100× scale-up.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Tuple

import pytest

SF_DIR = os.environ.get("QC_TEST_SF_DIR", "/root/testdata/sf0.001")


@dataclass
class _FakeSpec:
    table: str
    tables: Tuple[str, ...] = ()


def test_narrow_ok_registered_small_source(qc_mem):
    # `events` is registered through register_parquet_view by conftest and
    # is far under the 64 MB default gate at sf0.001
    assert qc_mem._narrow_refresh_ok(_FakeSpec("events")) is True


def test_no_narrow_unregistered_source(spark, qc_mem):
    # a raw temp view (bench's x100/x1000 tables take this path) has no
    # registry entry — size unknowable, so the session settings stay
    spark.range(10).createOrReplaceTempView("qc_unregistered_v")
    assert qc_mem._narrow_refresh_ok(_FakeSpec("qc_unregistered_v")) is False


def test_no_narrow_over_byte_gate(qc_mem):
    qc_mem.config.refresh_narrow_max_bytes = 1  # everything is "too big"
    qc_mem._src_bytes_memo.clear()
    assert qc_mem._narrow_refresh_ok(_FakeSpec("events")) is False


def test_no_narrow_when_disabled(qc_mem):
    qc_mem.config.refresh_narrow_max_bytes = 0
    assert qc_mem._narrow_refresh_ok(_FakeSpec("events")) is False


def test_join_spec_sums_all_tables(qc_mem):
    # multi-table (star-join) spec: gate applies to the SUM of all sources
    spec = _FakeSpec("events", tables=("events", "nation"))
    assert qc_mem._narrow_refresh_ok(spec) is True
    ev = os.path.getsize(os.path.join(SF_DIR, "events.parquet"))
    qc_mem.config.refresh_narrow_max_bytes = ev + 1  # nation tips it over
    qc_mem._src_bytes_memo.clear()
    assert qc_mem._narrow_refresh_ok(spec) is False


def test_refresh_confs_scope(spark, qc_mem):
    """Inside a narrowed scope the confs are pinned; inside a non-narrowed
    scope (unregistered source) they are untouched; both restore."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    with qc_mem._refresh_confs(_FakeSpec("events")):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "2"
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe_before

    spark.range(10).createOrReplaceTempView("qc_unregistered_v2")
    with qc_mem._refresh_confs(_FakeSpec("qc_unregistered_v2")):
        assert spark.conf.get("spark.sql.shuffle.partitions") == before
        assert spark.conf.get("spark.sql.adaptive.enabled") == aqe_before


def test_strict_errors_mode_raises(spark, qc_mem, monkeypatch):
    """strict_errors (r9 ADVICE): an unexpected engine fault raises
    instead of silently degrading to passthrough."""
    qc_mem.config.strict_errors = True

    def boom(*a, **k):
        raise RuntimeError("injected engine fault")

    monkeypatch.setattr(qc_mem, "_plan_cached", boom)
    with pytest.raises(RuntimeError, match="injected engine fault"):
        qc_mem.sql("SELECT count(*) AS n FROM events")

    qc_mem.config.strict_errors = False
    out = qc_mem.sql("SELECT count(*) AS n FROM events")  # degrades
    assert out.collect()[0]["n"] > 0
    assert qc_mem.last_decision.cached is False
    assert "engine error" in (qc_mem.last_decision.reason or "")


def test_session_memos_bounded(spark, qc_mem):
    """Standing-session driver-memory hygiene: the spec/plan memos clear
    past _MEMO_MAX instead of growing with every distinct ad-hoc query."""
    qc_mem._MEMO_MAX = 5
    for i in range(12):
        qc_mem.sql(
            f"SELECT event_type, count(*) AS n FROM events "
            f"WHERE value > {i} GROUP BY 1"
        ).collect()
    assert len(qc_mem._spec_cache) <= 5
    assert len(qc_mem._plan_cache) <= 5
    # correctness unaffected by a memo clear: re-run an evicted shape
    out = qc_mem.sql(
        "SELECT event_type, count(*) AS n FROM events WHERE value > 0 GROUP BY 1"
    )
    assert out.count() > 0 and qc_mem.last_decision.cached
