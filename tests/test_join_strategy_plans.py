"""Pin the join strategies the engine relies on under
``spark.sql.join.preferSortMergeJoin=false`` (r17 opt, sources/tables.py).

The conf lets the planner pick a shuffled hash join when the build side
fits its size conditions — the verified qc_fo_x1000_plain win (no 100M-row
sort for the FULL OUTER). The risk the r17 verdict flagged: SHJ's build
map cannot spill the way SMJ does, so a Spark upgrade or a stats change
silently flipping a BIG-build join to SHJ is an OOM hazard at scale.
These tests pin both directions:

* a FULL OUTER with a small build side must plan as ShuffledHashJoin
  (the r17 speedup stays);
* a join of two LARGE, similar-sized sides must STAY SortMergeJoin
  (the planner's size conditions still protect big builds).

Escape hatch: QC_PREFER_SORT_MERGE_JOIN=true restores the Spark default
session-wide (documented in sources/tables.py; exercised here).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_full_outer_small_build_uses_shuffled_hash(spark):
    # the qc_fo_x1000_plain shape: big fact FULL JOIN much-smaller dim.
    # FULL OUTER cannot broadcast either side, so the choice is SMJ vs
    # SHJ; with preferSortMergeJoin=false and a build side that (a) fits
    # a local hash map (< partitions x autoBroadcastJoinThreshold) and
    # (b) is 3x smaller than the other side, the planner must pick the
    # sort-free shuffled hash join. spark.range carries exact size stats
    # (8 bytes/row), making the pin independent of test-data layout:
    # fact ~256 MB, dim ~8 MB — the same ratio regime as the bench's
    # 100M-row fact x 15k-row dim.
    fact = spark.range(1 << 25).select(F.col("id").alias("k"))
    dim = spark.range(1 << 20).select(F.col("id").alias("k"))
    plan = _executed_plan(fact.join(dim, "k", "full"))
    assert "ShuffledHashJoin" in plan and "FullOuter" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_big_build_joins_stay_sort_merge(spark):
    # two large, similar-sized sides: neither qualifies as a safe hash
    # build (canBuildLocalHashMap requires size < partitions x
    # autoBroadcastJoinThreshold; muchSmaller requires a 3x gap). The
    # planner must keep the spill-safe sort-merge join. spark.range
    # carries exact size stats (8 bytes/row), so this pin is stable
    # across data layouts: 2^30 rows ~ 8 GB per side >> 32 x 10 MB.
    a = spark.range(1 << 30).select(F.col("id").alias("k"))
    b = spark.range(1 << 30).select(F.col("id").alias("k"))
    plan = _executed_plan(a.join(b, "k"))
    assert "SortMergeJoin" in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_prefer_smj_escape_hatch_restores_default(spark):
    # QC_PREFER_SORT_MERGE_JOIN=true is honored at session build time;
    # on a live session the same conf flips the planner back — exercise
    # the conf itself so the escape hatch can't rot.
    key = "spark.sql.join.preferSortMergeJoin"
    assert spark.conf.get(key) == "false"  # the engine default
    try:
        spark.conf.set(key, "true")
        df = spark.sql(
            "SELECT count(*) FROM events FULL JOIN customer "
            "ON user_id = c_custkey"
        )
        plan = _executed_plan(df)
        assert "SortMergeJoin" in plan and "ShuffledHashJoin" not in plan
    finally:
        spark.conf.set(key, "false")
