"""Multimodal plumbing tests: binary columns, mapInPandas batch shapes,
metadata-only pruning."""

from __future__ import annotations

from pyspark.sql import functions as F


def media(spark):
    from datafusion_query_cache_spark.operators.multimodal import synthesize_media

    return synthesize_media(spark, spark.table("documents"))


def test_synthesized_media_schema(spark):
    m = media(spark)
    assert [f.name for f in m.schema.fields] == ["media_id", "data", "meta"]
    assert m.schema["data"].dataType.typeName() == "binary"
    r = m.first()
    assert isinstance(r["data"], bytearray) or isinstance(r["data"], bytes)
    assert r["meta"]["format"] == "fake/raw"


def test_extract_features_batch_shape(spark):
    from datafusion_query_cache_spark.operators.multimodal import extract_features

    out = extract_features(media(spark), n_features=8)
    rows = out.collect()
    assert len(rows) == spark.table("documents").count()
    for r in rows[:5]:
        assert len(r["features"]) == 8
        assert abs(sum(r["features"]) - 1.0) < 1e-3  # histogram normalized
        assert r["n_bytes"] > 0


def test_resize_deterministic_and_metadata(spark):
    from datafusion_query_cache_spark.operators.multimodal import resize_images

    out = resize_images(media(spark), width=16, height=16).collect()
    out2 = resize_images(media(spark), width=16, height=16).collect()
    a = {r["media_id"]: bytes(r["data"]) for r in out}
    b = {r["media_id"]: bytes(r["data"]) for r in out2}
    assert a == b  # deterministic fake decode
    for r in out[:5]:
        assert len(r["data"]) <= 16 * 16
        assert r["meta"]["width"] == 16 and r["meta"]["format"] == "fake/resized"


def test_metadata_only_ops_do_not_touch_blobs(spark):
    """Filtering by metadata must prune the binary column from the scan —
    at 100 TB this is reading KBs instead of the media itself."""
    import tempfile

    m = media(spark)
    path = tempfile.mkdtemp() + "/media"
    m.write.parquet(path)
    back = spark.read.parquet(path)
    q = back.filter(F.col("meta.width") > 100).select("media_id", "meta.width")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "data" not in [
        c.split("#")[0]
        for part in plan.split("ReadSchema: ")[1:2]
        for c in part.split(",")
    ] or "data" not in plan.split("ReadSchema:")[1][:200]
    assert q.count() > 0


def test_frame_sample_plan(spark):
    from datafusion_query_cache_spark.operators.multimodal import frame_sample_plan

    frames = frame_sample_plan(media(spark), every_n=1)
    assert frames.count() >= spark.table("documents").count()
    assert frames.schema["frame_idx"].dataType.typeName() == "integer"


def test_codec_probe_documents_swap_path(spark):
    """The one-line exit criterion for the multimodal operators'
    'partial' status: when PIL becomes importable, codec_available()
    flips True and the real decode path is expected to replace the
    deterministic fake WITHOUT any Spark-side change (schemas, batch
    shapes and partitioning are pinned by the other tests in this
    file). In this container PIL is absent, so the probe must be False
    and the fake path must stay deterministic."""
    from datafusion_query_cache_spark.operators.multimodal import (
        _fake_decode_features,
        codec_available,
    )

    if codec_available():
        import PIL  # noqa: F401  — real codec present: swap-in is live

        return  # nothing to assert: the fake path is no longer the story
    # env-blocked: the fake decode must be a pure function of the bytes
    assert _fake_decode_features(b"spark") == _fake_decode_features(b"spark")
    assert _fake_decode_features(None) == [0.0] * 8
