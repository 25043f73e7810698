"""Multimodal binary-column plumbing: schema, batch shape, stub codec,
quarantine semantics, determinism (driver-brief component)."""

import pytest
from pyspark.sql import functions as F

from sophia_rs_spark.operators.multimodal import (
    decode_asset,
    decode_assets,
    encode_fake_asset,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_assets,
)


@pytest.fixture(scope="module")
def assets(spark):
    df = synthesize_assets(spark, 60, partitions=4)
    df.cache().count()
    yield df
    df.unpersist()


def test_roundtrip_codec():
    p = encode_fake_asset(7, "img", 32, 24)
    kind, w, h, c, body = decode_asset(p)
    assert (kind, w, h, c) == ("img", 32, 24, 3)
    assert len(body) > 0
    # deterministic
    assert encode_fake_asset(7, "img", 32, 24) == p


def test_synthesize_schema_and_determinism(spark, assets):
    assert assets.count() == 60
    assert set(assets.columns) == {
        "asset_id", "kind", "payload", "width", "height", "channels", "n_bytes",
    }
    again = synthesize_assets(spark, 60, partitions=7)  # different partitioning
    a = sorted(tuple(r) for r in assets.collect())
    b = sorted(tuple(r) for r in again.collect())
    assert a == b


def test_decode_assets(assets):
    out = decode_assets(assets)
    rows = out.collect()
    assert len(rows) == 60
    assert all(r["error"] is None for r in rows)
    kinds = {r["kind"] for r in rows}
    assert kinds == {"img", "aud", "vid"}


def test_foreign_payload_quarantined(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG not really"))], "asset_id long, payload binary"
    )
    rows = decode_assets(df).collect()
    assert rows[0]["error"] is not None and "codec" in rows[0]["error"]


def test_extract_features_shape(assets):
    feats = extract_features(assets, dim=16)
    rows = feats.collect()
    assert all(len(r["feature"]) == 16 for r in rows if r["error"] is None)
    # normalized histogram
    s = sum(rows[0]["feature"])
    assert abs(s - 1.0) < 1e-6


def test_resize_images(assets):
    out = resize_images(assets, max_side=20)
    rows = out.collect()
    assert len(rows) == 20  # one third are images
    assert all(r["width"] <= 20 and r["height"] <= 20 for r in rows)
    # payload re-encoded with new dims
    k, w, h, c, _ = decode_asset(rows[0]["payload"])
    assert w == rows[0]["width"] and h == rows[0]["height"]


def test_sample_frames(assets):
    out = sample_frames(assets, every_n_bytes=128)
    rows = out.collect()
    assert len(rows) > 20  # multiple frames per video
    assert all(r["error"] is None for r in rows)
    per_asset = out.groupBy("asset_id").count().collect()
    assert all(r["count"] >= 1 for r in per_asset)
