"""Multimodal plumbing: schemas, batch shapes, determinism, stub gating."""

import numpy as np
import pytest

from search_engine_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synthesize_media,
    thumbnail_stats,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=30).cache()


def test_synthesis_deterministic(spark, media):
    a = {r.media_id: r.sha256 for r in media.collect()}
    b = {r.media_id: r.sha256 for r in synthesize_media(spark, n=30).collect()}
    assert a == b
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_shape(media):
    rows = extract_features(media, dim=8).collect()
    assert len(rows) == 30
    for r in rows:
        assert r.ok and len(r.feat) == 8 and r.n_bytes == 4096
        assert all(np.isfinite(v) for v in r.feat)


def test_features_deterministic(media):
    a = {r.media_id: tuple(r.feat) for r in extract_features(media).collect()}
    b = {r.media_id: tuple(r.feat) for r in extract_features(media).collect()}
    assert a == b


def test_thumbnail_only_images(media):
    rows = thumbnail_stats(media, thumb=4).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(rows) == n_images
    for r in rows:
        assert r.ok and r.thumb_w == 4 and len(r.thumb_mean) == 16
        assert all(0.0 <= v <= 255.0 for v in r.thumb_mean)


def test_thumbnail_stub_gates_on_missing_dims(spark):
    from pyspark.sql import functions as F

    bad = synthesize_media(spark, n=6).withColumn("width", F.lit(0))
    rows = thumbnail_stats(bad).collect()
    assert rows and all(not r.ok for r in rows)  # stub refusal surfaces as ok=False


def test_sample_frames_row_explosion(media):
    rows = sample_frames(media, every_ms=500).collect()
    vids = {r.media_id: r.duration_ms for r in media.filter("kind='video'").collect()}
    assert set(r.media_id for r in rows) == set(vids)
    for mid, dur in vids.items():
        got = sorted((r.frame_idx, r.frame_ms) for r in rows if r.media_id == mid)
        exp = [(k, ms) for k, ms in enumerate(range(0, dur, 500))]
        assert got == exp
        assert all(len(r.frame_feat) == 4 for r in rows if r.media_id == mid)


def test_sample_frames_short_payload(spark):
    """Payloads shorter than the 64-byte frame window are zero-padded and
    sampled (one full window at offset 0 per frame) — the fancy-index
    gather must not run past the buffer (ADVICE r3)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "media_id": [1, 2],
            "kind": ["video", "video"],
            "payload": [b"\xff" * 10, b"\x00"],  # 10- and 1-byte buffers
            "duration_ms": [1200, 600],
        }
    )
    df = spark.createDataFrame(pdf)
    rows = sample_frames(df, every_ms=500).collect()
    # 1200ms -> frames at 0/500/1000; 600ms -> 0/500
    assert sorted((r.media_id, r.frame_ms) for r in rows) == [
        (1, 0), (1, 500), (1, 1000), (2, 0), (2, 500),
    ]
    for r in rows:
        assert len(r.frame_feat) == 4
        assert all(np.isfinite(v) for v in r.frame_feat)
    # media 1: 10 bytes of 0xff then 54 zero bytes -> first 16-byte block
    # mean is (10*255)/16, the rest 0
    f1 = next(r.frame_feat for r in rows if r.media_id == 1)
    assert f1 == [10 * 255 / 16.0, 0.0, 0.0, 0.0]


def test_block_means_fast_and_fallback_agree():
    """The vectorized reshape-pool (divisible dims) and the linspace-grid
    fallback must agree bit-for-bit where both apply — integer pixel sums
    are exact in float64."""
    from search_engine_spark.operators.multimodal import _block_means

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    fast = _block_means(img, 8)
    ys = np.linspace(0, 48, 9, dtype=int)
    xs = np.linspace(0, 64, 9, dtype=int)
    slow = np.array(
        [img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean() for i in range(8) for j in range(8)],
        np.float64,
    )
    assert np.array_equal(fast, slow)
    # ragged shape exercises the fallback branch and stays finite
    ragged = _block_means(rng.integers(0, 256, size=(50, 61, 3), dtype=np.uint8), 8)
    assert ragged.shape == (64,) and np.isfinite(ragged).all()
