"""Multimodal plumbing: schema, Arrow batch shape, deterministic fake
features, frame-sample explosion, stub gating."""

from __future__ import annotations

import numpy as np
import pytest

from elastic_surv_spark.functions.multimodal import (
    extract_features,
    frame_sample_plan,
    synthetic_media_table,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media_table(spark, n=48).cache()


def test_feature_extraction_shape_and_determinism(spark, media):
    out = extract_features(media).toPandas().sort_values("media_id")
    assert len(out) == 48
    assert set(out.columns) == {"media_id", "kind", "features", "n_bytes"}
    assert all(len(f) == 8 for f in out.features)
    assert all(abs(sum(f) - 1.0) < 1e-6 for f in out.features)
    # deterministic across runs
    out2 = extract_features(media).toPandas().sort_values("media_id")
    assert all(
        np.allclose(a, b) for a, b in zip(out.features, out2.features)
    )


def test_real_decode_is_stubbed(spark, media):
    with pytest.raises(NotImplementedError):
        extract_features(media, fake_decode=False)


def test_frame_sample_plan(spark, media):
    frames = frame_sample_plan(media, every_ms=5000).toPandas()
    vids = media.filter("media.kind = 'video'").select("media_id", "media.duration_ms").toPandas()
    assert set(frames.media_id) == set(vids.media_id)
    for _, row in vids.iterrows():
        want = len(range(0, int(row.duration_ms), 5000))
        got = (frames.media_id == row.media_id).sum()
        assert got == want
