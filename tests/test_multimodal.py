"""Multimodal plumbing: resize, frame sampling, media→embedding near-dup
composition.  Decode kernels are deterministic fakes (codecs absent in
this environment) — what's under test is the Spark-side machinery:
schemas, fan-out shapes, bounded batches, determinism, and the gated
NotImplementedError on the real path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tsforge_spark.operators.multimodal import (
    make_fake_media,
    media_embedding_neardup,
    resize_image,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return make_fake_media(spark, n=45, seed=11).cache()


def test_resize_fixed_shape_and_determinism(spark, media):
    out = resize_image(media, width=16, height=8, fake=True).toPandas()
    assert len(out) == 45
    assert (out["payload"].map(len) == 16 * 8).all()
    assert (out["width"] == 16).all() and (out["height"] == 8).all()
    again = resize_image(media, width=16, height=8, fake=True).toPandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = again.sort_values("media_id").reset_index(drop=True)
    assert (a["payload"] == b["payload"]).all()


def test_resize_real_path_is_gated(spark, media):
    with pytest.raises(Exception) as ei:
        resize_image(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sampling_fanout(spark, media):
    frames = sample_video_frames(media, every_ms=500, frame_bytes=64, fake=True)
    pdf = frames.toPandas()
    meta = media.select("media_id", "kind", "duration_ms").toPandas()
    with_dur = meta[meta["duration_ms"].notna()]
    # every media row with a duration fans out to duration//500 (min 1)
    want = int(
        with_dur["duration_ms"].map(lambda d: max(int(d) // 500, 1)).sum()
    )
    assert len(pdf) == want
    # image rows (no duration) produce no frames
    img_ids = set(meta[meta["duration_ms"].isna()]["media_id"])
    assert not (set(pdf["media_id"]) & img_ids)
    assert (pdf["frame"].map(len) <= 64).all()
    assert (pdf["ts_ms"] == pdf["frame_idx"] * 500).all()


def test_media_embedding_neardup_composition(spark, media):
    pairs = media_embedding_neardup(
        media, dim=8, k_cells=4, threshold=0.2, fake=True
    ).toPandas()
    # pairs are ordered, within the id domain, and pass the threshold
    assert (pairs["id_a"] < pairs["id_b"]).all()
    ids = set(range(45))
    assert set(pairs["id_a"]).issubset(ids) and set(pairs["id_b"]).issubset(ids)
    assert (pairs["cosine"] >= 0.2).all()
    # deterministic across runs
    again = media_embedding_neardup(
        media, dim=8, k_cells=4, threshold=0.2, fake=True
    ).toPandas()
    key = ["id_a", "id_b"]
    assert sorted(map(tuple, pairs[key].values.tolist())) == sorted(
        map(tuple, again[key].values.tolist())
    )


def test_decoder_seam_injection(spark, media):
    """A deployment-injected decode_fn drives the NON-fake path with no
    engine change — the pluggable seam (_resolve_decoder)."""
    from tsforge_spark.operators.multimodal import decode_image_features

    def my_decoder(payload):
        import numpy as np

        b = np.frombuffer(payload, dtype=np.uint8)
        # a "real" codec stand-in with a different contract than the
        # fake: first-4 / last-4 byte means
        return np.array(
            [b[:4].mean(), b[-4:].mean()], dtype=np.float32
        )

    out = decode_image_features(media, decode_fn=my_decoder).toPandas()
    assert len(out) == 45
    assert (out["feature"].map(len) == 2).all()
    # and the resize / frame seams accept injections too
    rz = resize_image(
        media, width=4, height=4,
        decode_fn=lambda p, w, h: bytes(w * h),
    ).toPandas()
    assert (rz["payload"].map(len) == 16).all()
    fr = sample_video_frames(
        media, every_ms=1000,
        decode_fn=lambda p, dur, every, fb: [b"x"] * max(dur // every, 1),
    ).toPandas()
    assert (fr["frame"] == b"x").all()


def test_decoder_seam_fails_fast_on_driver(spark, media):
    """Neither decode_fn nor fake → NotImplementedError at PLAN BUILD
    (driver), not from inside an executor UDF."""
    from tsforge_spark.operators.multimodal import decode_image_features

    with pytest.raises(NotImplementedError):
        decode_image_features(media)  # no .collect() needed
    with pytest.raises(NotImplementedError):
        sample_video_frames(media)
