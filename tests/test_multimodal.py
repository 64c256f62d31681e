"""Multimodal plumbing: schemas, mapInPandas batch shapes, partition
sizing, phash near-dup — with the deterministic fake decode."""

import pytest
from pyspark.sql import functions as F

from website_to_agent_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(6):
        payload = bytes([i % 251]) * (1024 * (i + 1))
        rows.append((f"img{i}", "image", "image/png", payload, {"src": f"s{i}"}))
    # a perceptual duplicate: identical payload, different id
    rows.append(("img_dup0", "image", "image/png", bytes([0]) * 1024, {"src": "d"}))
    for i in range(3):
        rows.append((f"aud{i}", "audio", "audio/wav",
                     bytes([i]) * (256 * (i + 2)), {}))
    return spark.createDataFrame(rows, mm.MEDIA).localCheckpoint(True)


def test_image_features_shape_and_determinism(spark, media):
    feats = mm.image_features(media).collect()
    assert len(feats) == 7
    by_id = {r.media_id: r for r in feats}
    assert by_id["img2"].n_bytes == 3 * 1024
    assert 64 <= by_id["img2"].width <= 1088
    assert len(by_id["img2"].embedding) == 8
    # identical payload ⇒ identical features
    assert by_id["img0"].phash == by_id["img_dup0"].phash
    # deterministic across runs
    again = {r.media_id: r.phash for r in mm.image_features(media).collect()}
    assert again == {r.media_id: r.phash for r in feats}


def test_audio_frame_sampling(spark, media):
    frames = mm.audio_frames(media).collect()
    # aud_i payload = 256*(i+2) bytes → i+2 frames
    counts = {}
    for r in frames:
        counts[r.media_id] = counts.get(r.media_id, 0) + 1
    assert counts == {"aud0": 2, "aud1": 3, "aud2": 4}
    assert all(0.0 <= r.rms <= 1.0 for r in frames)
    a0 = sorted((r.frame_idx, r.start_ms) for r in frames if r.media_id == "aud0")
    assert a0 == [(0, 0), (1, 1000)]


def test_media_repartition_bounds_partition_bytes(spark, media):
    out = mm.media_repartition(media, target_mb=1)
    assert out.rdd.getNumPartitions() >= 1
    assert out.count() == media.count()


def test_phash_near_dups(spark, media):
    feats = mm.image_features(media)
    pairs = {(r.a, r.b) for r in mm.near_dup_images(feats, max_hamming=0).collect()}
    assert ("img0", "img_dup0") in pairs


def test_strict_mode_raises(spark, media):
    # strict is captured in the kernel closure so it reaches executors
    with pytest.raises(Exception):
        mm.image_features(media, strict=True).collect()


def test_video_frame_sampling(spark):
    rows = [
        ("vid0", "video", "video/mp4", bytes([7]) * (4096 * 12), {}),
        ("vid1", "video", "video/mp4", bytes([9]) * (4096 * 3), {}),
        # duplicate content under a different id → identical frame phashes
        ("vid_dup0", "video", "video/mp4", bytes([7]) * (4096 * 12), {}),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA)
    frames = mm.video_frames(media, every_nth=5, fps=30).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    # 12 pseudo-frames sampled every 5th → idx 0,5,10
    assert sorted(r.frame_idx for r in by_id["vid0"]) == [0, 5, 10]
    assert sorted(r.frame_idx for r in by_id["vid1"]) == [0]
    assert {r.frame_idx: r.ts_ms for r in by_id["vid0"]}[5] == 166
    assert (
        sorted(r.phash for r in by_id["vid0"])
        == sorted(r.phash for r in by_id["vid_dup0"])
    )
    # frame-level near-dup via the same phash banding as images
    feats = mm.video_frames(media, every_nth=5).select(
        F.concat_ws(":", "media_id", "frame_idx").alias("media_id"), "phash"
    )
    pairs = {(r.a, r.b) for r in mm.near_dup_images(feats, max_hamming=0).collect()}
    assert ("vid0:0", "vid_dup0:0") in pairs


def test_video_strict_mode_raises(spark):
    media = spark.createDataFrame(
        [("v", "video", "video/mp4", b"x" * 4096, {})], mm.MEDIA
    )
    with pytest.raises(Exception):
        mm.video_frames(media, strict=True).collect()
