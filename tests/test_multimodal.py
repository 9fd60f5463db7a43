"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
determinism, fan-out, and the explicit decode stub."""

import hashlib

import pytest

from pyperustats_spark.multimodal import binary_ops as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.synthesize_media(spark, n=48).repartition(4).cache()


def test_media_schema(media):
    assert media.schema == MM.MEDIA_SCHEMA
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == set(MM.MEDIA_KINDS)


def test_extract_features_deterministic(media):
    a = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    b = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert len(a) == 48
    for mid, row in a.items():
        assert row["feature"] == b[mid]["feature"]
        assert len(row["feature"]) == 8
        assert all(0.0 <= x < 1.0 for x in row["feature"])
        assert row["n_bytes"] > 0
        assert 0.0 < row["byte_entropy_proxy"] <= 1.0


def test_extract_features_matches_local_hash(media):
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    feats = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    for mid, payload in payloads.items():
        assert feats[mid]["sha256"] == hashlib.sha256(payload).hexdigest()
        assert feats[mid]["feature"] == pytest.approx(MM.fake_decode(payload))


def test_frame_sample_fanout(media):
    frames = MM.frame_sample(media, every_n_bytes=128, max_frames=4).collect()
    n_videos = media.where("kind = 'video'").count()
    assert n_videos > 0
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id) == n_videos
    for rows in by_id.values():
        assert 1 <= len(rows) <= 4
        assert [r["frame_idx"] for r in sorted(rows, key=lambda x: x["frame_idx"])] == list(
            range(len(rows))
        )
        assert all(len(r["frame_payload"]) <= 128 for r in rows)


def test_resize_updates_image_meta_only(media):
    out = {r["media_id"]: r for r in MM.resize_stub(media, 32, 32).collect()}
    for r in media.collect():
        m = out[r["media_id"]]["meta"]
        if r["kind"] == "image":
            assert (m["width"], m["height"]) == (32, 32)
            assert m["codec"] == r["meta"]["codec"]
        else:
            assert m == r["meta"]


def test_media_stats(media):
    rows = {r["kind"]: r for r in MM.media_stats(media).collect()}
    assert set(rows) == set(MM.MEDIA_KINDS)
    assert all(r["n"] == 16 for r in rows.values())


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"\x89PNG", "image", "png")
