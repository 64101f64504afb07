"""Multimodal plumbing tests: schema, batch shape, row cardinality, and
determinism of the mapInPandas operators (the codec itself is a
deterministic fake — the Spark-side contract is what's under test)."""

from __future__ import annotations

import pytest

from maillog2db_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return mm.documents_as_media(spark, SF).limit(50).cache()


def test_decode_schema_and_cardinality(spark, media):
    out = mm.decode_media(media)
    assert out.columns == ["doc_id", "media_type", "n_bytes", "width", "height", "n_frames", "ok"]
    rows = out.collect()
    assert len(rows) == media.count()  # 1:1
    assert all(r.ok for r in rows)
    assert all(16 <= r.width < 80 and 1 <= r.n_frames <= 8 for r in rows)


def test_decode_real_codec_is_explicitly_stubbed(media):
    with pytest.raises(NotImplementedError):
        mm.decode_media(media, real_codec=True)


def test_resize_bounds_payload(spark, media):
    out = mm.resize_media(media, width=8, height=8).collect()
    assert all(len(r.payload) == 64 and r.width == 8 for r in out)


def test_sample_frames_expands_rows(spark, media):
    decoded = {r.doc_id: r.n_frames for r in mm.decode_media(media).collect()}
    frames = mm.sample_frames(media, every_n=4).collect()
    # expected frames per doc: indices 0, 4 of range(n_frames) stepped by 4
    expected = sum(len(range(0, n, 4)) for n in decoded.values())
    assert len(frames) == expected
    assert all(f.frame_idx % 4 == 0 for f in frames)


def test_extract_features_deterministic_unit_mass(spark, media):
    out = mm.extract_features(media)
    rows = out.collect()
    assert all(len(r.features) == mm.FEATURE_DIM for r in rows)
    # histogram normalized by byte count → sums to ~1 for non-empty payloads
    for r in rows:
        assert abs(sum(r.features) - 1.0) < 1e-5
    # determinism across runs
    again = {r.doc_id: r.features for r in out.collect()}
    assert all(again[r.doc_id] == r.features for r in rows)
