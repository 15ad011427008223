"""Multimodal binary plumbing: resize and frame-sample stages.

The codecs are deterministic fakes (no image/video libraries in the
container — the strict path marks the integration point); what these tests
pin is the Spark-side contract a real codec would inherit: schemas, Arrow
batch shapes, 1→N frame explosion bounds, and payload-size invariants.
"""

from __future__ import annotations

import pytest

from oss_data_lake_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    resize_media,
    sample_frames,
)
from oss_data_lake_spark.sources.loaders import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return documents_as_media(load_table(spark, sf_dir, "documents"))


def test_resize_output_is_exactly_target_size(spark, media):
    out = resize_media(media.limit(50), width=8, height=8)
    rows = out.collect()
    assert len(rows) == 50
    assert out.columns == ["doc_id", "media", "width", "height", "orig_bytes"]
    for r in rows:
        assert len(r.media) == 64
        assert (r.width, r.height) == (8, 8)
        assert r.orig_bytes > 0


def test_resize_deterministic_and_content_derived(spark, media):
    a = {r.doc_id: bytes(r.media) for r in resize_media(media.limit(20)).collect()}
    b = {r.doc_id: bytes(r.media) for r in resize_media(media.limit(20)).collect()}
    assert a == b
    assert len(set(a.values())) > 1  # payload-derived, not constant


def test_resize_strict_marks_integration_point(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        resize_media(media.limit(1), resizer="strict").collect()


def test_frame_sampling_bounds_and_offsets(spark, media):
    out = sample_frames(media, frame_bytes=100, stride=2, max_frames=3)
    rows = out.collect()
    assert rows, "fixture docs are long enough to yield at least one frame"
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    src = {r.doc_id: r.n_bytes for r in media.select("doc_id", "n_bytes").collect()}
    for doc_id, frames in by_doc.items():
        assert len(frames) <= 3  # max_frames bound
        idxs = sorted(f.frame_index for f in frames)
        assert all(i % 2 == 0 for i in idxs)  # stride
        for f in frames:
            assert f.byte_offset == f.frame_index * 100
            assert 0 < len(f.frame) <= 100
            assert f.byte_offset < src[doc_id]


def test_frame_sampling_skips_short_payloads(spark, media):
    # payloads shorter than one frame produce zero rows, not errors
    short = media.filter("n_bytes < 5000")
    out = sample_frames(short, frame_bytes=1 << 20, stride=1)
    assert out.count() == 0
