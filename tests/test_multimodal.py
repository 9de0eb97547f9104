from __future__ import annotations

import pytest

from big_data_processing_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_image_real,
    decode_image_stub,
    extract_image_features,
    sample_video_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x00\x01\x02\x03" * 64, "image/png", 8, 8, None),
        (2, "image", b"\xff" * 100, "image/jpeg", 10, 10, None),
        (3, "image", None, "image/png", None, None, None),  # corrupt/missing
        (4, "video", b"\x10\x20\x30" * 500, "video/mp4", 64, 48, 3500),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_image_features_batch_shape(media):
    out = extract_image_features(media, dim=8)
    rows = {r.media_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].n_bytes == 256 and rows[1].decode_ok
    assert not rows[3].decode_ok and rows[3].n_bytes == 0
    assert len(rows[1].feat) == 8
    assert all(0.0 <= v <= 1.0 for v in rows[1].feat)


def test_stub_decode_deterministic():
    a = decode_image_stub(b"hello world" * 10)
    b = decode_image_stub(b"hello world" * 10)
    assert a == b and len(a) == 8


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_sample_video_frames(media):
    out = sample_video_frames(media, every_ms=1000).collect()
    # 3500 ms video, sampled at 0,1000,2000,3000
    assert [r.frame_ts_ms for r in out] == [0, 1000, 2000, 3000]
    assert all(r.media_id == 4 for r in out)
