"""Multimodal plumbing tests: binary payload columns through mapInPandas
with real schemas/batching and injected fake codecs."""

import struct

import pytest
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.multimodal import (
    FAKE_MAGIC,
    decode_image_meta,
    extract_audio_features,
    make_fake_image,
    resize_images,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def images(spark):
    rows = [
        (1, make_fake_image(64, 48, 3, fill=7)),
        (2, make_fake_image(128, 128, 1, fill=9)),
        (3, b"not an image"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_decode_image_meta(spark, images):
    out = {r["id"]: r for r in decode_image_meta(images).collect()}
    assert out[1]["width"] == 64 and out[1]["height"] == 48 and out[1]["channels"] == 3
    assert out[1]["valid"] and out[2]["valid"]
    assert out[2]["n_bytes"] == len(make_fake_image(128, 128, 1, fill=9))
    assert not out[3]["valid"] and out[3]["width"] is None
    assert not out[4]["valid"] and out[4]["n_bytes"] == 0 and out[4]["digest"] is None


def test_resize_with_fake_codec(spark, images):
    def fake_codec(payload, w, h):
        # parse header, emit a new fake image at the target size
        c = payload[8] if payload[:4] == FAKE_MAGIC else 3
        return make_fake_image(w, h, c)

    out = resize_images(images.filter(F.col("id") <= 2), 32, 32, codec=fake_codec)
    rows = {r["id"]: r for r in out.collect()}
    assert all(r["width"] == 32 and r["height"] == 32 for r in rows.values())
    w, h, c = struct.unpack("<HHB", bytes(rows[2]["payload"])[4:9])
    assert (w, h, c) == (32, 32, 1)


def test_resize_real_bmp_default_codec(spark):
    from local_pubchem_db_spark.operators.multimodal import (
        _parse_bmp_header,
        make_bmp,
    )

    images = spark.createDataFrame(
        [(1, make_bmp(64, 48, (10, 20, 30))), (2, make_bmp(5, 7, (1, 2, 3)))],
        "id long, payload binary",
    )
    rows = {r["id"]: r for r in resize_images(images, 16, 16).collect()}
    for r in rows.values():
        assert (r["width"], r["height"]) == (16, 16)
        w, h, c = _parse_bmp_header(bytes(r["payload"]))
        assert (w, h, c) == (16, 16, 3)
    # nearest-neighbor of a solid-color image stays that color: check one
    # pixel (BGR at the start of the pixel array)
    payload = bytes(rows[1]["payload"])
    offset = struct.unpack_from("<I", payload, 10)[0]
    assert payload[offset : offset + 3] == bytes((30, 20, 10))


def test_resize_default_codec_rejects_non_bmp(spark, images):
    with pytest.raises(Exception, match="not a 24-bit uncompressed BMP"):
        resize_images(images.filter(F.col("id") == 3), 32, 32).collect()


def test_decode_image_meta_real_bmp(spark):
    from local_pubchem_db_spark.operators.multimodal import make_bmp

    images = spark.createDataFrame(
        [(1, make_bmp(31, 17))], "id long, payload binary"
    )
    row = decode_image_meta(images).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (31, 17, 3)
    assert row["valid"]


def test_audio_features_real_wav_default_decoder(spark):
    from local_pubchem_db_spark.operators.multimodal import make_wav

    # constant amplitude 16384 = 0.5 in [-1, 1) → mean_amp = rms = 0.5
    audio = spark.createDataFrame(
        [(1, make_wav([16384] * 1000)), (2, make_wav([0] * 10))],
        "id long, payload binary",
    )
    rows = {r["id"]: r for r in extract_audio_features(audio).collect()}
    assert rows[1]["n_samples"] == 1000
    assert rows[1]["mean_amp"] == pytest.approx(0.5)
    assert rows[1]["rms"] == pytest.approx(0.5)
    assert rows[2]["mean_amp"] == 0.0


def test_frame_sampling_real_container_default_demuxer(spark):
    from local_pubchem_db_spark.operators.multimodal import make_frame_container

    frames = [b"frame-%d" % i for i in range(10)]
    videos = spark.createDataFrame(
        [(1, make_frame_container(frames))], "id long, payload binary"
    )
    out = sample_video_frames(videos, every_nth=4).collect()
    assert sorted(r["frame_idx"] for r in out) == [0, 4, 8]
    assert {bytes(r["frame"]) for r in out} == {b"frame-0", b"frame-4", b"frame-8"}


def test_frame_sampling_row_expansion(spark):
    videos = spark.createDataFrame(
        [(1, b"v1-10frames"), (2, b"v2-4frames")], "id long, payload binary"
    )

    def fake_demuxer(payload):
        n = int(payload.split(b"-")[1].replace(b"frames", b""))
        return [payload + b":%d" % i for i in range(n)]

    out = sample_video_frames(videos, every_nth=3, demuxer=fake_demuxer).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r["frame_idx"])
    assert sorted(by_id[1]) == [0, 3, 6, 9]
    assert sorted(by_id[2]) == [0, 3]
    frame = next(bytes(r["frame"]) for r in out if r["id"] == 2 and r["frame_idx"] == 3)
    assert frame == b"v2-4frames:3"


def test_audio_features(spark):
    import numpy as np

    audio = spark.createDataFrame(
        [(1, struct.pack("<4h", 0, 100, -100, 200)), (2, b"")],
        "id long, payload binary",
    )

    def fake_decoder(payload):
        return np.frombuffer(payload, dtype="<i2").astype("float64")

    rows = {r["id"]: r for r in extract_audio_features(audio, decoder=fake_decoder).collect()}
    assert rows[1]["n_samples"] == 4
    assert rows[1]["mean_amp"] == pytest.approx(100.0)
    assert rows[1]["rms"] == pytest.approx((0 + 100**2 + 100**2 + 200**2) ** 0.5 / 2)
    assert rows[2]["n_samples"] == 0 and rows[2]["rms"] == 0.0


def test_resize_top_down_bmp_not_flipped():
    # A negative-height (top-down) BMP stores rows top-first; the codec
    # must flip them into bottom-up order before re-encoding with positive
    # height, or the output is vertically mirrored.
    from local_pubchem_db_spark.operators.multimodal import (
        bmp_resize_codec,
        make_bmp,
    )

    colors = [(0, 0, 255), (255, 0, 0)]  # bottom row blue, top row red
    bottom_up = make_bmp(4, 2, row_colors=colors)
    top_down = make_bmp(4, 2, row_colors=colors, top_down=True)
    assert bottom_up != top_down  # genuinely different storage order
    assert bmp_resize_codec(bottom_up, 2, 2) == bmp_resize_codec(top_down, 2, 2)
