"""Multimodal (image/video) plumbing tests.

The decode step is a deterministic fake container (XIMG/XVID — real codecs
are not in this image); everything Spark-side is real: native-Column byte
synthesis, mapInPandas decode across multiple partitions, partition-local
frame explode, binary-in/binary-out resize, fixed-shape features.
"""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapping_analysis_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def images(spark):
    ids = spark.range(0, 40).repartition(4)
    return ids.select(
        F.col("id"), mm.synth_image_bytes(F.col("id")).alias("image")
    )


def _expected_image(i: int) -> tuple[int, int, np.ndarray]:
    w, h = 8 + i % 9, 8 + (i * 3) % 7
    px = np.array([(i * 31 + j * 7) % 256 for j in range(w * h)], dtype=np.uint8)
    return w, h, px


def test_synth_image_bytes_matches_python(images):
    for row in images.collect():
        w, h, px = _expected_image(row.id)
        buf = bytes(row.image)
        assert buf[:4] == mm.IMG_MAGIC
        assert struct.unpack(">HH", buf[4:8]) == (w, h)
        assert np.array_equal(np.frombuffer(buf, np.uint8, w * h, 8), px)


def test_decode_image_meta(images):
    got = {r.id: r for r in mm.decode_image_meta(images).collect()}
    assert len(got) == 40
    for i, r in got.items():
        w, h, px = _expected_image(i)
        assert (r.width, r.height, r.format) == (w, h, "ximg")
        assert r.n_pixels == w * h
        assert r.px_sum == int(px.sum())


def test_unknown_codec_is_stubbed_seam(spark):
    bad = spark.createDataFrame([(1, bytearray(b"JPEGnope"))], "id long, image binary")
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        mm.decode_image_meta(bad).collect()


def test_resize_nearest_neighbor(images):
    out = mm.resize_images(images, 4, 4)
    rows = {r.id: r for r in out.collect()}
    for i, r in rows.items():
        assert (r.width, r.height) == (4, 4)
        w, h, px = _expected_image(i)
        grid = px.reshape(h, w)
        ys, xs = (np.arange(4) * h) // 4, (np.arange(4) * w) // 4
        expect = grid[np.ix_(ys, xs)]
        buf = bytes(r.image)
        assert struct.unpack(">HH", buf[4:8]) == (4, 4)
        assert np.array_equal(np.frombuffer(buf, np.uint8, 16, 8), expect.ravel())
    # binary-in/binary-out: the result re-decodes through the same seam
    meta = mm.decode_image_meta(out).collect()
    assert all(m.n_pixels == 16 for m in meta)


def test_image_features_shape_and_norm(images):
    feats = mm.image_features(images, n_bins=16).collect()
    assert len(feats) == 40
    for r in feats:
        v = np.array(r.features, dtype=np.float64)
        assert v.shape == (16,)
        assert abs(v.sum() - 1.0) < 1e-6
        _, _, px = _expected_image(r.id)
        expect = np.bincount(px >> 4, minlength=16) / len(px)
        assert np.allclose(v, expect, atol=1e-7)


def test_sample_frames(spark):
    vids = spark.range(0, 30).repartition(3).select(
        F.col("id"), mm.synth_video_bytes(F.col("id")).alias("video")
    )
    frames = mm.sample_frames(vids, every=3).collect()
    by_id: dict[int, list] = {}
    for r in frames:
        by_id.setdefault(r.id, []).append(r)
    for i in range(30):
        n = 4 + i % 12
        got = sorted(by_id[i], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == list(range(0, n, 3))
        for r in got:
            expect = np.array(
                [(i + r.frame_idx * 13 + j * 7) % 256 for j in range(64)],
                dtype=np.uint8,
            )
            assert np.array_equal(np.frombuffer(bytes(r.frame), np.uint8), expect)
            assert r.frame_sum == int(expect.sum())


def test_decode_image_seam_runs_either_way():
    """The real-codec seam must behave correctly in BOTH environments:
    with PIL installed a non-XIMG buffer decodes for real; without it the
    seam raises the documented NotImplementedError (never a silent wrong
    answer). The XIMG fake container decodes regardless."""
    import numpy as np
    import pytest as _pytest

    from mapping_analysis_spark.operators.multimodal import (
        IMG_MAGIC,
        _decode_image,
    )

    # XIMG path: always available
    import struct as _struct

    w, h = 4, 3
    px = np.arange(w * h, dtype=np.uint8)
    buf = IMG_MAGIC + _struct.pack(">HH", w, h) + px.tobytes()
    gw, gh, gpx = _decode_image(buf)
    assert (gw, gh) == (w, h) and np.array_equal(gpx, px)

    # real-codec path: a tiny valid PNG (1x1 white, precomputed bytes)
    png_1x1 = bytes.fromhex(
        "89504e470d0a1a0a0000000d49484452000000010000000108000000003a7e9b55"
        "0000000a49444154789c6300010000050001"
        "0d0a2db40000000049454e44ae426082"
    )
    try:
        import PIL  # noqa: F401

        gw, gh, gpx = _decode_image(png_1x1)
        assert (gw, gh) == (1, 1) and gpx.shape == (1,)
    except ImportError:
        with _pytest.raises(NotImplementedError):
            _decode_image(png_1x1)
