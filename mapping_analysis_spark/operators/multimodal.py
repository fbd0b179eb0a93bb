"""Multimodal (image / video) columns for training-data pipelines.

The engine treats media as opaque ``binary`` columns with typed metadata,
exactly as the audio channel does (``functions/audio.py``): decode,
feature-extract, resize, and frame-sample run as Arrow-batched pandas
iterators over ``mapInPandas`` — one partition-local pass, no shuffle, no
per-row Python. Real image/video codecs (PIL / pyav) are NOT in this
container, so the byte-level decode step is stubbed behind a deterministic
fake container format while every Spark-side concern — schema, Arrow batch
shape, partition preservation, explode cardinality — is real and tested:

* ``XIMG``: ``b"XIMG" | width:uint16be | height:uint16be | w*h gray bytes``
* ``XVID``: ``b"XVID" | n_frames:uint16be | fps:uint8 | n_frames × 64-byte
  8×8 gray frames``

``synth_image_bytes`` / ``synth_video_bytes`` build these containers as
NATIVE Column expressions (hex assembly → ``to_binary``), so the synthetic
corpus itself is JVM-side and scales with the scan. A real deployment
replaces ``_decode_image`` / ``_decode_video`` with the codec call; the
seam raises ``NotImplementedError`` for unknown magics after an import-try
for PIL (documented stub, per the container's no-heavy-deps constraint).

100-TB notes: binary payloads ride columnar parquet; the Arrow batch size
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set for
binary rows in ``session.get_spark``); decode emits narrow typed rows so
the bytes are dropped at the earliest stage that no longer needs them
(the reference drops its payloads the same way at
``model/MergeTuple.java:21-38`` — tuple narrowing for hot paths).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMG_MAGIC = b"XIMG"
VID_MAGIC = b"XVID"
FRAME_W = FRAME_H = 8  # fixed fake-video frame geometry


# ---------------------------------------------------------------------------
# deterministic fake media — native Column synthesis (hex → to_binary)
# ---------------------------------------------------------------------------


def _hex2(col: Column) -> Column:
    """2-hex-digit byte."""
    return F.lpad(F.hex(col.cast("bigint")), 2, "0")


def _hex4(col: Column) -> Column:
    """4-hex-digit big-endian uint16."""
    return F.lpad(F.hex(col.cast("bigint")), 4, "0")


def image_dims(id_col: Column) -> tuple[Column, Column]:
    """The (width, height) of an id's fake image — closed-form, so an
    external oracle can recompute them without touching the bytes."""
    return 8 + F.pmod(id_col, F.lit(9)), 8 + F.pmod(id_col * 3, F.lit(7))


def synth_image_bytes(id_col: Column) -> Column:
    """XIMG container for an id: pixels[i] = (id*31 + i*7) % 256 — a fully
    JVM-side expression (no Python), deterministic per id."""
    w, h = image_dims(id_col)
    pix = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (w * h - 1).cast("int")),
            lambda i: _hex2(F.pmod(id_col * 31 + i * 7, F.lit(256))),
        ),
        "",
    )
    return F.to_binary(
        F.concat(F.lit(IMG_MAGIC.hex().upper()), _hex4(w), _hex4(h), pix), F.lit("hex")
    )


def video_frame_count(id_col: Column) -> Column:
    return 4 + F.pmod(id_col, F.lit(12))


def synth_video_bytes(id_col: Column) -> Column:
    """XVID container: frame f pixel i = (id + f*13 + i*7) % 256, fps 24."""
    n = video_frame_count(id_col)
    frames = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (n * (FRAME_W * FRAME_H) - 1).cast("int")),
            lambda i: _hex2(
                F.pmod(
                    id_col
                    + (i / F.lit(FRAME_W * FRAME_H)).cast("int") * 13
                    + F.pmod(i, F.lit(FRAME_W * FRAME_H)) * 7,
                    F.lit(256),
                )
            ),
        ),
        "",
    )
    return F.to_binary(
        F.concat(F.lit(VID_MAGIC.hex().upper()), _hex4(n), _hex2(F.lit(24)), frames),
        F.lit("hex"),
    )


# ---------------------------------------------------------------------------
# decode seam (stubbed codecs)
# ---------------------------------------------------------------------------


def _decode_image(buf: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, uint8 pixel array). XIMG natively; anything else is
    the real-codec seam — PIL if available, else a documented stub."""
    if buf[:4] == IMG_MAGIC:
        w, h = struct.unpack(">HH", buf[4:8])
        return w, h, np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=8)
    try:  # pragma: no cover - PIL absent in this image
        import io

        from PIL import Image  # noqa: F401

        img = Image.open(io.BytesIO(buf)).convert("L")
        return img.width, img.height, np.asarray(img, dtype=np.uint8).ravel()
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "real image codecs (PIL) are not available in this environment; "
            "only the XIMG fake container decodes here — the Spark plumbing "
            "is identical for real codecs"
        ) from exc


def _decode_video(buf: bytes) -> tuple[int, int, np.ndarray]:
    """(n_frames, fps, uint8[n_frames, 64] frame matrix)."""
    if buf[:4] != VID_MAGIC:
        raise NotImplementedError(
            "real video codecs (pyav) are not available in this environment; "
            "only the XVID fake container decodes here"
        )
    n, fps = struct.unpack(">HB", buf[4:7])
    frames = np.frombuffer(
        buf, dtype=np.uint8, count=n * FRAME_W * FRAME_H, offset=7
    )
    return n, fps, frames.reshape(n, FRAME_W * FRAME_H)


# ---------------------------------------------------------------------------
# operators (mapInPandas — Arrow-batched, partition-local, shuffle-free)
# ---------------------------------------------------------------------------

_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_pixels", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
    ]
)


def decode_image_meta(df: DataFrame, id_col: str = "id", bytes_col: str = "image") -> DataFrame:
    """Decode → typed metadata + exact pixel checksum. The binary column is
    consumed here and never travels further down the plan."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[bytes_col]):
                w, h, px = _decode_image(bytes(buf))
                rows.append((int(i), w, h, "ximg", w * h, int(px.sum())))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "format", "n_pixels", "px_sum"]
            )

    return df.select(F.col(id_col).alias(id_col), bytes_col).mapInPandas(
        gen, schema=_META_SCHEMA
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("image", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "id",
    bytes_col: str = "image",
) -> DataFrame:
    """Nearest-neighbor resize, re-emitted as an XIMG container (binary in,
    binary out — the shape a thumbnailing stage has at scale)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[bytes_col]):
                w, h, px = _decode_image(bytes(buf))
                grid = px.reshape(h, w)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                out = grid[np.ix_(ys, xs)]
                payload = (
                    IMG_MAGIC + struct.pack(">HH", out_w, out_h) + out.tobytes()
                )
                rows.append((int(i), payload, out_w, out_h))
            yield pd.DataFrame(rows, columns=["id", "image", "width", "height"])

    return df.select(F.col(id_col).alias(id_col), bytes_col).mapInPandas(
        gen, schema=_RESIZE_SCHEMA
    )


_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def image_features(
    df: DataFrame, n_bins: int = 16, id_col: str = "id", bytes_col: str = "image"
) -> DataFrame:
    """Feature-extract: L1-normalized gray histogram (the deterministic
    stand-in for a CNN embedding; output shape/type match, so downstream
    ANN / near-dup operators consume it unchanged)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[bytes_col]):
                _, _, px = _decode_image(bytes(buf))
                hist = np.bincount(px >> int(np.log2(256 // n_bins)), minlength=n_bins)
                feat = (hist / max(len(px), 1)).astype(np.float32)
                rows.append((int(i), feat.tolist()))
            yield pd.DataFrame(rows, columns=["id", "features"])

    return df.select(F.col(id_col).alias(id_col), bytes_col).mapInPandas(
        gen, schema=_FEAT_SCHEMA
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_sum", T.LongType()),
    ]
)


def sample_frames(
    df: DataFrame, every: int = 3, id_col: str = "id", bytes_col: str = "video"
) -> DataFrame:
    """Every ``every``-th frame, exploded to one row per sampled frame —
    the fan-out stays partition-local (mapInPandas may emit more rows than
    it receives), so a 100-TB video table never shuffles raw bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[bytes_col]):
                n, _fps, frames = _decode_video(bytes(buf))
                for f in range(0, n, every):
                    fr = frames[f]
                    rows.append((int(i), f, fr.tobytes(), int(fr.sum())))
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame", "frame_sum"])

    return df.select(F.col(id_col).alias(id_col), bytes_col).mapInPandas(
        gen, schema=_FRAME_SCHEMA
    )
