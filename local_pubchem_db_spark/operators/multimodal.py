"""Multimodal column operators: image / audio / video as opaque binary
columns with typed metadata.

Design (the 100 TB shape):
- payloads ride as ``binary`` columns next to typed metadata columns —
  never decoded at rest, never inflated through a shuffle;
- every decode / transform runs as an Arrow-batched ``mapInPandas`` over
  whole partitions: one Python worker per partition, payload bytes cross
  the JVM↔Python boundary once per batch, outputs are again
  binary+metadata rows;
- heavy stages repartition first (see ``fan_out``) so one oversized shard
  cannot serialize a decode sweep.

The actual codec calls (PIL/ffmpeg/librosa) are NOT available in this
environment, so the codec boundary is stubbed: ``decode_image_meta`` is a
deterministic fake parser over a documented fake header format, and
``resize_images`` / ``sample_video_frames`` / ``extract_audio_features``
raise ``NotImplementedError`` at the clearly-marked codec call unless
handed the fake codec. Everything Spark-side — schemas, UDF signatures,
batch iteration, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from local_pubchem_db_spark.operators.util import fan_out

# Fake payload format for plumbing tests: b"IMG!" + u16 width + u16 height
# + u8 channels + raw bytes. Stands in for a real JPEG/PNG header parse.
FAKE_MAGIC = b"IMG!"


def make_fake_image(width: int, height: int, channels: int = 3, fill: int = 0) -> bytes:
    body = bytes([fill % 256]) * (width * height * channels)
    return FAKE_MAGIC + struct.pack("<HHB", width, height, channels) + body


def _parse_fake_header(payload: bytes) -> tuple[int, int, int] | None:
    if payload is None or len(payload) < 9 or payload[:4] != FAKE_MAGIC:
        return None
    w, h, c = struct.unpack("<HHB", payload[4:9])
    return w, h, c


IMAGE_META_SCHEMA = (
    "id long, n_bytes long, width int, height int, channels int, "
    "digest string, valid boolean"
)


def decode_image_meta(
    df: DataFrame, id_col: str = "id", payload_col: str = "payload"
) -> DataFrame:
    """Decode pass: payload bytes → typed metadata (size, dimensions,
    digest, validity). Runs once per partition via mapInPandas; the
    payload does not survive into the output, so downstream plans shuffle
    only metadata.

    The header parse is the deterministic fake (`FAKE_MAGIC`); swap
    ``_parse_fake_header`` for a real codec probe in production.
    """
    cols = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(lambda b: _parse_fake_header(bytes(b)) if b is not None else None)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int64"),
                    "width": dims.map(lambda d: d[0] if d else None),
                    "height": dims.map(lambda d: d[1] if d else None),
                    "channels": dims.map(lambda d: d[2] if d else None),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                    ),
                    "valid": dims.map(lambda d: d is not None),
                }
            )

    return fan_out(cols).mapInPandas(meta, IMAGE_META_SCHEMA)


RESIZED_SCHEMA = "id long, payload binary, width int, height int"


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "id",
    payload_col: str = "payload",
    codec=None,
) -> DataFrame:
    """Resize pass: binary in → binary out, metadata updated.

    ``codec(payload, w, h) -> bytes`` is the pluggable decode-resize-encode
    step. Without one this raises NotImplementedError AT EXECUTION (the
    plan itself builds fine — schema and partitioning are real); tests
    inject a fake codec.
    """
    cols = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec is None:
                # STUB: real impl would be PIL.Image.open(...).resize(...)
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "pass codec=... (see make_fake_image for the test fake)"
                )
            out = pdf["payload"].map(lambda b: codec(bytes(b), target_w, target_h))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload": out,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return fan_out(cols).mapInPandas(resize, RESIZED_SCHEMA)


FRAME_SCHEMA = "id long, frame_idx int, frame bytes".replace("bytes", "binary")


def sample_video_frames(
    df: DataFrame,
    every_nth: int,
    id_col: str = "id",
    payload_col: str = "payload",
    demuxer=None,
) -> DataFrame:
    """Frame sampling: one input row → N output rows (id, frame_idx,
    frame). The row-expansion shape matters: mapInPandas may emit more
    rows than it consumes, so sampling needs no explode/join.

    ``demuxer(payload) -> list[bytes]`` is the stubbed codec step.
    """
    cols = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if demuxer is None:
                # STUB: real impl would shell to ffmpeg / pyav
                raise NotImplementedError(
                    "video demuxer not available; pass demuxer=..."
                )
            ids, idxs, blobs = [], [], []
            for i, b in zip(pdf["id"], pdf["payload"]):
                all_frames = demuxer(bytes(b))
                for j in range(0, len(all_frames), every_nth):
                    ids.append(i)
                    idxs.append(j)
                    blobs.append(all_frames[j])
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": blobs})

    return fan_out(cols).mapInPandas(frames, FRAME_SCHEMA)


AUDIO_FEAT_SCHEMA = "id long, n_samples long, mean_amp double, rms double"


def extract_audio_features(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    decoder=None,
) -> DataFrame:
    """Feature extraction: audio bytes → fixed numeric features.

    ``decoder(payload) -> numpy float array`` is the stubbed codec step;
    the feature math itself (vectorized numpy over the decoded samples)
    is real.
    """
    import numpy as np

    cols = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None:
                # STUB: real impl would be soundfile/librosa decode
                raise NotImplementedError(
                    "audio decoder not available; pass decoder=..."
                )
            rows = {"id": [], "n_samples": [], "mean_amp": [], "rms": []}
            for i, b in zip(pdf["id"], pdf["payload"]):
                x = np.asarray(decoder(bytes(b)), dtype=np.float64)
                rows["id"].append(i)
                rows["n_samples"].append(int(x.size))
                rows["mean_amp"].append(float(np.mean(np.abs(x))) if x.size else 0.0)
                rows["rms"].append(float(np.sqrt(np.mean(x * x))) if x.size else 0.0)
            yield pd.DataFrame(rows)

    return fan_out(cols).mapInPandas(feats, AUDIO_FEAT_SCHEMA)
