"""Multimodal operators: decode / feature-extract / resize / frame-sample
over opaque ``binary`` media columns.

Engine extension for training-data pipelines (the reference repo at
/root/reference is text-only; the brief mandates multimodal plumbing as a
first-class component). The Spark-side plumbing — schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partitioning — is real and tested; the
actual codec step is stubbed behind :func:`decode_media` because no
image/audio library ships in this container. Swap in PIL / soundfile /
pyav there and everything downstream keeps working.

All batch work is vectorized pandas (``.str`` ops on Arrow-delivered bytes
Series) — never row-at-a-time Python UDFs. At 100 TB the media column is
the dominant byte volume, so every operator here projects the blob away as
early as possible and the feature schemas are narrow fixed-width columns.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.media import (AUD_HEADER_LEN, IMG_HEADER_LEN, VID_HEADER_LEN)

MEDIA_FEATURES_SCHEMA = (
    "id long, kind string, n_bytes long, width int, height int, "
    "n_pixels long, sample_rate int, n_samples long, duration_ms long, "
    "n_frames int, checksum string")

FRAME_SCHEMA = "id long, frame_idx int, frame_md5 string"


def decode_media(data: bytes, kind: str):
    """Full pixel/sample decode — intentionally stubbed (no codec libs in
    this container). Production wiring: PIL.Image.open for images,
    soundfile/librosa for audio, pyav frame iteration for video. The
    surrounding operators only touch envelope metadata and payload bytes,
    so swapping this in changes no schema."""
    raise NotImplementedError(
        "codec libraries are not available in this environment; "
        "media_features/sample_video_frames use envelope metadata only")


def _decoded(pdf, media_col: str):
    """bytes Series → ASCII str Series (vectorized)."""
    return pdf[media_col].str.decode("ascii")


def media_features(df: DataFrame, *, id_col: str = "media_id",
                   kind_col: str = "kind",
                   media_col: str = "media") -> DataFrame:
    """Per-blob typed metadata + payload checksum via ``mapInPandas``.

    Nullable per-kind columns (width/height for images, sample_rate/
    duration for audio, n_frames for video) — the standard "typed metadata
    next to an opaque blob" layout. One pass over the bytes, blob dropped
    on output.
    """
    import numpy as np
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            s = _decoded(pdf, media_col)
            kind = pdf[kind_col]
            n_bytes = pdf[media_col].str.len().astype("int64")

            is_img = (kind == "image").to_numpy()
            is_aud = (kind == "audio").to_numpy()
            is_vid = (kind == "video").to_numpy()

            width = pd.array(
                np.where(is_img, pd.to_numeric(s.str.slice(3, 7),
                                               errors="coerce"), np.nan),
                dtype="Int32")
            height = pd.array(
                np.where(is_img, pd.to_numeric(s.str.slice(7, 11),
                                               errors="coerce"), np.nan),
                dtype="Int32")
            n_pixels = (width.astype("Int64") * height.astype("Int64"))

            rate = pd.array(
                np.where(is_aud, pd.to_numeric(s.str.slice(3, 8),
                                               errors="coerce"), np.nan),
                dtype="Int32")
            hdr = np.select([is_img, is_aud, is_vid],
                            [IMG_HEADER_LEN, AUD_HEADER_LEN, VID_HEADER_LEN],
                            default=0)
            payload_len = (n_bytes.to_numpy() - hdr)
            n_samples = pd.array(
                np.where(is_aud, payload_len, np.nan), dtype="Int64")
            duration_ms = pd.array(
                np.where(is_aud,
                         payload_len * 1000 // np.where(is_aud, rate.to_numpy(
                             dtype="float64", na_value=1), 1),
                         np.nan), dtype="Int64")
            n_frames = pd.array(
                np.where(is_vid, pd.to_numeric(s.str.slice(3, 7),
                                               errors="coerce"), np.nan),
                dtype="Int32")

            # payload md5 — hashlib has no vectorized form; this is the one
            # per-element loop, on short slices, inside the Arrow batch
            payloads = [t[h:] for t, h in zip(s.to_numpy(), hdr)]
            checksum = [hashlib.md5(p.encode("ascii")).hexdigest()
                        for p in payloads]

            yield pd.DataFrame({
                "id": pdf[id_col].astype("int64"),
                "kind": kind,
                "n_bytes": n_bytes,
                "width": width, "height": height, "n_pixels": n_pixels,
                "sample_rate": rate, "n_samples": n_samples,
                "duration_ms": duration_ms, "n_frames": n_frames,
                "checksum": checksum,
            })

    return df.mapInPandas(gen, schema=MEDIA_FEATURES_SCHEMA)


def resize_plan(features: DataFrame, *, max_side: int = 64) -> DataFrame:
    """Resize *plan* for images: target dims preserving aspect ratio,
    longest side clamped to ``max_side`` (JVM expressions — the pixel
    resample itself belongs in decode_media's production implementation).
    """
    w, h = F.col("width"), F.col("height")
    scale = F.least(F.lit(1.0), F.lit(max_side) /
                    F.greatest(w, h).cast("double"))
    return (features.filter(F.col("kind") == "image")
            .select("id", "width", "height",
                    F.greatest(F.floor(w * scale), F.lit(1)).cast("int")
                    .alias("target_w"),
                    F.greatest(F.floor(h * scale), F.lit(1)).cast("int")
                    .alias("target_h")))


def sample_video_frames(df: DataFrame, *, stride: int = 2,
                        id_col: str = "media_id", kind_col: str = "kind",
                        media_col: str = "media") -> DataFrame:
    """Every ``stride``-th frame of each video blob → one row per sampled
    frame (id, frame_idx, frame_md5). The explode happens inside the Arrow
    batch, so no shuffle and the blob never crosses a stage boundary.
    """
    import numpy as np
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf[kind_col] == "video"]
            if vids.empty:
                continue
            s = _decoded(vids, media_col)
            nf = pd.to_numeric(s.str.slice(3, 7)).to_numpy(dtype="int64")
            fsize = pd.to_numeric(s.str.slice(7, 11)).to_numpy(dtype="int64")
            ids = vids[id_col].to_numpy(dtype="int64")
            payloads = s.str.slice(VID_HEADER_LEN).to_numpy()

            n_sampled = (nf + stride - 1) // stride
            out_ids = np.repeat(ids, n_sampled)   # 8-byte scalars — cheap
            out_idx = np.concatenate(
                [np.arange(0, n, stride) for n in nf]) if len(nf) else []
            # slice frames per video — never np.repeat the payload strings,
            # which would hold n_sampled copies of every video blob in
            # executor memory at once
            hashes = [
                hashlib.md5(p[i * f:(i + 1) * f].encode("ascii")).hexdigest()
                for p, n, f in zip(payloads, nf, fsize)
                for i in range(0, n, stride)]
            yield pd.DataFrame({
                "id": out_ids,
                "frame_idx": np.asarray(out_idx, dtype="int32"),
                "frame_md5": hashes,
            })

    return df.mapInPandas(gen, schema=FRAME_SCHEMA)
