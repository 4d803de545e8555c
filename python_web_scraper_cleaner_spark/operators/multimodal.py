"""Multimodal operators: decode / feature-extract / resize / frame-sample
over opaque ``binary`` media columns.

Engine extension for training-data pipelines (the reference repo at
/root/reference is text-only; the brief mandates multimodal plumbing as a
first-class component). The Spark-side plumbing — schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partitioning — is real and tested.
:func:`decode_media` fully decodes the repo's synthetic envelope
(sources/media.py) into pixel/sample/frame numpy arrays; real container
formats raise there until PIL / soundfile / pyav are wired in at that
exact seam (none ship in this container) — swapping them in changes no
downstream schema.

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


def decode_media(data: bytes, kind: str) -> dict:
    """Decode ONE media blob into its pixel / sample / frame representation.

    The synthetic ASCII envelope (sources/media.py) is decoded for real:
    header parse, then payload expansion into numpy arrays — images tile
    the payload bytes into an (height, width, 3) uint8 tensor, audio
    exposes payload bytes as the sample vector, video reshapes the
    payload into an (n_frames, frame_size) stack. Real container formats
    (JPEG/WAV/MP4 — foreign magic bytes) still raise here with a clear
    message: this function is the exact seam where PIL / soundfile / pyav
    plug in, and swapping them in changes no downstream schema.
    """
    import numpy as np

    magic = bytes(data[:3])
    if kind == "image":
        if magic != b"IMG":
            raise NotImplementedError(
                f"image container {magic!r} needs a real codec (PIL) — "
                "only the synthetic IMG envelope decodes in this build")
        w, h = int(data[3:7]), int(data[7:11])
        if bytes(data[11:13]) != b"C3":
            raise ValueError("corrupt image envelope: missing channel tag")
        payload = np.frombuffer(data, np.uint8, offset=IMG_HEADER_LEN)
        n = w * h * 3
        if n > 0 and payload.size == 0:
            # all-header truncation: fail with the same clear corrupt-
            # envelope error as other malformed shapes, not ZeroDivision
            raise ValueError("corrupt image envelope: empty payload")
        pixels = (np.tile(payload, -(-n // max(payload.size, 1)))[:n]
                  .reshape(h, w, 3))
        return {"width": w, "height": h, "channels": 3, "pixels": pixels}
    if kind == "audio":
        if magic != b"AUD":
            raise NotImplementedError(
                f"audio container {magic!r} needs a real codec (soundfile)")
        rate = int(data[3:8])
        samples = np.frombuffer(data, np.uint8, offset=AUD_HEADER_LEN)
        return {"sample_rate": rate, "samples": samples}
    if kind == "video":
        if magic != b"VID":
            raise NotImplementedError(
                f"video container {magic!r} needs a real codec (pyav)")
        nf, fsize = int(data[3:7]), int(data[7:11])
        payload = np.frombuffer(data, np.uint8, offset=VID_HEADER_LEN)
        if payload.size < nf * fsize:
            # short payload cannot fill the declared frame stack — raise
            # the clear envelope error, not a numpy reshape failure
            raise ValueError("corrupt video envelope: truncated payload")
        frames = payload[:nf * fsize].reshape(nf, fsize)
        return {"n_frames": nf, "frame_size": fsize, "frames": frames}
    raise ValueError(f"unknown media kind {kind!r}")


DECODE_FEATURES_SCHEMA = ("id long, kind string, n_units long, "
                          "byte_sum long, byte_min int, byte_max int")


def decode_features(df: DataFrame, *, id_col: str = "media_id",
                    kind_col: str = "kind",
                    media_col: str = "media") -> DataFrame:
    """Features over the DECODED representation (decode_media output), not
    the raw envelope: per blob the decoded unit count (pixels×channels /
    samples / frames) and byte statistics of the pixel tensor / sample
    vector / frame stack. Decoding is inherently per-blob, so the loop
    runs per element INSIDE the Arrow batch (same pattern as the md5
    loops above); the blob is dropped on output and only six narrow
    columns leave the stage."""
    import numpy as np
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for i, k, blob in zip(pdf[id_col], pdf[kind_col],
                                  pdf[media_col]):
                d = decode_media(blob, k)
                if k == "image":
                    arr, n_units = d["pixels"], d["pixels"].size
                elif k == "audio":
                    arr, n_units = d["samples"], d["samples"].size
                else:
                    arr, n_units = d["frames"], d["n_frames"]
                rows.append((int(i), k, int(n_units),
                             int(arr.sum(dtype=np.int64)),
                             int(arr.min()), int(arr.max())))
            yield pd.DataFrame(rows, columns=["id", "kind", "n_units",
                                              "byte_sum", "byte_min",
                                              "byte_max"])

    return df.mapInPandas(gen, schema=DECODE_FEATURES_SCHEMA)


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
