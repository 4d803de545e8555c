"""Synthetic multimodal ``media`` table: opaque binary blobs + typed metadata.

A training-data pipeline at 100 TB carries image/audio/video next to text as
opaque ``binary`` columns (the reference repo is text-only; this is an engine
extension mandated by the build brief). The sandbox has no codec libraries,
so the *container format* here is a deterministic ASCII envelope derived from
the ``documents`` table — header with typed metadata + md5-derived payload —
built entirely with JVM expressions (whole-stage codegen, no UDF, no RNG).
The DuckDB oracle in plans/queries.py derives byte-identical blobs from the
same ``documents`` rows, so the decode/feature/frame-sample operators in
operators/multimodal.py are verified end-to-end against SQL.

Envelope layout (all ASCII so both engines can reason about bytes):
  image: b"IMG" + 4-digit width + 4-digit height + "C3" + repeat(md5(text), 2)
  audio: b"AUD" + 5-digit sample rate + repeat(md5(text), 1 + doc_id%7)
  video: b"VID" + 4-digit n_frames + 4-digit frame_size
         + substr(repeat(md5(text), 8), 1, n_frames*frame_size)

operators.multimodal.decode_media decodes this envelope for real (pixel
tiling / sample vector / frame stack); real container formats (JPEG/WAV/
MP4) raise there until PIL/soundfile/pyav plug in at that exact seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMG_HEADER_LEN = 13   # "IMG" + 4 + 4 + "C3"
AUD_HEADER_LEN = 8    # "AUD" + 5
VID_HEADER_LEN = 11   # "VID" + 4 + 4
VID_FRAME_SIZE = 16


def synthesize_media(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """documents → (media_id, kind, media:binary) with deterministic blobs.

    Pure column expressions; the binary column is the UTF-8 encoding of the
    ASCII envelope. kind cycles image/audio/video on doc_id % 3.
    """
    d = F.col(id_col)
    h = F.md5(F.col(text_col))
    kind = (F.when(d % 3 == 0, F.lit("image"))
            .when(d % 3 == 1, F.lit("audio"))
            .otherwise(F.lit("video")))
    w = (d % 97 + 16).cast("int")
    ht = (d % 53 + 16).cast("int")
    rate = (d % 3 * 4000 + 8000).cast("int")
    nrep = (d % 7 + 1).cast("int")
    nf = (d % 5 + 4).cast("int")

    img = F.concat(F.lit("IMG"),
                   F.lpad(w.cast("string"), 4, "0"),
                   F.lpad(ht.cast("string"), 4, "0"),
                   F.lit("C3"), F.repeat(h, 2))
    aud = F.concat(F.lit("AUD"), F.lpad(rate.cast("string"), 5, "0"),
                   F.substring(F.repeat(h, 7), F.lit(1), nrep * 32))
    vid = F.concat(F.lit("VID"),
                   F.lpad(nf.cast("string"), 4, "0"),
                   F.lpad(F.lit(VID_FRAME_SIZE).cast("string"), 4, "0"),
                   F.substring(F.repeat(h, 8), F.lit(1), nf * VID_FRAME_SIZE))
    envelope = (F.when(kind == "image", img)
                .when(kind == "audio", aud)
                .otherwise(vid))
    return docs.select(d.alias("media_id"), kind.alias("kind"),
                       F.encode(envelope, "UTF-8").alias("media"))
