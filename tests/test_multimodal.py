"""Multimodal plumbing tests: binary envelopes, mapInPandas feature
extraction, frame sampling, resize planning, synthetic-envelope decode
(real container formats still raise at the codec seam).

The oracle here is a plain-Python loop over the *same collected blobs* —
independent of the SQL twin in plans/queries.py (which the driver harness
checks against DuckDB).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from python_web_scraper_cleaner_spark.operators import multimodal as MM
from python_web_scraper_cleaner_spark.sources.media import (
    AUD_HEADER_LEN, IMG_HEADER_LEN, VID_HEADER_LEN, synthesize_media)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 120))
    df = synthesize_media(docs).cache()
    df.count()
    yield df
    df.unpersist()


def _py_features(media_id: int, kind: str, blob: bytes) -> dict:
    s = blob.decode("ascii")
    out = {"id": media_id, "kind": kind, "n_bytes": len(blob),
           "width": None, "height": None, "n_pixels": None,
           "sample_rate": None, "n_samples": None, "duration_ms": None,
           "n_frames": None}
    if kind == "image":
        out["width"], out["height"] = int(s[3:7]), int(s[7:11])
        out["n_pixels"] = out["width"] * out["height"]
        hdr = IMG_HEADER_LEN
    elif kind == "audio":
        out["sample_rate"] = int(s[3:8])
        hdr = AUD_HEADER_LEN
        out["n_samples"] = len(s) - hdr
        out["duration_ms"] = out["n_samples"] * 1000 // out["sample_rate"]
    else:
        out["n_frames"] = int(s[3:7])
        hdr = VID_HEADER_LEN
    out["checksum"] = hashlib.md5(s[hdr:].encode("ascii")).hexdigest()
    return out


def test_media_features_match_python_oracle(media):
    blobs = {r.media_id: (r.kind, bytes(r.media)) for r in media.collect()}
    got = {r.id: r.asDict() for r in MM.media_features(media).collect()}
    assert set(got) == set(blobs)
    for mid, (kind, blob) in blobs.items():
        assert got[mid] == _py_features(mid, kind, blob), mid


def test_frame_sampling_reconstructs_payload(media):
    blobs = {r.media_id: bytes(r.media).decode("ascii")
             for r in media.filter(F.col("kind") == "video").collect()}
    rows = MM.sample_video_frames(media, stride=3).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append((r.frame_idx, r.frame_md5))
    assert set(by_id) == set(blobs)
    for mid, s in blobs.items():
        nf = int(s[3:7])
        fsize = int(s[7:11])
        payload = s[VID_HEADER_LEN:]
        expected = [
            (i, hashlib.md5(
                payload[i * fsize:(i + 1) * fsize].encode()).hexdigest())
            for i in range(0, nf, 3)]
        assert sorted(by_id[mid]) == expected, mid


def test_resize_plan_clamps_longest_side(media):
    plan = MM.resize_plan(MM.media_features(media), max_side=64).collect()
    assert plan  # images exist
    for r in plan:
        assert max(r.target_w, r.target_h) <= 64
        assert r.target_w >= 1 and r.target_h >= 1
        if max(r.width, r.height) <= 64:  # no upscaling
            assert (r.target_w, r.target_h) == (r.width, r.height)
        else:  # aspect preserved within integer floor
            scale = 64 / max(r.width, r.height)
            assert r.target_w == max(int(r.width * scale), 1)
            assert r.target_h == max(int(r.height * scale), 1)


def test_decode_media_image():
    d = MM.decode_media(b"IMG00160008C3" + b"ab" * 32, "image")
    assert (d["width"], d["height"], d["channels"]) == (16, 8, 3)
    assert d["pixels"].shape == (8, 16, 3)
    # payload tiles row-major: first bytes are the payload itself
    assert bytes(d["pixels"].reshape(-1)[:4]) == b"abab"


def test_decode_media_audio_and_video():
    a = MM.decode_media(b"AUD16000" + b"xyz" * 8, "audio")
    assert a["sample_rate"] == 16000 and a["samples"].size == 24
    assert bytes(a["samples"][:3]) == b"xyz"
    v = MM.decode_media(b"VID00020004" + b"wxyzWXYZ", "video")
    assert v["n_frames"] == 2 and v["frame_size"] == 4
    assert v["frames"].shape == (2, 4)
    assert bytes(v["frames"][1]) == b"WXYZ"


def test_decode_truncated_envelopes_raise_clear_errors():
    """All-header blobs (payload truncated away) must raise the corrupt-
    envelope ValueError, not ZeroDivisionError / numpy reshape errors —
    one bad blob inside decode_features' per-batch loop should carry a
    diagnosable message."""
    with pytest.raises(ValueError, match="empty payload"):
        MM.decode_media(b"IMG00160008C3", "image")  # header only
    with pytest.raises(ValueError, match="truncated payload"):
        MM.decode_media(b"VID00020004" + b"wx", "video")  # 2 of 8 bytes
    # zero-pixel image with empty payload is fine (n == 0 short-circuit)
    d = MM.decode_media(b"IMG00000000C3", "image")
    assert d["pixels"].size == 0


def test_decode_foreign_container_still_raises():
    """Real container formats (JPEG/WAV/MP4 magic) hit the declared codec
    seam: NotImplementedError until PIL/soundfile/pyav are wired in."""
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"\xff\xd8\xff" + b"a" * 64, "image")
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"RIF" + b"F" * 64, "audio")
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"\x00\x00\x00 ftypmp4", "video")


def test_decode_features_matches_python_loop(media):
    got = {r.id: r for r in MM.decode_features(media).collect()}
    rows = media.collect()
    assert len(got) == len(rows)
    import numpy as np
    for r in rows:
        d = MM.decode_media(bytes(r.media), r.kind)
        if r.kind == "image":
            arr, n_units = d["pixels"], d["pixels"].size
        elif r.kind == "audio":
            arr, n_units = d["samples"], d["samples"].size
        else:
            arr, n_units = d["frames"], d["n_frames"]
        g = got[r.media_id]
        assert (g.n_units, g.byte_sum, g.byte_min, g.byte_max) == (
            n_units, int(arr.sum(dtype=np.int64)),
            int(arr.min()), int(arr.max())), r.media_id


def test_blob_stays_out_of_feature_plan(media):
    """The media binary column must be consumed by the UDF stage, not
    carried in the output schema (100 TB rule: drop blobs early)."""
    feats = MM.media_features(media)
    assert "media" not in feats.columns
    assert dict(feats.dtypes)["checksum"] == "string"
