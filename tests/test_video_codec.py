"""AVI/MJPEG video tier (operators/video.py): container physics,
per-frame decode parity with the JPEG codec, and the Spark frame-
feature plumbing. Everything is pure stdlib + numpy — no codec libs."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from recipys_spark.operators.jpeg import decode_jpeg
from recipys_spark.operators.video import (
    decode_video,
    encode_avi_mjpeg,
    extract_frame_features,
    is_avi,
    parse_avi,
    synthetic_avis,
    video_decoder,
)


def _frames(n=3, size=16, shift=0):
    out = []
    for fi in range(n):
        yy, xx = np.mgrid[0:size, 0:size]
        r = (xx * 255 // (size - 1)).astype(np.uint8)
        g = (yy * 255 // (size - 1)).astype(np.uint8)
        b = (((xx + yy + fi + shift) % 8) * 32).astype(np.uint8)
        out.append(np.stack([r, g, b], axis=-1))
    return out


def test_container_roundtrip_counts_and_clock():
    frames = _frames(4)
    payload = encode_avi_mjpeg(frames, fps=10)
    assert is_avi(payload)
    info = parse_avi(payload)
    assert info["n_frames"] == 4
    assert info["fps"] == 10
    assert info["usec_per_frame"] == 100_000
    assert (info["width"], info["height"]) == (16, 16)
    # frame timestamps follow the container clock exactly
    ts = [ms for ms, _ in decode_video(payload)]
    assert ts == [0, 100, 200, 300]


def test_per_frame_decode_parity_with_jpeg_codec():
    """The container must hand each 00dc payload to the JPEG decoder
    UNCHANGED: decoding the video equals decoding each frame's JPEG
    bytes directly."""
    frames = _frames(3)
    payload = encode_avi_mjpeg(frames, fps=5, quality=90)
    info = parse_avi(payload)
    via_video = [img for _, img in decode_video(payload)]
    via_jpeg = [decode_jpeg(f) for f in info["frames"]]
    for a, b in zip(via_video, via_jpeg):
        assert np.array_equal(a, b)


def test_odd_sized_frame_chunks_word_aligned():
    """RIFF chunks word-align: an odd-length JPEG body must not shift
    the parse of subsequent frames."""
    frames = _frames(5, size=9)  # odd dims -> odd-ish payload lengths
    payload = encode_avi_mjpeg(frames, fps=10)
    info = parse_avi(payload)
    assert info["n_frames"] == 5
    odd = [f for f in info["frames"] if len(f) % 2]
    # the fixture must actually exercise the pad path
    assert odd, "expected at least one odd-length frame payload"
    for _, img in decode_video(payload):
        assert img.shape == (9, 9, 3)


def test_rejections_name_the_problem():
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        parse_avi(b"\x89PNG not an avi")
    payload = bytearray(encode_avi_mjpeg(_frames(2), fps=10))
    h264 = payload.replace(b"vidsMJPG", b"vidsH264")
    with pytest.raises(ValueError, match="H264"):
        parse_avi(bytes(h264))
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_mjpeg([], fps=10)
    with pytest.raises(ValueError, match="one shape"):
        encode_avi_mjpeg([_frames(1)[0], _frames(1, size=8)[0]], fps=10)


def test_truncated_container_raises():
    payload = encode_avi_mjpeg(_frames(3), fps=10)
    # cut inside the movi list but keep the RIFF size field intact, so
    # a chunk's declared body extends past the buffer
    with pytest.raises(ValueError, match="truncated"):
        parse_avi(payload[: len(payload) - len(payload) // 3])


def test_video_decoder_feature_contract():
    """codec_decoder-compatible: FEATURE_DIM floats, the mean of the
    per-frame image features."""
    from recipys_spark.operators.multimodal import (
        FEATURE_DIM,
        codec_decoder,
        image_features,
        resize_nearest,
    )

    payload = encode_avi_mjpeg(_frames(3), fps=10)
    feats = video_decoder(payload)
    assert feats.shape == (FEATURE_DIM,)
    per_frame = np.stack(
        [image_features(resize_nearest(img, 8, 8)) for _, img in decode_video(payload)]
    )
    np.testing.assert_allclose(feats, per_frame.mean(axis=0))
    # magic-byte routing reaches the video tier (RIFF form type 'AVI ',
    # not confused with RIFF/WAVE)
    np.testing.assert_array_equal(codec_decoder(payload), feats)


def test_wav_routing_still_works_after_riff_disambiguation():
    from recipys_spark.operators.multimodal import codec_decoder, encode_wav

    t = np.arange(8000) / 8000.0
    wav = encode_wav(np.sin(2 * np.pi * 440 * t), rate=8000)
    feats = codec_decoder(wav)
    assert np.isfinite(feats).all()


def test_spark_frame_features_partitioning_invariant(spark):
    vids = synthetic_avis(spark, n=8)
    a = (
        extract_frame_features(vids)
        .orderBy("media_id", "frame_idx")
        .collect()
    )
    b = (
        extract_frame_features(vids.repartition(7))
        .orderBy("media_id", "frame_idx")
        .collect()
    )
    assert a == b and len(a) > 8
    # frame counts per clip follow the fixture's 2 + id % 4 rule
    counts = {}
    for r in a:
        counts[r.media_id] = counts.get(r.media_id, 0) + 1
    for mid, c in counts.items():
        assert c == 2 + mid % 4, (mid, c)
    # timestamps follow each clip's fps (5 if odd id else 10)
    for r in a:
        step = 200 if r.media_id % 2 else 100
        assert r.frame_ms == r.frame_idx * step


def test_frame_grid_matches_decoded_timestamps(spark):
    """frame_sample (pure-expression grid from metadata) agrees with
    the decoded per-frame timestamps at the clip's own frame period."""
    from recipys_spark.operators.multimodal import frame_sample

    vids = synthetic_avis(spark, n=6)
    odd = vids.where(F.col("media_id") % 2 == 1)  # all 5 fps -> 200 ms
    grid = {
        (r.media_id, r.frame_ms)
        for r in frame_sample(odd, every_ms=200).collect()
    }
    decoded = {
        (r.media_id, r.frame_ms)
        for r in extract_frame_features(odd).collect()
    }
    assert grid == decoded


def test_parse_avi_rejects_second_vids_stream():
    """Review fix: a second MJPG vids stream would silently lose all
    its frames (only stream-00 chunks are collected) — must raise."""
    import struct

    import numpy as np
    import pytest

    from recipys_spark.operators.video import (
        AVI_FORM,
        RIFF_MAGIC,
        _chunk,
        _list,
        encode_avi_mjpeg,
        parse_avi,
    )

    base = encode_avi_mjpeg([np.zeros((8, 8), dtype=np.uint8)] * 2, fps=5)
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHI", 0, 0, 0, 0)
        + struct.pack("<2I", 1, 5)
        + struct.pack("<5I", 0, 2, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, 8, 8)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, 8, 8, 1, 24, b"MJPG", 192, 0, 0, 0, 0)
    extra = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    # splice a second vids strl right before the movi list
    movi_at = base.find(b"LIST", 12)
    while base[movi_at + 8 : movi_at + 12] != b"movi":
        movi_at = base.find(b"LIST", movi_at + 4)
    doctored = base[:movi_at] + extra + base[movi_at:]
    body_len = len(doctored) - 8
    doctored = RIFF_MAGIC + struct.pack("<I", body_len) + doctored[8:]
    assert doctored[8:12] == AVI_FORM
    with pytest.raises(ValueError, match="multiple 'vids'"):
        parse_avi(doctored)


def test_parse_png_meta_truncated_raises_valueerror():
    """Review fix: a 25-byte truncated IHDR must raise the family's
    ValueError, never a raw struct.error out of the Arrow worker."""
    import pytest

    from recipys_spark.operators.multimodal import PNG_MAGIC, parse_png_meta

    truncated = PNG_MAGIC + b"\x00\x00\x00\x0dIHDR" + b"\x00" * 9  # 25 bytes
    with pytest.raises(ValueError, match="PNG"):
        parse_png_meta(truncated)


def test_parse_jpeg_meta_skips_fill_bytes():
    """ADVICE r6: spec-legal 0xFF fill (padding) bytes before a marker
    must be skipped, not read AS the marker — a real-world JPEG with
    padding otherwise unpacks a bogus segment length and derails."""
    import struct

    from recipys_spark.operators.multimodal import parse_jpeg_meta

    sof = b"\xff\xc0" + struct.pack(">H", 2 + 6) + struct.pack(
        ">BHHB", 8, 7, 9, 3
    )
    # SOI, an APP0 segment padded with three fill 0xFF bytes before the
    # next marker, then SOF0
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
    payload = b"\xff\xd8" + app0 + b"\xff\xff\xff" + sof + b"\xff\xd9"
    assert parse_jpeg_meta(payload) == (9, 7, 3)
