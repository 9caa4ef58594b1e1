"""Pure-stdlib PNG codec: the real compressed-decode tier for the
multimodal column plumbing (no Pillow/libpng — zlib is stdlib).

Round-trips cover every scanline filter type (the encoder emits filter
0; the other four are forward-filtered by hand here so the decoder's
unfiltering is pinned against a known image), gray/RGB/RGBA, and the
end-to-end Arrow mapInPandas path over genuine PNG payloads.
"""

import struct
import zlib

import numpy as np
import pytest

from recipys_spark.operators.multimodal import (
    FEATURE_DIM,
    codec_decoder,
    decode_png,
    encode_png,
    extract_features,
    image_features,
    png_decoder,
    resize_nearest,
    synthetic_pngs,
    PNG_MAGIC,
)


def _img(h=11, w=7, ch=3, seed=5):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.integers(0, 256, size=shape).astype(np.uint8)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip_filter0(ch):
    img = _img(ch=ch)
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out, img)


def _forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """Apply PNG filter `ftype` to every scanline (encoder side of the
    spec) so the decoder's unfiltering can be tested independently."""
    img = np.asarray(img, dtype=np.int64)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    raw = img.reshape(h, w * ch)
    stride = w * ch
    lines = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = raw[y]
        a = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
        b = prev
        c = np.concatenate([np.zeros(ch, dtype=np.int64), prev[:-ch]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - a
        elif ftype == 2:
            filt = cur - b
        elif ftype == 3:
            filt = cur - (a + b) // 2
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pr = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            filt = cur - pr
        lines.append(bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur
    return b"".join(lines)


def _wrap_png(scanlines: bytes, w: int, h: int, color_type: int) -> bytes:
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch,color_type", [(1, 0), (3, 2), (4, 6)])
def test_png_unfilters_every_type(ftype, ch, color_type):
    img = _img(h=9, w=6, ch=ch)
    payload = _wrap_png(
        _forward_filter(img, ftype), img.shape[1], img.shape[0], color_type
    )
    np.testing.assert_array_equal(decode_png(payload), img)


def test_png_multiple_idat_chunks():
    """Decoders must concatenate IDAT payloads before inflating."""
    img = _img(h=4, w=4, ch=3)
    full = encode_png(img)
    # split the single IDAT into two chunks
    def chunks(b):
        pos, out = 8, []
        while pos + 8 <= len(b):
            (ln,) = struct.unpack_from(">I", b, pos)
            out.append((b[pos + 4 : pos + 8], b[pos + 8 : pos + 8 + ln]))
            pos += 12 + ln
        return out

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    parts = chunks(full)
    idat = next(b for t, b in parts if t == b"IDAT")
    rebuilt = PNG_MAGIC + b"".join(
        chunk(b"IDAT", idat[: len(idat) // 2])
        + chunk(b"IDAT", idat[len(idat) // 2 :])
        if t == b"IDAT"
        else chunk(t, b)
        for t, b in parts
    )
    np.testing.assert_array_equal(decode_png(rebuilt), img)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"P6 garbage")
    img = _img(h=3, w=3, ch=3)
    bad_depth = bytearray(encode_png(img))
    bad_depth[24] = 16  # IHDR bit depth byte
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(bytes(bad_depth))


def test_codec_decoder_routes_png_and_stubs_rest():
    img = _img(h=8, w=8, ch=3)
    feats = codec_decoder(encode_png(img))
    assert feats.shape == (FEATURE_DIM,)
    expect = image_features(resize_nearest(img, 8, 8))
    np.testing.assert_allclose(feats, expect)
    # JPEG magic now routes to the real baseline decoder (a garbage
    # body is a ValueError there, not a stub); unknown magic (an MP4
    # ftyp box = inter-frame codec) stays the documented out-of-scope
    # error
    with pytest.raises(ValueError):
        codec_decoder(b"\xff\xd8\xff jpeg-ish")
    with pytest.raises(NotImplementedError):
        codec_decoder(b"\x00\x00\x00\x18ftypmp42 video-ish")


def test_png_decoder_rgba_drops_alpha():
    img = _img(h=8, w=8, ch=4)
    feats = png_decoder(encode_png(img))
    np.testing.assert_allclose(
        feats, image_features(resize_nearest(img[:, :, :3], 8, 8))
    )


def test_png_mapinpandas_end_to_end(spark):
    """Arrow mapInPandas over genuine compressed PNG payloads: decoded
    features match the same pattern decoded driver-side, and are
    partitioning-invariant."""
    df = synthetic_pngs(spark, n=24, size=16)
    out = (
        extract_features(df, decoder=png_decoder)
        .orderBy("media_id")
        .collect()
    )
    assert len(out) == 24
    # recompute row 7's features driver-side from the same pattern
    mid, size = 7, 16
    yy, xx = np.mgrid[0:size, 0:size]
    r = (xx * 255 // (size - 1)).astype(np.uint8)
    g = (yy * 255 // (size - 1)).astype(np.uint8)
    b = (((xx + yy + mid) % 8) * 32).astype(np.uint8)
    expect = png_decoder(encode_png(np.stack([r, g, b], axis=-1)))
    np.testing.assert_allclose(
        np.array(out[mid]["features"], dtype=np.float32), expect, rtol=1e-6
    )
    repart = (
        extract_features(df.repartition(7), decoder=png_decoder)
        .orderBy("media_id")
        .collect()
    )
    for a, c in zip(out, repart):
        assert a["features"] == c["features"]
