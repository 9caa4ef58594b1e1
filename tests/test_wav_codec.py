"""Real WAV (RIFF PCM) audio tier: codec round-trip, physically-correct
features on known sine tones, Spark mapInPandas end-to-end."""

import numpy as np
import pytest

from recipys_spark.operators.multimodal import (
    FEATURE_DIM,
    audio_features,
    codec_decoder,
    decode_wav,
    encode_wav,
    extract_features,
    synthetic_wavs,
    wav_decoder,
)


def test_wav_roundtrip_within_quantization():
    rs = np.random.RandomState(5)
    x = np.clip(rs.normal(scale=0.3, size=4000), -1, 1)
    back, rate = decode_wav(encode_wav(x, rate=16000))
    assert rate == 16000 and len(back) == len(x)
    np.testing.assert_allclose(back, x, atol=1.0 / 32767 + 1e-7)


def test_sine_features_are_physical():
    """A 400 Hz, amplitude-0.5 sine at 8 kHz: RMS = A/√2, peak = A,
    zero-crossing rate = 2f/rate, energy concentrated in the band
    containing 400 Hz."""
    rate, f, amp, dur = 8000, 400.0, 0.5, 0.5
    t = np.arange(int(rate * dur)) / rate
    x, r = decode_wav(encode_wav(amp * np.sin(2 * np.pi * f * t), rate))
    feats = audio_features(x, r)
    assert feats.shape == (FEATURE_DIM,)
    dur_s, rms, peak, zcr = feats[0], feats[1], feats[2], feats[3]
    np.testing.assert_allclose(dur_s, dur, rtol=1e-6)
    np.testing.assert_allclose(rms, amp / np.sqrt(2), rtol=1e-3)
    np.testing.assert_allclose(peak, amp, rtol=1e-3)
    np.testing.assert_allclose(zcr, 2 * f / rate, rtol=0.02)
    bands = feats[8:16]
    # rfft of 4000 samples at 8 kHz spans 0..4 kHz in 8 bands of 500 Hz:
    # 400 Hz falls in band 0
    assert bands.argmax() == 0 and bands[0] > 0.9


def test_codec_dispatch_and_stub():
    x = np.zeros(100)
    payload = encode_wav(x, 8000)
    feats = codec_decoder(payload)
    assert feats.shape == (FEATURE_DIM,)
    with pytest.raises(ValueError):  # JPEG magic → real decoder now
        codec_decoder(b"\xff\xd8\xff\xe0 fake jpeg header")
    with pytest.raises(NotImplementedError):  # inter-frame codecs stay out of scope
        codec_decoder(b"\x00\x00\x00\x18ftypmp42 video-ish")


def test_wav_spark_end_to_end_partitioning_invariant(spark):
    out = (
        extract_features(synthetic_wavs(spark, n=40), decoder=wav_decoder)
        .orderBy("media_id")
        .toPandas()
    )
    assert len(out) == 40 and (out.kind == "audio").all()
    mat = np.stack(out.features.map(np.array))
    # all tones share amplitude 0.5 → identical RMS column
    np.testing.assert_allclose(mat[:, 1], 0.5 / np.sqrt(2), rtol=1e-3)
    # zcr grows with the tone frequency id%20
    freqs = 200 + 50 * (out.media_id.to_numpy() % 20)
    np.testing.assert_allclose(mat[:, 3], 2 * freqs / 8000.0, rtol=0.05)

    out2 = (
        extract_features(
            synthetic_wavs(spark, n=40).repartition(7), decoder=wav_decoder
        )
        .orderBy("media_id")
        .toPandas()
    )
    np.testing.assert_array_equal(mat, np.stack(out2.features.map(np.array)))
