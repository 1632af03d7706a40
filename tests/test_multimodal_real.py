"""Real-mode decode tests for X5 multimodal kernels.

Audio real mode uses the stdlib ``wave`` module, so it runs everywhere;
image/video real modes are import-guarded (PIL / PyAV) and their tests
skip cleanly when the libraries are absent — the same contract as the
kernels themselves.
"""

from __future__ import annotations

import io
import wave

import pytest

from apache_spark_streaming_project_spark.operators import multimodal as mm


def _wav_bytes(samples: list[int], sample_rate: int = 8000) -> bytes:
    """PCM-16 mono WAV container around the given int16 samples."""
    import array

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(array.array("h", samples).tobytes())
    return buf.getvalue()


def _media_df(spark, payloads: list[bytes], media_type: str = "audio"):
    rows = [
        (i, p, (media_type, "wav", None, None, 1000, 8000))
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA).coalesce(1)


def test_real_audio_wav_features(spark):
    """Real mode parses actual WAV containers (stdlib wave — no external
    dependency) and reports the same feature definitions as fake mode:
    n samples, exact sum of squares, rms, zero crossings."""
    samples = [100, -100, 200, -200, 0, 300]
    df = _media_df(spark, [_wav_bytes(samples)])
    row = mm.extract_audio_features(df, fake_decode=False).collect()[0]
    assert row.n_bytes == len(samples)
    assert row.sum_sq == sum(s * s for s in samples)
    assert row.rms == pytest.approx((row.sum_sq / len(samples)) ** 0.5)
    # sign transitions: 100->-100, -100->200, 200->-200, -200->0 (0 counts
    # as non-negative), 0->300 stays non-negative
    assert row.zero_crossings == 4


def test_real_audio_pcm8_wav(spark):
    """PCM-8 WAV decodes through the unsigned->centered path."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([128, 255, 0, 128]))
    df = _media_df(spark, [buf.getvalue()])
    row = mm.extract_audio_features(df, fake_decode=False).collect()[0]
    assert row.n_bytes == 4
    assert row.sum_sq == 0 + 127 * 127 + 128 * 128 + 0


def test_real_image_mode_guarded(spark):
    """With PIL present, real mode decodes an actual PNG and histograms
    pixel intensities; without it, the kernel raises the documented
    NotImplementedError (wrapped by Spark)."""
    if not mm._HAS_PIL:
        df = _media_df(spark, [b"\x00" * 16], "image")
        with pytest.raises(Exception, match="requires PIL"):
            mm.extract_image_features(df, fake_decode=False).collect()
        return
    from PIL import Image

    img = Image.new("L", (4, 4), color=255)  # 16 white pixels -> bin 7
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = _media_df(spark, [buf.getvalue()], "image")
    row = mm.extract_image_features(df, fake_decode=False).collect()[0]
    assert row.hist == [0, 0, 0, 0, 0, 0, 0, 16]


def test_real_video_mode_guarded(spark):
    """PyAV-backed frame extraction, or the documented error without it."""
    df = _media_df(spark, [b"\x00" * 16], "video")
    if not mm._HAS_AV:
        with pytest.raises(Exception, match="requires PyAV"):
            mm.sample_video_frames(df, fake_decode=False).collect()
        return
    pytest.importorskip("av")  # real-container fixture only when av exists


def test_fake_mode_unchanged_by_real_path(spark):
    """The fake (oracle) kernels are untouched by the real-mode additions:
    byte histogram and int8-waveform features match the documented
    definitions exactly."""
    payload = bytes(range(256))
    df = _media_df(spark, [payload], "image")
    row = mm.extract_image_features(df, fake_decode=True).collect()[0]
    assert row.hist == [32] * 8 and row.n_bytes == 256
    arow = mm.extract_audio_features(df, fake_decode=True).collect()[0]
    assert arow.sum_sq == sum((b - 128) ** 2 for b in payload)
