"""Unit tests for the shared audio contracts in utils.audio: the PCM16
round-trip scale, fixed-length trim/pad, and mixed-dtype batch stacking
(the single source of truth for datasets, serving ingest, and loader
staging — see the round-3 mixed-dtype corruption regression)."""

import numpy as np

from piano_a2s_tpu.utils.audio import (PCM16_SCALE, pcm16_to_float,
                                       stack_audio_batch, to_pcm16,
                                       trim_pad_audio)


def test_pcm16_round_trip():
    x = np.linspace(-1, 1, 1001).astype(np.float32)
    pcm = to_pcm16(x)
    assert pcm.dtype == np.int16
    back = pcm16_to_float(pcm)
    assert back.dtype == np.float32
    np.testing.assert_allclose(back, np.clip(x, -1, 32767 / PCM16_SCALE),
                               atol=0.5 / PCM16_SCALE)
    # -1.0 maps inside range (no wraparound); +1.0 clips to 32767
    assert to_pcm16(np.array([-1.0]))[0] == -32768
    assert to_pcm16(np.array([1.0]))[0] == 32767
    # int16 values pass through pcm16_to_float with the exact scale
    assert pcm16_to_float(np.array([16384], np.int16))[0] == 0.5


def test_trim_pad_audio():
    f = np.ones(10, np.float32)
    assert trim_pad_audio(f, 6).shape == (6,)
    padded = trim_pad_audio(f, 15)
    assert padded.shape == (15,) and padded.dtype == np.float32
    assert (padded[10:] == 0).all()
    i = np.full(4, 100, np.int16)
    out = trim_pad_audio(i, 8)
    assert out.dtype == np.int16 and (out[4:] == 0).all()
    # float64 normalizes to float32
    assert trim_pad_audio(np.zeros(4, np.float64), 4).dtype == np.float32


def test_stack_audio_batch():
    i16 = np.full(8, 16384, np.int16)
    f32 = np.full(8, 0.25, np.float32)
    # uniform batches keep their dtype
    assert stack_audio_batch([i16, i16]).dtype == np.int16
    assert stack_audio_batch([f32, f32]).dtype == np.float32
    # mixed batches normalize through the PCM16 scale, not raw values
    mixed = stack_audio_batch([i16, f32])
    assert mixed.dtype == np.float32
    np.testing.assert_allclose(mixed[0], 0.5)
    np.testing.assert_allclose(mixed[1], 0.25)
