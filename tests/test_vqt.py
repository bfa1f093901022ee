"""VQT frontend tests: TPU path vs numpy oracle, and signal-level sanity."""

import numpy as np
import pytest

from piano_a2s_tpu.ops.vqt import (
    VQTConfig, build_kernels, filter_lengths, get_vqt, get_vqt_host,
    num_frames, vqt_host, vqt_magnitude)

CFG = VQTConfig()


def _sine(freq, dur=1.0, sr=16000, amp=0.5):
    t = np.arange(int(dur * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_filter_lengths_fit_window():
    lengths = filter_lengths(CFG)
    assert lengths.max() < CFG.window_size
    assert lengths.min() > 8
    # Variable-Q: monotonically decreasing with frequency.
    assert (np.diff(lengths) < 0).all()


def test_frame_count_matches_reference_convention():
    # 12 s @ 16 kHz, hop 160 -> 1201 frames (hparams/pretrain.yaml:24).
    assert num_frames(12 * 16000, CFG) == 1201


def test_sine_peaks_at_correct_bin():
    kernels = build_kernels(CFG)
    for note_bin, freq in [(0, 27.5), (60, 55.0), (240, 440.0),
                           (300, 880.0), (420, 3520.0)]:
        y = _sine(freq)
        mag = np.asarray(vqt_magnitude(y, tuple(map(np.asarray, kernels)),
                                       CFG))
        mid = mag[mag.shape[0] // 2]
        # gamma=20 filters span ~1.4 cycles at A0 — low-octave selectivity
        # is inherently smeared (same for librosa's VQT); tighter above.
        tol = 3 if note_bin < 120 else 1
        assert abs(int(np.argmax(mid)) - note_bin) <= tol, (freq, note_bin)


def test_tpu_path_matches_host_oracle():
    rng = np.random.RandomState(0)
    y = rng.randn(16000).astype(np.float32) * 0.1
    kernels = build_kernels(CFG)
    mag_jax = np.asarray(vqt_magnitude(y, kernels, CFG))
    mag_np = vqt_host(y, CFG)
    # f32 matmul vs f64 oracle.
    np.testing.assert_allclose(mag_jax, mag_np, atol=2e-4, rtol=2e-3)


def test_log_compress_range_and_parity():
    y = _sine(440.0, dur=0.5) + _sine(660.0, dur=0.5, amp=0.25)
    s_jax = np.asarray(get_vqt(y))
    s_np = get_vqt_host(y)
    assert s_jax.shape == (num_frames(len(y)), 480)
    assert 0.0 <= s_jax.min() and s_jax.max() <= 1.0 + 1e-6
    assert abs(s_jax.max() - 1.0) < 1e-6  # ref=max -> peak compresses to 1
    np.testing.assert_allclose(s_jax, s_np, atol=5e-3)


def test_silence_is_floor():
    y = np.zeros(8000, np.float32)
    s = np.asarray(get_vqt(y))
    # All-zero audio: every bin sits at the amin floor -> db/80+1 == 1.
    assert np.allclose(s, 1.0)


def test_twelve_second_clip_shape():
    y = _sine(261.6, dur=12.0)
    s = np.asarray(get_vqt(y))
    assert s.shape == (1201, 480)
