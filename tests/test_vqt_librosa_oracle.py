"""Direct-form TPU VQT vs an independent reimplementation of librosa's
multirate VQT algorithm (ops/vqt_oracle.py).

SURVEY §7 hard-part #1: the reference's spectrograms come from
``librosa.vqt`` (reference: utilities.py:240-254). librosa is not
installed here, so the oracle re-creates its *algorithm* (per-octave
wavelet banks, FFT filtering, early-downsampling recursion, scale=True
normalization) sharing no modeling decisions with ops/vqt.py. These
tests pin how far the direct form may drift from that model; measured
numbers are recorded in docs/DESIGN.md §9.
"""

import numpy as np
import pytest

from piano_a2s_tpu.ops.vqt import VQTConfig, get_vqt_host, vqt_host
from piano_a2s_tpu.ops.vqt_oracle import (get_vqt_librosa_host,
                                          vqt_librosa_host)

CFG = VQTConfig()
SR = CFG.sample_rate


def _freqs():
    return CFG.fmin * 2.0 ** (np.arange(CFG.n_bins) / CFG.bins_per_octave)


def test_steady_state_tone_magnitudes_per_octave():
    """A steady tone at a bin center must produce the same magnitude
    (within 1%) and the same leakage into a neighboring bin (within 2%
    relative) in both implementations, for every octave."""
    freqs = _freqs()
    for octave in range(CFG.n_octaves):
        k = octave * CFG.bins_per_octave + 30
        t = np.arange(int(3.0 * SR)) / SR
        y = np.sin(2 * np.pi * freqs[k] * t)
        a = vqt_host(y)
        b = vqt_librosa_host(y)
        n = min(a.shape[0], b.shape[0])
        mid = slice(n // 2 - 20, n // 2 + 20)  # steady state
        ra, rb = a[mid, k].mean(), b[mid, k].mean()
        assert abs(ra / rb - 1.0) < 0.01, (octave, ra, rb)
        leak_a = a[mid, k - 5].mean() / ra
        leak_b = b[mid, k - 5].mean() / rb
        assert abs(leak_a - leak_b) < 0.02, (octave, leak_a, leak_b)


def _piano_like(dur=4.0, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(dur * SR)) / SR
    y = np.zeros_like(t)
    for midi, onset, amp in [(60, 0.0, 1.0), (64, 0.5, 0.8), (67, 1.0, 0.6),
                             (36, 1.5, 0.9), (84, 2.0, 0.7), (21, 2.5, 0.8)]:
        if onset >= dur:
            continue
        f = 440.0 * 2 ** ((midi - 69) / 12)
        n0 = int(onset * SR)
        seg = t[:len(t) - n0]
        env = np.exp(-seg * 1.5)
        for h in range(1, 6):
            if f * h < SR / 2:
                y[n0:] += amp / h * env * np.sin(2 * np.pi * f * h * seg)
    return y + 1e-4 * rng.randn(len(t))


def test_log_spectrogram_agreement():
    """Model-input-level agreement on a polyphonic clip: the [0,1]
    log-VQT must correlate > 0.99 globally with per-octave mean abs
    difference < 0.04 (log scale; 0.04 = 3.2 dB, dominated by onset
    transients and the noise floor — steady content is far tighter)."""
    y = _piano_like()
    a = get_vqt_host(y).astype(np.float64)
    b = get_vqt_librosa_host(y).astype(np.float64)
    n = min(a.shape[0], b.shape[0])
    a, b = a[:n], b[:n]
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99
    for octave in range(CFG.n_octaves):
        s = slice(octave * CFG.bins_per_octave,
                  (octave + 1) * CFG.bins_per_octave)
        mean_d = np.abs(a[:, s] - b[:, s]).mean()
        assert mean_d < 0.04, (octave, mean_d)


def test_frame_counts_and_range():
    """Both produce ~1 + n//hop frames; outputs live in [0, 1]."""
    y = _piano_like(dur=2.0, seed=1)
    a = get_vqt_host(y)
    b = get_vqt_librosa_host(y)
    expect = 1 + len(y) // CFG.hop_length
    assert a.shape == (expect, CFG.n_bins)
    assert abs(b.shape[0] - expect) <= 1 and b.shape[1] == CFG.n_bins
    for s in (a, b):
        assert s.min() >= 0.0 and s.max() <= 1.0 + 1e-6


def test_oracle_rejects_supra_nyquist_bank():
    import dataclasses
    bad = dataclasses.replace(CFG, n_octaves=9)
    with pytest.raises(ValueError):
        vqt_librosa_host(np.zeros(SR), bad)
