"""Variable-Q transform (VQT) audio frontend.

The reference computes spectrograms offline with ``librosa.vqt`` (reference:
utilities.py:240-254; params hparams/pretrain.yaml:15-35: sr 16000, hop 160,
fmin A0=27.5 Hz, 60 bins/octave x 8 octaves = 480 bins, gamma 20) followed by
log compression ``db/80 + 1`` with ``amplitude_to_db(ref=max, top_db=80)``.

TPU-first design: with gamma=20 the variable-Q filter lengths are bounded by
~790 samples at 16 kHz (length_k = Q*sr / (f_k + gamma/alpha), Q = 1/alpha,
alpha = (2^(2/bpo)-1)/(2^(2/bpo)+1)), so the ENTIRE 480-bin filterbank fits
in one 1024-tap window: the transform is a single framed matmul
(frames x 1024) @ (1024 x 480) x {cos, sin} — two MXU matmuls per clip,
no multirate recursion, no host FFTs. librosa's recursive early-downsampling
is a CPU-era approximation of exactly this direct form; we compute the
direct form (equal or better accuracy). A numpy twin (`vqt_host`) with
identical math serves as the test oracle and the offline-pipeline fallback.

Note on normalization: the final ref=max dB normalization cancels any global
scale, so only per-bin relative scaling matters; filters are L1-normalized
and scaled by sqrt(length) to match librosa's `scale=True` convention.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VQTConfig:
    sample_rate: int = 16000
    hop_length: int = 160
    fmin: float = 27.5  # A0
    bins_per_octave: int = 60
    n_octaves: int = 8
    gamma: float = 20.0
    filter_scale: float = 1.0
    # Covers the longest filter (~787 taps). A multiple of hop_length
    # enables gather-free framing (reshape + 7 contiguous slices), which
    # batches well on TPU; non-multiples fall back to a gather.
    window_size: int = 1120

    @property
    def n_bins(self) -> int:
        return self.bins_per_octave * self.n_octaves


def _frequencies(cfg: VQTConfig) -> np.ndarray:
    return cfg.fmin * 2.0 ** (np.arange(cfg.n_bins) / cfg.bins_per_octave)


def filter_lengths(cfg: VQTConfig) -> np.ndarray:
    """Variable-Q filter lengths (samples)."""
    freqs = _frequencies(cfg)
    r = 2.0 ** (2.0 / cfg.bins_per_octave)
    alpha = (r - 1.0) / (r + 1.0)
    q = cfg.filter_scale / alpha
    return q * cfg.sample_rate / (freqs + cfg.gamma / alpha)


@functools.lru_cache(maxsize=8)
def build_kernels(cfg: VQTConfig = VQTConfig()) -> Tuple[np.ndarray,
                                                         np.ndarray]:
    """(cos, sin) kernel matrices of shape (window_size, n_bins), float32.

    Each column is an L1-normalized hann-windowed complex exponential of its
    variable-Q length, centered in the window and scaled by sqrt(length).
    Cached per config (the offline pipelines call the host VQT per file).
    """
    lengths = filter_lengths(cfg)
    freqs = _frequencies(cfg)
    w = cfg.window_size
    if lengths.max() > w:
        raise ValueError(
            f"window_size {w} shorter than max filter {lengths.max():.0f}")
    cos_k = np.zeros((w, cfg.n_bins), np.float64)
    sin_k = np.zeros((w, cfg.n_bins), np.float64)
    for k in range(cfg.n_bins):
        ilen = lengths[k]
        t = np.arange(-ilen // 2, ilen // 2)
        phase = 2.0 * math.pi * freqs[k] / cfg.sample_rate * t
        n = len(t)
        win = np.hanning(n + 2)[1:-1] if n > 1 else np.ones(1)
        sig_re = np.cos(phase) * win
        sig_im = np.sin(phase) * win
        l1 = np.sum(np.sqrt(sig_re ** 2 + sig_im ** 2))
        scale = math.sqrt(ilen) / l1
        start = (w - n) // 2
        cos_k[start:start + n, k] = sig_re * scale
        sin_k[start:start + n, k] = sig_im * scale
    return cos_k.astype(np.float32), sin_k.astype(np.float32)


def num_frames(n_samples: int, cfg: VQTConfig = VQTConfig()) -> int:
    return 1 + n_samples // cfg.hop_length


# ---------------------------------------------------------------------------
# TPU path
# ---------------------------------------------------------------------------

def _frame_signal(y_pad: jnp.ndarray, n: int, hop: int,
                  w: int) -> jnp.ndarray:
    """(..., L_pad) -> (..., n, w) sliding frames at stride hop.

    Fast path (hop | w): reshape to hop-rows and concatenate w//hop
    contiguous row slices — no gather, batches cleanly under vmap.
    """
    if w % hop == 0:
        k = w // hop
        required = (n + k - 1) * hop
        if y_pad.shape[-1] < required:
            pad_amt = [(0, 0)] * (y_pad.ndim - 1) + [
                (0, required - y_pad.shape[-1])]
            y_pad = jnp.pad(y_pad, pad_amt)
        rows = y_pad[..., :required].reshape(
            y_pad.shape[:-1] + (n + k - 1, hop))
        return jnp.concatenate(
            [rows[..., i:i + n, :] for i in range(k)], axis=-1)
    idx = jnp.arange(n)[:, None] * hop + jnp.arange(w)[None, :]
    return jnp.take(y_pad, idx, axis=-1)


@partial(jax.jit, static_argnames=("n_samples", "cfg"))
def _vqt_mag_jit(y: jnp.ndarray, cos_k: jnp.ndarray, sin_k: jnp.ndarray,
                 n_samples: int, cfg: VQTConfig) -> jnp.ndarray:
    w = cfg.window_size
    pad = w // 2
    y_pad = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)])
    n = num_frames(n_samples, cfg)
    frames = _frame_signal(y_pad, n, cfg.hop_length, w)  # (..., n, W)
    re = frames @ cos_k  # MXU
    im = frames @ sin_k
    return jnp.sqrt(re * re + im * im)  # (..., n_frames, n_bins)


def vqt_magnitude(y: jnp.ndarray, kernels, cfg: VQTConfig = VQTConfig()):
    """VQT magnitude: 1-D audio -> (n_frames, n_bins); batched audio
    (..., L) -> (..., n_frames, n_bins)."""
    cos_k, sin_k = kernels
    return _vqt_mag_jit(jnp.asarray(y, jnp.float32), cos_k, sin_k,
                        int(np.shape(y)[-1]), cfg)


def log_compress(mag: jnp.ndarray, amin: float = 1e-5,
                 top_db: float = 80.0) -> jnp.ndarray:
    """librosa amplitude_to_db(ref=max, top_db) / 80 + 1 (utilities.py:253).

    Output in [0, 1]. For batched input (..., T, F) the max-reference is
    taken per clip (last two axes), matching per-clip offline computation.
    """
    power = jnp.maximum(mag, amin) ** 2
    ref = jnp.max(power, axis=(-2, -1), keepdims=True)
    db = 10.0 * (jnp.log10(power) - jnp.log10(ref))
    db = jnp.maximum(db, jnp.max(db, axis=(-2, -1), keepdims=True) - top_db)
    return db / top_db + 1.0


def get_vqt(y, kernels=None, cfg: VQTConfig = VQTConfig()) -> jnp.ndarray:
    """End-to-end audio -> log-VQT spectrogram (n_frames, n_bins),
    matching the reference's get_VQT output convention."""
    if kernels is None:
        kernels = tuple(map(jnp.asarray, build_kernels(cfg)))
    return log_compress(vqt_magnitude(y, kernels, cfg))


# ---------------------------------------------------------------------------
# Host (numpy) twin — test oracle and offline-pipeline fallback
# ---------------------------------------------------------------------------

def vqt_host(y: np.ndarray, cfg: VQTConfig = VQTConfig()) -> np.ndarray:
    """Numpy implementation with identical math (float64)."""
    cos_k, sin_k = build_kernels(cfg)
    w = cfg.window_size
    y_pad = np.pad(np.asarray(y, np.float64), (w // 2, w // 2))
    n = num_frames(len(y), cfg)
    idx = np.arange(n)[:, None] * cfg.hop_length + np.arange(w)[None, :]
    frames = y_pad[idx]
    re = frames @ cos_k.astype(np.float64)
    im = frames @ sin_k.astype(np.float64)
    return np.sqrt(re ** 2 + im ** 2)


def log_compress_host(mag: np.ndarray, amin: float = 1e-5,
                      top_db: float = 80.0) -> np.ndarray:
    """Host twin of the on-device log compression (db/top_db + 1, ref=max;
    reference: utilities.py:253). Shared by the direct-form host path and
    the librosa-algorithm oracle so the comparison differs only in the
    transform itself."""
    power = np.maximum(mag, amin) ** 2
    db = 10.0 * (np.log10(power) - np.log10(power.max()))
    db = np.maximum(db, db.max() - top_db)
    return (db / top_db + 1.0).astype(np.float32)


def get_vqt_host(y: np.ndarray, cfg: VQTConfig = VQTConfig(),
                 amin: float = 1e-5, top_db: float = 80.0) -> np.ndarray:
    return log_compress_host(vqt_host(y, cfg), amin, top_db)
