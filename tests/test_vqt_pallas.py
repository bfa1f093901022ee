"""Pallas VQT kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from piano_a2s_tpu.ops.vqt import VQTConfig, build_kernels, vqt_magnitude
from piano_a2s_tpu.ops.vqt_pallas import vqt_magnitude_pallas

CFG = VQTConfig()


def test_pallas_matches_xla_batched():
    kernels = tuple(map(jnp.asarray, build_kernels(CFG)))
    rng = np.random.RandomState(0)
    y = (0.2 * rng.randn(2, 48000)).astype(np.float32)
    ref = np.asarray(vqt_magnitude(y, kernels, CFG))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(vqt_magnitude_pallas(y, kernels, CFG))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pallas_single_clip_and_ragged_tiles():
    kernels = tuple(map(jnp.asarray, build_kernels(CFG)))
    rng = np.random.RandomState(1)
    # 12 s clip -> 1201 frames: not a multiple of the 128-frame tile.
    y = (0.1 * rng.randn(192000)).astype(np.float32)
    ref = np.asarray(vqt_magnitude(y, kernels, CFG))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(vqt_magnitude_pallas(y, kernels, CFG))
    assert out.shape == (1201, 480)
    np.testing.assert_allclose(out, ref, atol=1e-4)
