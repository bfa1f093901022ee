"""Pallas TPU kernel for the VQT frontend.

Fuses framing + the complex filterbank matmul + magnitude into one kernel:
each program DMAs its (overlapping) audio slice from HBM into a VMEM
scratch and builds the (frames x window) matrix ON-CHIP via the
reshape/stack trick, so the 8x-larger frame matrix never exists in HBM.
The XLA path (ops/vqt.py) materializes (B, n_frames, 1120) frames
(~96 MB at B=16); this kernel reads only the raw audio (~12 MB) plus the
filterbank.

Grid: (batch, frame-tile). Overlapping input windows are not expressible
as a BlockSpec tiling, hence the manual async copy.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vqt import VQTConfig, build_kernels, num_frames

FRAME_TILE = 128


def _vqt_kernel(y_ref, cos_ref, sin_ref, out_ref, *, hop: int, w: int,
                tile: int):
    j = pl.program_id(1)  # frame tile
    k = w // hop
    # frames @ K decomposes into k row-shifted sub-matmuls — no on-chip
    # frame matrix, no unsupported reshapes:
    #   frames[t, :] = concat_d rows[t+d]  =>
    #   out = sum_d rows[d:d+tile] @ K[d*hop:(d+1)*hop]
    # Aligned load of tile+8 rows (start j*tile is a multiple of 8), then
    # static value-level slices provide the d-shifted row windows.
    v = y_ref[0, pl.ds(j * tile, tile + 8), :]
    re = jnp.zeros(out_ref.shape[1:], jnp.float32)
    im = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for d in range(k):
        rows_d = jax.lax.slice_in_dim(v, d, d + tile, axis=0)
        re += jnp.dot(rows_d, cos_ref[d * hop:(d + 1) * hop, :],
                      preferred_element_type=jnp.float32)
        im += jnp.dot(rows_d, sin_ref[d * hop:(d + 1) * hop, :],
                      preferred_element_type=jnp.float32)
    out_ref[0] = jnp.sqrt(re * re + im * im)


@partial(jax.jit, static_argnames=("n_samples", "cfg"))
def _vqt_mag_pallas(y: jnp.ndarray, cos_k: jnp.ndarray, sin_k: jnp.ndarray,
                    n_samples: int, cfg: VQTConfig) -> jnp.ndarray:
    w, hop = cfg.window_size, cfg.hop_length
    assert w % hop == 0, "pallas VQT needs window_size % hop_length == 0"
    k = w // hop
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    b = y.shape[0]
    n = num_frames(n_samples, cfg)
    n_tiles = -(-n // FRAME_TILE)
    n_padded = n_tiles * FRAME_TILE
    needed = (n_padded + 8) * hop  # +8 rows for the aligned shifted loads
    y_pad = jnp.pad(y, ((0, 0), (w // 2, 0)))
    y_pad = jnp.pad(y_pad, ((0, 0), (0, max(0, needed - y_pad.shape[1]))))

    n_rows = n_padded + 8
    y_rows = y_pad[:, :needed].reshape(b, n_rows, hop)
    out = pl.pallas_call(
        partial(_vqt_kernel, hop=hop, w=w, tile=FRAME_TILE),
        out_shape=jax.ShapeDtypeStruct((b, n_padded, cfg.n_bins),
                                       jnp.float32),
        grid=(b, n_tiles),
        in_specs=[
            # whole row-sequence of this batch item (<1 MB) in VMEM;
            # the kernel takes row-shifted dynamic slices of it
            pl.BlockSpec((1, n_rows, hop), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, cfg.n_bins), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, cfg.n_bins), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FRAME_TILE, cfg.n_bins),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )(y_rows, cos_k, sin_k)
    out = out[:, :n]
    return out[0] if squeeze else out


def vqt_magnitude_pallas(y, kernels=None,
                         cfg: VQTConfig = VQTConfig()) -> jnp.ndarray:
    """Drop-in fused replacement for ops.vqt.vqt_magnitude."""
    if kernels is None:
        kernels = tuple(map(jnp.asarray, build_kernels(cfg)))
    cos_k, sin_k = kernels
    return _vqt_mag_pallas(jnp.asarray(y, jnp.float32), cos_k, sin_k,
                           int(np.shape(y)[-1]), cfg)


def get_vqt_pallas(y, kernels=None, cfg: VQTConfig = VQTConfig()):
    from .vqt import log_compress
    if kernels is None:
        kernels = tuple(map(jnp.asarray, build_kernels(cfg)))
    return log_compress(vqt_magnitude_pallas(y, kernels, cfg))
