"""Conv / BatchNorm / Linear / Dropout primitives with torch-compatible
semantics (so converted checkpoints are numerically identical).

Layout is TPU-native NHWC for convs; the checkpoint converter permutes
torch's NCHW/OIHW weights accordingly.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # torch default: running = (1-m)*running + m*batch


def init_conv_params(key, kh: int, kw: int, in_ch: int,
                     out_ch: int) -> Dict[str, jnp.ndarray]:
    """Xavier-uniform (reference init_layer, models.py:548-554). HWIO."""
    fan_in = in_ch * kh * kw
    fan_out = out_ch * kh * kw
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return {"w": jax.random.uniform(key, (kh, kw, in_ch, out_ch),
                                    minval=-bound, maxval=bound)}


def init_linear_params(key, in_dim: int, out_dim: int, bias: bool = True,
                       mode: str = "xavier") -> Dict[str, jnp.ndarray]:
    """Linear weights, right-multiply layout (in, out).

    mode="xavier": the reference's init_layer (zero bias).
    mode="torch": torch.nn.Linear default (kaiming_uniform a=sqrt(5) on the
    weight == uniform ±1/sqrt(fan_in); bias uniform ±1/sqrt(fan_in)) — used
    for the time/key MLP heads, which the reference never re-inits
    (reference: models.py:136-139).
    """
    k1, k2 = jax.random.split(key)
    if mode == "torch":
        bound = 1.0 / math.sqrt(in_dim)
        p = {"w": jax.random.uniform(k1, (in_dim, out_dim),
                                     minval=-bound, maxval=bound)}
        if bias:
            p["b"] = jax.random.uniform(k2, (out_dim,),
                                        minval=-bound, maxval=bound)
        return p
    bound = math.sqrt(6.0 / (in_dim + out_dim))
    p = {"w": jax.random.uniform(k1, (in_dim, out_dim),
                                 minval=-bound, maxval=bound)}
    if bias:
        p["b"] = jnp.zeros(out_dim)
    return p


def linear(params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


def init_embedding_params(key, num: int, dim: int) -> Dict[str, jnp.ndarray]:
    """torch.nn.Embedding default: N(0, 1)."""
    return {"emb": jax.random.normal(key, (num, dim))}


def embed(params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["emb"], ids, axis=0)


def init_bn_params(ch: int) -> Dict[str, jnp.ndarray]:
    return {"scale": jnp.ones(ch), "bias": jnp.zeros(ch)}


def init_bn_state(ch: int) -> Dict[str, jnp.ndarray]:
    return {"mean": jnp.zeros(ch), "var": jnp.ones(ch)}


def batch_norm(params, state, x: jnp.ndarray, axes: Tuple[int, ...],
               train: bool, weight=None):
    """BatchNorm over `axes` with torch semantics.

    Training normalizes by the biased batch variance and updates running
    stats with the unbiased variance; eval uses running stats.
    Returns (y, new_state).

    `weight` (train only; shape (B,), axis 0 must be in `axes`) weights
    each batch element's contribution to the BATCH STATISTICS — with 0/1
    weights this computes the statistics of the real rows only, so the
    final batch's padding duplicates (train/harness.py sample_weight)
    stop biasing train-mode normalization and the running stats. An
    all-zero weight vector (a fully-padded gradient-accumulation
    microbatch) falls back to unweighted statistics: those rows'
    activations are zero-weighted in the loss anyway, but 0/0 statistics
    would turn them into NaNs that poison the loss SUM.
    """
    if train and weight is not None:
        w_sum = jnp.sum(weight)
        w = jnp.where(w_sum > 0, weight,
                      jnp.ones_like(weight)).astype(x.dtype)
        wx = w.reshape((x.shape[0],) + (1,) * (x.ndim - 1))
        per_row = 1
        for a in axes:
            if a != 0:
                per_row *= x.shape[a]
        # n counts the rows actually contributing: sum(w) AFTER the
        # all-zero fallback (== w_sum normally, == B when falling back).
        n = jnp.sum(w) * per_row
        mean = jnp.sum(x * wx, axis=axes) / n
        shape_m = [1 if i in axes else x.shape[i] for i in range(x.ndim)]
        var = jnp.sum(wx * (x - mean.reshape(shape_m)) ** 2, axis=axes) / n
        unbiased = var * (n / jnp.maximum(n - 1, 1))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    elif train:
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = x.size // mean.size
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    shape = [1] * x.ndim
    for i in range(x.ndim):
        if i not in axes:
            shape[i] = x.shape[i]
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x - mean.reshape(shape)) * (inv * params["scale"]).reshape(shape) \
        + params["bias"].reshape(shape)
    return y, new_state


def conv2d_same(params, x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 SAME conv, NHWC/HWIO, no bias."""
    return jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dropout(key, x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    """Inverted dropout (torch F.dropout semantics)."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
