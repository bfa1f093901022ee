"""Additive (Bahdanau) attention, factored for autoregressive decode.

The reference recomputes ``tanh(W [h; enc])`` over all 1201 encoder frames at
every decode step (reference: models.py:440-461). Here the encoder-side
projection ``enc @ W_e + b`` is computed ONCE per clip (one MXU matmul) and
reused across the ~2900 sequential decode steps; each step only adds the
small query projection. Numerically identical to the reference (the cat-
linear splits exactly into the two projections).

Weight layout: ``w_query (2H, H)``, ``w_enc (2H, H)``, ``b (H,)``,
``v (H,)``; reference's Linear(4H -> H) weight is [w_query; w_enc] along the
input axis.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


def init_attention_params(key, hidden_size: int) -> Dict[str, jnp.ndarray]:
    """Xavier-uniform, matching the reference's init_layer on both linears
    (reference: models.py:444-450,548-554)."""
    k1, k2 = jax.random.split(key)
    # attn: Linear(4H -> H): fan_in = 4H, fan_out = H.
    bound = math.sqrt(6.0 / (4 * hidden_size + hidden_size))
    w = jax.random.uniform(k1, (4 * hidden_size, hidden_size),
                           minval=-bound, maxval=bound)
    bound_v = math.sqrt(6.0 / (hidden_size + 1))
    v = jax.random.uniform(k2, (hidden_size,), minval=-bound_v,
                           maxval=bound_v)
    return {
        "w_query": w[: 2 * hidden_size],
        "w_enc": w[2 * hidden_size:],
        "b": jnp.zeros(hidden_size),
        "v": v,
    }


def precompute_enc_proj(params, encoder_outputs: jnp.ndarray) -> jnp.ndarray:
    """enc @ w_enc + b, hoisted out of the decode loop.

    encoder_outputs: (B, T, 2H) -> (B, T, H).
    """
    return encoder_outputs @ params["w_enc"] + params["b"]


def attention_step(params, enc_proj: jnp.ndarray,
                   encoder_outputs: jnp.ndarray,
                   query: jnp.ndarray):
    """One decode-step attention read.

    enc_proj: (B, T, H) from :func:`precompute_enc_proj`;
    encoder_outputs: (B, T, 2H); query: (B, 2H) — the decoder hidden.
    Returns (context (B, 2H), weights (B, T)).
    """
    q = query @ params["w_query"]  # (B, H)
    energy = jnp.tanh(enc_proj + q[:, None, :])  # (B, T, H)
    scores = energy @ params["v"]  # (B, T)
    # Softmax in f32 even under bf16 decode (1201-way normalization).
    weights = jax.nn.softmax(
        scores.astype(jnp.promote_types(scores.dtype, jnp.float32)),
        axis=-1)
    context = jnp.einsum("bt,bth->bh",
                         weights.astype(encoder_outputs.dtype),
                         encoder_outputs)
    return context, weights
