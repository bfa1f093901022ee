"""bidir_final_fused == per-sequence bidir_final (exact semantics).

The fused scan runs all S staff summaries x both directions as one
lax.scan (ops/gru.py); the decoder relies on it matching torch
pack_padded_sequence final-hidden semantics, which `bidir_final` is
already parity-pinned to via the model tests (reference:
models.py:164-189).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from piano_a2s_tpu.ops.gru import (bidir_final, bidir_final_fused,
                                   init_gru_params)


@pytest.mark.parametrize("S,B,T,F,H", [(4, 3, 11, 16, 32), (2, 1, 7, 5, 8)])
def test_fused_matches_separate(S, B, T, F, H):
    k = jax.random.PRNGKey(0)
    kf, kb, kx = jax.random.split(k, 3)
    pf = init_gru_params(kf, F, H, mode="torch")
    pb = init_gru_params(kb, F, H, mode="torch")
    xs = jax.random.normal(kx, (S, B, T, F))
    rng = np.random.RandomState(0)
    lengths = jnp.asarray(rng.randint(1, T + 1, (S, B)))

    fused = bidir_final_fused(pf, pb, xs, lengths)
    for s in range(S):
        ref = bidir_final(pf, pb, xs[s], lengths[s])
        np.testing.assert_allclose(np.asarray(fused[s]), np.asarray(ref),
                                   rtol=0, atol=1e-6)


def test_fused_edge_lengths():
    """length == T (every step valid) and length == 0 (h0 passthrough)."""
    k = jax.random.PRNGKey(1)
    kf, kb, kx = jax.random.split(k, 3)
    F, H, B, T = 4, 6, 2, 5
    pf = init_gru_params(kf, F, H, mode="torch")
    pb = init_gru_params(kb, F, H, mode="torch")
    xs = jax.random.normal(kx, (2, B, T, F))
    lengths = jnp.array([[T, T], [0, 0]])

    fused = bidir_final_fused(pf, pb, xs, lengths)
    full = bidir_final(pf, pb, xs[0], lengths[0])
    np.testing.assert_allclose(np.asarray(fused[0]), np.asarray(full),
                               rtol=0, atol=1e-6)
    # Zero-length sequences never update: final hidden is h0 == 0.
    np.testing.assert_array_equal(np.asarray(fused[1]), 0.0)


def test_fused_ignores_padded_tail():
    """Positions beyond `length` must not influence the result — the
    decoder pads the shorter staff's tokens to a common T before
    stacking (models/score_transcription.py bar_body)."""
    k = jax.random.PRNGKey(2)
    kf, kb, kx = jax.random.split(k, 3)
    F, H, B, T = 3, 4, 2, 9
    pf = init_gru_params(kf, F, H, mode="torch")
    pb = init_gru_params(kb, F, H, mode="torch")
    xs = jax.random.normal(kx, (1, B, T, F))
    lengths = jnp.array([[4, 7]])
    out = bidir_final_fused(pf, pb, xs, lengths)
    xs_junk = xs.at[0, 0, 4:].set(123.0).at[0, 1, 7:].set(-55.0)
    out_junk = bidir_final_fused(pf, pb, xs_junk, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_junk),
                               rtol=0, atol=0)


def test_gru_sequence_matches_step_loop():
    """ops.gru.gru_sequence (the plain full-sequence runner) == stepping
    gru_step manually, forward and reverse — pins the hoisted input
    projection against the per-step primitive the decoders use."""
    from piano_a2s_tpu.ops.gru import gru_sequence, gru_step

    k = jax.random.PRNGKey(3)
    kp, kx = jax.random.split(k)
    F, H, B, T = 5, 6, 3, 7
    p = init_gru_params(kp, F, H, mode="piano")
    xs = jax.random.normal(kx, (T, B, F))
    h0 = jnp.zeros((B, H))

    hs, h_t = gru_sequence(p, xs, h0)
    h = h0
    for t in range(T):
        h = gru_step(p, xs[t], h)
        np.testing.assert_allclose(np.asarray(hs[t]), np.asarray(h),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_t), np.asarray(h),
                               rtol=1e-6, atol=1e-6)

    # reverse=True: hs[t] is the state after consuming xs[t..T-1]
    hs_r, h_t_r = gru_sequence(p, xs, h0, reverse=True)
    h = h0
    for t in range(T - 1, -1, -1):
        h = gru_step(p, xs[t], h)
        np.testing.assert_allclose(np.asarray(hs_r[t]), np.asarray(h),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_t_r), np.asarray(h),
                               rtol=1e-6, atol=1e-6)
