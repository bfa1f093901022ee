"""BatchNorm padding-mask tests.

The loader pads the final (short) batch with duplicate rows to keep
shapes static and mesh-divisible; the harness zero-weights them
(train/harness.py sample_weight). Losses/gradients were already masked;
these tests pin that the duplicates are also masked out of train-mode
BatchNorm BATCH statistics (ops/layers.batch_norm weighted path), the
one divergence round-3 review left only documented. Reference behavior:
the PyTorch reference drops nothing — its DataLoader just emits a short
final batch (/root/reference/pretrain.py:270-297), i.e. BN statistics
come from the real rows only, which is exactly what the mask restores.
"""

import numpy as np

import jax
import jax.numpy as jnp

from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.models.score_transcription import conv_stack_apply
from piano_a2s_tpu.ops import layers as L

CFG = ModelConfig(freq_bins=16, conv_feature_size=24, hidden_size=16,
                  max_bars=2, max_length=(8, 6), note_emb_size=8,
                  staff_emb_size=8)


def _bn_io(ch=4, b_real=5, seed=0):
    rng = np.random.RandomState(seed)
    real = (rng.randn(b_real, 7, 3, ch) * 2 + 1).astype(np.float32)
    params = {"scale": jnp.asarray(rng.rand(ch).astype(np.float32) + 0.5),
              "bias": jnp.asarray(rng.randn(ch).astype(np.float32))}
    state = {"mean": jnp.asarray(rng.randn(ch).astype(np.float32)),
             "var": jnp.asarray(rng.rand(ch).astype(np.float32) + 0.5)}
    return params, state, real


def test_weighted_bn_equals_unweighted_on_real_rows():
    """Padded batch + 0/1 weights == unpadded real rows, exactly in
    semantics: identical normalized outputs on the real rows and
    identical running-stat updates."""
    params, state, real = _bn_io()
    padded = np.concatenate([real, real[:3]], axis=0)
    w = jnp.asarray([1.0] * 5 + [0.0] * 3)

    y_real, s_real = L.batch_norm(params, state, jnp.asarray(real),
                                  axes=(0, 1, 2), train=True)
    y_pad, s_pad = L.batch_norm(params, state, jnp.asarray(padded),
                                axes=(0, 1, 2), train=True, weight=w)
    np.testing.assert_allclose(np.asarray(y_pad)[:5], np.asarray(y_real),
                               rtol=1e-5, atol=1e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(s_pad[k]),
                                   np.asarray(s_real[k]),
                                   rtol=1e-5, atol=1e-7)


def test_weighted_bn_all_ones_matches_unweighted():
    """A full batch (the common case: weights all 1) is numerically the
    plain unweighted path."""
    params, state, real = _bn_io(seed=1)
    y0, s0 = L.batch_norm(params, state, jnp.asarray(real),
                          axes=(0, 1, 2), train=True)
    y1, s1 = L.batch_norm(params, state, jnp.asarray(real),
                          axes=(0, 1, 2), train=True,
                          weight=jnp.ones(real.shape[0]))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s0[k]),
                                   rtol=1e-5, atol=1e-7)


def test_weighted_bn_all_zero_falls_back_finite():
    """A fully-padded microbatch (all weights 0 under grad accumulation)
    must not produce 0/0 NaNs: it falls back to unweighted statistics."""
    params, state, real = _bn_io(seed=2)
    y, s = L.batch_norm(params, state, jnp.asarray(real),
                        axes=(0, 1, 2), train=True,
                        weight=jnp.zeros(real.shape[0]))
    y0, s0 = L.batch_norm(params, state, jnp.asarray(real),
                          axes=(0, 1, 2), train=True)
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)
    for k in ("mean", "var"):
        assert np.isfinite(np.asarray(s[k])).all()
        np.testing.assert_allclose(np.asarray(s[k]), np.asarray(s0[k]),
                                   rtol=1e-5, atol=1e-7)


def test_weighted_bn_2d_axes():
    """The flatten-linear BN normalizes over axes (0, 1) on (B, T, C);
    the weighted path must handle non-trailing reduce axes too."""
    rng = np.random.RandomState(3)
    real = rng.randn(4, 6, 5).astype(np.float32)
    padded = np.concatenate([real, real[:2]], axis=0)
    params, state = L.init_bn_params(5), L.init_bn_state(5)
    w = jnp.asarray([1.0] * 4 + [0.0] * 2)
    y_real, s_real = L.batch_norm(params, state, jnp.asarray(real),
                                  axes=(0, 1), train=True)
    y_pad, s_pad = L.batch_norm(params, state, jnp.asarray(padded),
                                axes=(0, 1), train=True, weight=w)
    np.testing.assert_allclose(np.asarray(y_pad)[:4], np.asarray(y_real),
                               rtol=1e-5, atol=1e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(s_pad[k]),
                                   np.asarray(s_real[k]),
                                   rtol=1e-5, atol=1e-7)


def test_conv_stack_bn_states_ignore_padding_duplicates():
    """End-to-end through the conv stack (all 5 BN layers, both axis
    layouts): training on a duplicate-padded batch with the harness's 0/1
    sample_weight yields BN running stats identical to training on the
    real rows alone."""
    params = init_params(jax.random.PRNGKey(0), CFG)["convstack"]
    state = init_state(CFG)["convstack"]
    rng = np.random.RandomState(4)
    x_real = rng.randn(3, 1, 20, CFG.freq_bins).astype(np.float32)
    x_pad = np.concatenate([x_real, x_real[:1]], axis=0)

    _, s_real = conv_stack_apply(params, state, jnp.asarray(x_real),
                                 True, jax.random.PRNGKey(1))
    _, s_pad = conv_stack_apply(params, state, jnp.asarray(x_pad),
                                True, jax.random.PRNGKey(1),
                                sample_weight=jnp.asarray([1., 1., 1., 0.]))
    flat_r, treedef_r = jax.tree.flatten(s_real)
    flat_p, treedef_p = jax.tree.flatten(s_pad)
    assert treedef_r == treedef_p
    for a, b in zip(flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_train_step_passes_sample_weight_to_bn():
    """Harness wiring: a train_step on a duplicate-padded batch updates
    BN running stats exactly as the same step on the real rows would
    (modulo dropout affecting only gradients, not BN stats: all conv
    BNs precede the dropout)."""
    from piano_a2s_tpu.train.step import make_optimizer, train_step
    from tests.test_grad_accum import _batch

    opt = make_optimizer(lr=1.0)

    def run(batch):
        params = init_params(jax.random.PRNGKey(0), CFG)
        state = init_state(CFG)
        opt_state = opt.init(params)
        _, _, new_state, out = jax.jit(
            lambda *a: train_step(*a, optimizer=opt, cfg=CFG))(
            params, opt_state, state, batch, jax.random.PRNGKey(7), 1.0)
        return new_state, float(out.loss)

    real = _batch(b=4, seed=5, sample_weight=[1, 1, 1, 1])
    # Padded batch: rows 0-3 real, rows 4-5 duplicates of rows 0-1.
    padded = {k: np.concatenate([v, v[:2]], axis=0) for k, v in real.items()
              if k != "sample_weight"}
    padded["sample_weight"] = np.asarray([1, 1, 1, 1, 0, 0], np.float32)

    s_real, loss_real = run(real)
    s_pad, loss_pad = run(padded)
    # Dropout masks differ between batch shapes, so losses only agree in
    # expectation — but all conv BNs run BEFORE the dropout, so the BN
    # running stats must match exactly.
    assert np.isfinite(loss_real) and np.isfinite(loss_pad)
    for a, b in zip(jax.tree.leaves(s_real["convstack"]),
                    jax.tree.leaves(s_pad["convstack"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)
