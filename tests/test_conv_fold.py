"""Inference-time BatchNorm folding in the ConvStack.

Eval-mode BN is a per-channel affine; conv_stack_apply folds it into the
conv weights / flatten-linear weights (docs/DESIGN.md §2). These tests pin
that the folded fast path equals the unfolded conv->BN->ReLU chain
exactly (f64), including the out_bn stage and state passthrough, and that
the bf16 frontend variant stays close to f32."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.models.score_transcription import conv_stack_apply
from piano_a2s_tpu.ops import layers as L

CFG = ModelConfig(freq_bins=16, conv_feature_size=24)


@pytest.fixture()
def x64():
    with jax.enable_x64(True):
        yield


def _randomized(x64=False):
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_state(CFG)
    rng = np.random.RandomState(1)
    for k in state["convstack"]:
        state["convstack"][k]["mean"] = jnp.asarray(
            rng.randn(*state["convstack"][k]["mean"].shape), jnp.float32)
        state["convstack"][k]["var"] = jnp.asarray(
            np.abs(rng.randn(*state["convstack"][k]["var"].shape)) + 0.5,
            jnp.float32)
    p, s = params["convstack"], state["convstack"]
    if x64:
        p = jax.tree.map(lambda a: a.astype(jnp.float64), p)
        s = jax.tree.map(lambda a: a.astype(jnp.float64), s)
    x = jnp.asarray(rng.randn(2, 1, 30, CFG.freq_bins),
                    jnp.float64 if x64 else jnp.float32)
    return p, s, x


def _unfolded_eval(p, s, x):
    y = jnp.transpose(x, (0, 2, 3, 1))
    for i in (1, 2, 3, 4):
        y = L.conv2d_same(p[f"conv{i}"], y)
        y, _ = L.batch_norm(p[f"bn{i}"], s[f"bn{i}"], y, axes=(0, 1, 2),
                            train=False)
        y = jax.nn.relu(y)
    b, t, f, c = y.shape
    y = y.reshape(b, t, f * c)
    y = L.linear(p["out"], y)
    y, _ = L.batch_norm(p["out_bn"], s["out_bn"], y, axes=(0, 1),
                        train=False)
    return jax.nn.relu(y)


def test_folded_equals_unfolded_f64(x64):
    p, s, x = _randomized(x64=True)
    y_fold, s_out = conv_stack_apply(p, s, x, train=False,
                                     rng=jax.random.PRNGKey(0))
    y_ref = _unfolded_eval(p, s, x)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               atol=1e-12)
    # inference must not touch BN state
    for k in s:
        for kk in s[k]:
            assert (np.asarray(s_out[k][kk]) == np.asarray(s[k][kk])).all()


def test_folded_f32_matches_unfolded_f32():
    p, s, x = _randomized()
    y_fold, _ = conv_stack_apply(p, s, x, train=False,
                                 rng=jax.random.PRNGKey(0))
    y_ref = _unfolded_eval(p, s, x)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_bf16_frontend_close_to_f32():
    p, s, x = _randomized()
    y32, _ = conv_stack_apply(p, s, x, train=False,
                              rng=jax.random.PRNGKey(0))
    y16, _ = conv_stack_apply(p, s, x.astype(jnp.bfloat16), train=False,
                              rng=jax.random.PRNGKey(0))
    assert y16.dtype == jnp.bfloat16
    scale = float(jnp.max(jnp.abs(y32))) + 1e-6
    rel = float(jnp.max(jnp.abs(y16.astype(jnp.float32) - y32))) / scale
    assert rel < 0.1, rel


def test_train_path_unchanged_by_fold():
    """Training still uses batch statistics + running-stat updates."""
    p, s, x = _randomized()
    y, s_out = conv_stack_apply(p, s, x, train=True,
                                rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(y)).all()
    changed = any(
        not (np.asarray(s_out[k][kk]) == np.asarray(s[k][kk])).all()
        for k in s for kk in s[k])
    assert changed, "train-mode BN must update running stats"
