"""Reverse converter: JAX checkpoint -> reference torch state_dict.

to_torch_state_dict must be the exact inverse of from_torch_state_dict
(round-trip bit-exact), and its output must strict-load into the live
reference model (/root/reference/models.py) and reproduce our greedy
decode — the "migrate back out" half of the checkpoint story.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_modules
from piano_a2s_tpu.models import ModelConfig, forward, init_params, init_state
from piano_a2s_tpu.models.convert import (from_torch_state_dict,
                                          to_torch_state_dict)

CFG = ModelConfig(freq_bins=32, conv_feature_size=64, hidden_size=48,
                  max_bars=2, max_length=(12, 9), note_emb_size=8,
                  staff_emb_size=8, time_sig_emb_size=5, key_emb_size=8)
B, T_SPEC = 2, 40


@pytest.fixture(scope="module")
def x64():
    with jax.enable_x64(True):
        yield


@pytest.fixture(scope="module")
def jax_ckpt(x64):
    params = init_params(jax.random.PRNGKey(11), CFG)
    state = init_state(CFG)
    # Nudge BN stats off the trivial (0, 1) init so the export is tested
    # with information-bearing running statistics.
    state = jax.tree.map(lambda x: x + 0.05, state)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), params)
    state = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), state)
    return params, state


def test_roundtrip_exact(jax_ckpt, x64):
    params, state = jax_ckpt
    sd = to_torch_state_dict(params, state, CFG)
    p2, s2 = from_torch_state_dict(sd, CFG)

    def assert_tree_equal(a, b, name):
        la = jax.tree_util.tree_leaves_with_path(a)
        lb = jax.tree.leaves(b)
        assert len(la) == len(lb)
        for (path, x), y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=f"{name}{path}")

    assert_tree_equal(params, p2, "params")
    assert_tree_equal(state, s2, "state")


def test_strict_load_and_forward_parity(jax_ckpt, x64):
    import torch
    params, state = jax_ckpt
    sd = to_torch_state_dict(params, state, CFG)

    ref_models, _ = reference_modules()
    tm = ref_models.ScoreTranscription(
        in_channels=1, freq_bins=CFG.freq_bins,
        conv_feature_size=CFG.conv_feature_size, hidden_size=CFG.hidden_size,
        max_bars=CFG.max_bars, num_time_sig=CFG.num_time_sig,
        num_keys=CFG.num_keys, max_length=CFG.max_length,
        note_emb_size=CFG.note_emb_size, staff_emb_size=CFG.staff_emb_size,
        time_sig_emb_size=CFG.time_sig_emb_size,
        key_emb_size=CFG.key_emb_size).double()
    tm.load_state_dict(sd, strict=True)
    tm.eval()

    spec = np.random.RandomState(5).randn(
        B, 1, T_SPEC, CFG.freq_bins).astype(np.float64)
    with torch.no_grad():
        t_ts, t_key, t_up, t_low = [
            o.numpy() for o in tm(torch.from_numpy(spec), inference=True,
                                  ground_truth=None, teacher_forcing_ratio=0.,
                                  device=torch.device("cpu"))]
    (ts, key, up, low, aux), _ = forward(
        params, state, jnp.asarray(spec), jax.random.PRNGKey(0), cfg=CFG,
        train=False)
    np.testing.assert_allclose(np.asarray(ts), t_ts, atol=1e-8)
    np.testing.assert_allclose(np.asarray(key), t_key, atol=1e-8)
    np.testing.assert_allclose(np.asarray(up), t_up, atol=1e-8)
    np.testing.assert_allclose(np.asarray(low), t_low, atol=1e-8)
    ran = np.abs(t_up).sum(-1) > 0
    assert ran.any()
    assert (np.asarray(aux["upper_tokens"])[ran]
            == t_up.argmax(-1)[ran]).all()
