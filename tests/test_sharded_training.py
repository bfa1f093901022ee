"""Data-parallel training on the virtual 8-device CPU mesh: the full train
step jitted with shardings, loss decreasing, and replica consistency."""

import numpy as np

import jax
import jax.numpy as jnp

from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.parallel import make_mesh, put_batch, put_replicated
from piano_a2s_tpu.train.step import (make_jitted_steps, make_optimizer,
                                      set_learning_rate)

CFG = ModelConfig(freq_bins=16, conv_feature_size=32, hidden_size=16,
                  max_bars=2, max_length=(8, 6), note_emb_size=8,
                  staff_emb_size=8, time_sig_emb_size=5, key_emb_size=8)


def _batch(b=8, t=24, seed=0):
    rng = np.random.RandomState(seed)
    up = rng.randint(0, 140, (b, CFG.max_bars, CFG.max_length[0]))
    low = rng.randint(0, 140, (b, CFG.max_bars, CFG.max_length[1]))
    up[:, :, -2:] = CFG.pad
    low[:, :, -2:] = CFG.pad
    up[:, :, 4] = CFG.eos
    low[:, :, 3] = CFG.eos
    return {
        "spectrogram": rng.randn(b, 1, t, CFG.freq_bins).astype(np.float32),
        "time_sig": rng.randint(0, 7, (b, CFG.max_bars)),
        "key": rng.randint(0, 14, (b, CFG.max_bars)),
        "upper": up, "upper_lengths": np.full((b, CFG.max_bars), 4),
        "lower": low, "lower_lengths": np.full((b, CFG.max_bars), 3),
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_train_step_runs_and_learns():
    mesh = make_mesh()
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_state(CFG)
    opt = make_optimizer(lr=1.0)
    opt_state = opt.init(params)
    t_step, e_step = make_jitted_steps(opt, CFG, mesh=mesh)

    params = put_replicated(params, mesh)
    state = put_replicated(state, mesh)
    opt_state = put_replicated(opt_state, mesh)
    batch = put_batch(_batch(), mesh)

    losses = []
    for i in range(8):
        params, opt_state, state, out = t_step(
            params, opt_state, state, batch, jax.random.PRNGKey(i), 1.0)
        losses.append(float(out.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    # lr annealing mid-run must not recompile (weak check: it just works)
    opt_state = set_learning_rate(opt_state, 0.8)
    params, opt_state, state, out = t_step(
        params, opt_state, state, batch, jax.random.PRNGKey(99), 1.0)
    assert np.isfinite(float(out.loss))


def test_sharded_eval_step():
    mesh = make_mesh()
    params = put_replicated(init_params(jax.random.PRNGKey(1), CFG), mesh)
    state = put_replicated(init_state(CFG), mesh)
    opt = make_optimizer()
    _, e_step = make_jitted_steps(opt, CFG, mesh=mesh)
    batch = put_batch(_batch(), mesh)
    out, preds = e_step(params, state, batch)
    assert np.isfinite(float(out.loss))
    assert preds["upper_tokens"].shape == (8, CFG.max_bars,
                                           CFG.max_length[0])
    assert preds["time_sig"].shape == (8, CFG.max_bars)


def test_single_device_equals_mesh():
    """DP over 8 devices must produce the same update as 1 device (synced
    BN + summed/mean gradients are batch-order invariant here)."""
    params = init_params(jax.random.PRNGKey(2), CFG)
    state = init_state(CFG)
    opt = make_optimizer()
    opt_state = opt.init(params)
    batch = _batch()

    t_single, _ = make_jitted_steps(opt, CFG, mesh=None)
    p1, o1, s1, out1 = t_single(params, opt_state, state, batch,
                                jax.random.PRNGKey(0), 1.0)

    mesh = make_mesh()
    t_mesh, _ = make_jitted_steps(opt, CFG, mesh=mesh)
    params2 = put_replicated(init_params(jax.random.PRNGKey(2), CFG), mesh)
    state2 = put_replicated(init_state(CFG), mesh)
    opt_state2 = put_replicated(opt.init(params2), mesh)
    p2, o2, s2, out2 = t_mesh(params2, opt_state2, state2,
                              put_batch(batch, mesh), jax.random.PRNGKey(0),
                              1.0)
    np.testing.assert_allclose(float(out1.loss), float(out2.loss), rtol=1e-5)
    flat1 = jax.tree.leaves(p1)
    flat2 = jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
