"""Learning smoke test: the train step memorizes a tiny batch.

Training correctness beyond gradient parity: loss must collapse and the
free-running decode must reproduce the memorized token sequences.
"""

import numpy as np

import jax
import jax.numpy as jnp

from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.train.step import (eval_step, make_jitted_steps,
                                      make_optimizer)

CFG = ModelConfig(freq_bins=16, conv_feature_size=32, hidden_size=32,
                  max_bars=2, max_length=(10, 8), note_emb_size=8,
                  staff_emb_size=8)


def _fixed_batch(b=2, t=24):
    rng = np.random.RandomState(0)
    up = np.full((b, CFG.max_bars, CFG.max_length[0]), CFG.pad, np.int32)
    low = np.full((b, CFG.max_bars, CFG.max_length[1]), CFG.pad, np.int32)
    up_len = np.zeros((b, CFG.max_bars), np.int32)
    low_len = np.zeros((b, CFG.max_bars), np.int32)
    for i in range(b):
        for m in range(CFG.max_bars):
            n = 4
            up[i, m, :n] = rng.randint(0, 100, n)
            up[i, m, n] = CFG.eos
            up_len[i, m] = n
            n = 3
            low[i, m, :n] = rng.randint(0, 100, n)
            low[i, m, n] = CFG.eos
            low_len[i, m] = n
    return {
        "spectrogram": rng.randn(b, 1, t, CFG.freq_bins).astype(np.float32),
        "time_sig": rng.randint(0, 7, (b, CFG.max_bars)),
        "key": rng.randint(0, 14, (b, CFG.max_bars)),
        "upper": up, "upper_lengths": up_len,
        "lower": low, "lower_lengths": low_len,
    }


def test_overfit_tiny_batch():
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_state(CFG)
    opt = make_optimizer(lr=1.0)
    opt_state = opt.init(params)
    t_step, _ = make_jitted_steps(opt, CFG, mesh=None)
    batch = _fixed_batch()

    first_loss = None
    loss = None
    for i in range(150):
        params, opt_state, state, out = t_step(
            params, opt_state, state, batch, jax.random.PRNGKey(i), 1.0)
        loss = float(out.loss)
        if first_loss is None:
            first_loss = loss
    assert loss < first_loss * 0.25, (first_loss, loss)

    # Free-running decode reproduces the memorized sequences.
    out, preds = jax.jit(lambda p, s, b: eval_step(p, s, b, CFG))(
        params, state, batch)
    up_tok = np.asarray(preds["upper_tokens"])
    up_gt = batch["upper"]
    matches = 0
    total = 0
    for i in range(up_gt.shape[0]):
        for m in range(CFG.max_bars):
            n = batch["upper_lengths"][i, m] + 1  # tokens + EOS
            total += n
            matches += (up_tok[i, m, :n] == up_gt[i, m, :n]).sum()
    assert matches / total > 0.8, f"decode memorization {matches}/{total}"
