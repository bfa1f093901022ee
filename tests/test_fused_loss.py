"""Fused (gt-picked) training loss == full-distribution loss, values and
gradients."""

import numpy as np

import jax
import jax.numpy as jnp

from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.models.score_transcription import forward
from piano_a2s_tpu.train.losses import (transcription_loss,
                                        transcription_loss_fused)

CFG = ModelConfig(freq_bins=16, conv_feature_size=32, hidden_size=16,
                  max_bars=2, max_length=(8, 6), note_emb_size=8,
                  staff_emb_size=8)


def _batch(b=3):
    rng = np.random.RandomState(0)
    up = np.full((b, 2, 8), CFG.pad, np.int32)
    low = np.full((b, 2, 6), CFG.pad, np.int32)
    up[:, :, :4] = rng.randint(0, 140, (b, 2, 4))
    up[:, :, 4] = CFG.eos
    low[:, :, :3] = rng.randint(0, 140, (b, 2, 3))
    low[:, :, 3] = CFG.eos
    return {
        "spectrogram": rng.randn(b, 1, 20, 16).astype(np.float32),
        "time_sig": rng.randint(0, 7, (b, 2)),
        "key": rng.randint(0, 14, (b, 2)),
        "upper": up, "upper_lengths": np.full((b, 2), 4),
        "lower": low, "lower_lengths": np.full((b, 2), 3),
    }


def test_fused_equals_full_loss_and_grads():
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_state(CFG)
    batch = _batch()
    gt = (batch["time_sig"], batch["key"], batch["upper"],
          batch["upper_lengths"], batch["lower"], batch["lower_lengths"])

    def loss_full(p):
        outs, _ = forward(p, state, jnp.asarray(batch["spectrogram"]),
                          jax.random.PRNGKey(7), cfg=CFG, train=False,
                          ground_truth=gt, tf_ratio=1.0, emit_full=True)
        return transcription_loss(outs, batch, CFG.pad)[0]

    def loss_fused(p):
        outs, _ = forward(p, state, jnp.asarray(batch["spectrogram"]),
                          jax.random.PRNGKey(7), cfg=CFG, train=False,
                          ground_truth=gt, tf_ratio=1.0, emit_full=False)
        return transcription_loss_fused(outs, batch, CFG.pad)[0]

    lf, gf = jax.value_and_grad(loss_full)(params)
    lp, gp = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-6)
    for (pa, a), (pb, bb) in zip(
            jax.tree_util.tree_flatten_with_path(gf)[0],
            jax.tree_util.tree_flatten_with_path(gp)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))
