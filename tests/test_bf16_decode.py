"""bfloat16 decode mode: runs, stays shape/length-correct, and agrees with
f32 on confident (EOS-biased) models."""

import numpy as np

import jax
import jax.numpy as jnp

from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.models.score_transcription import forward

CFG = ModelConfig(freq_bins=16, conv_feature_size=32, hidden_size=16,
                  max_bars=2, max_length=(8, 6), note_emb_size=8,
                  staff_emb_size=8)


def _forward(params, state, spec, dt):
    (ts, key, up, low, aux), _ = forward(
        params, state, spec, jax.random.PRNGKey(0), cfg=CFG, train=False,
        decode_dtype=dt)
    return (np.asarray(jnp.argmax(ts, -1)),
            np.asarray(aux["upper_tokens"]),
            np.asarray(aux["upper_lengths"]),
            np.asarray(up))


def test_bf16_decode_matches_f32_on_confident_model():
    params = init_params(jax.random.PRNGKey(0), CFG)
    for d in ("upper", "lower"):
        b = np.array(params["decoder"][d]["out"]["b"])
        b[CFG.eos] += 6.0  # confident EOS
        params["decoder"][d]["out"]["b"] = jnp.asarray(b)
    state = init_state(CFG)
    spec = jnp.asarray(
        np.random.RandomState(0).randn(2, 1, 20, 16).astype(np.float32))
    ts32, tok32, len32, logp32 = _forward(params, state, spec, None)
    ts16, tok16, len16, logp16 = _forward(params, state, spec, jnp.bfloat16)
    assert (ts32 == ts16).all()
    assert (tok32 == tok16).all()
    assert (len32 == len16).all()
    # log-probs close despite bf16 storage (computation paths keep f32
    # softmax/log-softmax)
    np.testing.assert_allclose(logp16, logp32, atol=0.05)
    assert logp16.dtype == np.float32


def test_bf16_decode_training_scan_runs():
    params = init_params(jax.random.PRNGKey(1), CFG)
    state = init_state(CFG)
    rng = np.random.RandomState(0)
    gt = (rng.randint(0, 7, (2, 2)), rng.randint(0, 14, (2, 2)),
          rng.randint(0, 140, (2, 2, 8)), np.full((2, 2), 4),
          rng.randint(0, 140, (2, 2, 6)), np.full((2, 2), 3))
    spec = jnp.asarray(rng.randn(2, 1, 20, 16).astype(np.float32))
    (ts, key, up, low, aux), _ = forward(
        params, state, spec, jax.random.PRNGKey(0), cfg=CFG, train=True,
        ground_truth=gt, tf_ratio=1.0, decode_dtype=jnp.bfloat16)
    assert np.isfinite(np.asarray(up)).all()
    assert up.dtype == jnp.float32
