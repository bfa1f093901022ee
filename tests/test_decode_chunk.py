"""VMEM-resident chunked decode (models.forward decode_chunk): the
inference decoder runs over batch chunks via lax.map so each chunk's
attention operands stay chip-resident across the sequential decode steps
(measured 602 -> 310 ms full-length f32 at B=64 on the v5e,
docs/DESIGN.md §2). Per-clip math is exact — these tests pin chunked ==
unchunked tokens/lengths/log-probs on confident models, the chunk-size
resolution rules, and the serving/eval wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.models.score_transcription import (forward,
                                                      pick_decode_chunk)

CFG = ModelConfig(freq_bins=16, conv_feature_size=32, hidden_size=16,
                  max_bars=2, max_length=(8, 6), note_emb_size=8,
                  staff_emb_size=8)


def _sharp_params(seed=0, bias=6.0):
    params = init_params(jax.random.PRNGKey(seed), CFG)
    for d in ("upper", "lower"):
        b = np.array(params["decoder"][d]["out"]["b"])
        b[CFG.eos] += bias
        params["decoder"][d]["out"]["b"] = jnp.asarray(b)
    return params


def _forward(params, state, spec, chunk, dt=None):
    (ts, key, up, low, aux), _ = forward(
        params, state, spec, jax.random.PRNGKey(0), cfg=CFG, train=False,
        decode_dtype=dt, decode_chunk=chunk)
    return (np.asarray(jnp.argmax(ts, -1)), np.asarray(jnp.argmax(key, -1)),
            np.asarray(aux["upper_tokens"]), np.asarray(aux["upper_lengths"]),
            np.asarray(aux["lower_tokens"]), np.asarray(aux["lower_lengths"]),
            np.asarray(up))


def test_pick_decode_chunk_rules():
    assert pick_decode_chunk(None, 64) is None
    assert pick_decode_chunk(0, 64) is None
    assert pick_decode_chunk("auto", 64) == 16
    assert pick_decode_chunk("auto", 64, jnp.bfloat16) == 32
    assert pick_decode_chunk("auto", 8) is None          # batch <= chunk
    assert pick_decode_chunk(16, 16) is None
    assert pick_decode_chunk(16, 24) == 12               # largest divisor
    assert pick_decode_chunk(16, 17) is None             # prime -> chunk 1
    assert pick_decode_chunk(4, 12) == 4


def test_chunked_matches_unchunked_confident_model():
    params = _sharp_params()
    state = init_state(CFG)
    spec = jnp.asarray(
        np.random.RandomState(0).randn(6, 1, 20, 16).astype(np.float32))
    ref = _forward(params, state, spec, None)
    for chunk in (2, 3, "auto"):
        got = _forward(params, state, spec, chunk)
        for r, g in zip(ref[:-1], got[:-1]):
            assert (r == g).all(), chunk
        np.testing.assert_allclose(got[-1], ref[-1], atol=1e-5)


def test_chunked_bf16_decode():
    params = _sharp_params(seed=1)
    state = init_state(CFG)
    spec = jnp.asarray(
        np.random.RandomState(1).randn(4, 1, 20, 16).astype(np.float32))
    ref = _forward(params, state, spec, None, jnp.bfloat16)
    got = _forward(params, state, spec, 2, jnp.bfloat16)
    for r, g in zip(ref[:-1], got[:-1]):
        assert (r == g).all()


def test_chunk_ignored_in_training():
    """Training must stay monolithic (the backward needs the full batch);
    decode_chunk is silently inert with ground truth present."""
    params = init_params(jax.random.PRNGKey(1), CFG)
    state = init_state(CFG)
    rng = np.random.RandomState(0)
    gt = (rng.randint(0, 7, (4, 2)), rng.randint(0, 14, (4, 2)),
          rng.randint(0, 140, (4, 2, 8)), np.full((4, 2), 4),
          rng.randint(0, 140, (4, 2, 6)), np.full((4, 2), 3))
    spec = jnp.asarray(rng.randn(4, 1, 20, 16).astype(np.float32))
    out_c, _ = forward(params, state, spec, jax.random.PRNGKey(0), cfg=CFG,
                       train=True, ground_truth=gt, tf_ratio=1.0,
                       decode_chunk=2)
    out_u, _ = forward(params, state, spec, jax.random.PRNGKey(0), cfg=CFG,
                       train=True, ground_truth=gt, tf_ratio=1.0)
    np.testing.assert_array_equal(np.asarray(out_c[2]),
                                  np.asarray(out_u[2]))


def test_transcriber_chunked_serving():
    """The serving path uses the chunked decode by default and returns
    the same structures as an unchunked Transcriber."""
    from piano_a2s_tpu.infer import Transcriber
    from piano_a2s_tpu.ops.vqt import VQTConfig

    vcfg = VQTConfig(bins_per_octave=4, n_octaves=4)
    cfg = ModelConfig(freq_bins=16, conv_feature_size=24, hidden_size=16,
                      max_bars=2, max_length=(8, 6), note_emb_size=8,
                      staff_emb_size=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    for d in ("upper", "lower"):
        b = np.array(params["decoder"][d]["out"]["b"])
        b[cfg.eos] += 6.0
        params["decoder"][d]["out"]["b"] = jnp.asarray(b)
    state = init_state(cfg)
    kw = dict(cfg=cfg, vqt_cfg=vcfg, max_frame_num=20)
    tr_c = Transcriber(params, state, decode_chunk=2, **kw)
    tr_u = Transcriber(params, state, decode_chunk=None, **kw)
    rng = np.random.RandomState(0)
    clips = [(0.2 * rng.randn(tr_c.max_samples)).astype(np.float32)
             for _ in range(4)]
    out_c = list(tr_c.transcribe_stream(clips, batch_size=4))
    out_u = list(tr_u.transcribe_stream(clips, batch_size=4))
    assert len(out_c) == 4
    for a, b in zip(out_c, out_u):
        assert a == b


def test_eval_step_chunk_opt_in():
    """eval_step accepts decode_chunk explicitly (the harness default
    stays UNCHUNKED for reference-parity batch-coupled early-exit; see
    make_jitted_steps docstring)."""
    from functools import partial

    from piano_a2s_tpu.train.step import eval_step, make_optimizer

    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_state(CFG)
    make_optimizer(lr=1.0)
    e_step = jax.jit(partial(eval_step, cfg=CFG, decode_chunk=9))
    rng = np.random.RandomState(0)
    b = 18  # not divisible by 16 -> falls back to the largest divisor (9)
    batch = {
        "spectrogram": rng.rand(b, 1, 20, 16).astype(np.float32),
        "time_sig": rng.randint(0, 7, (b, CFG.max_bars)),
        "key": rng.randint(0, 14, (b, CFG.max_bars)),
        "upper": np.full((b, CFG.max_bars, CFG.max_length[0]), CFG.pad),
        "upper_lengths": np.full((b, CFG.max_bars), 2),
        "lower": np.full((b, CFG.max_bars, CFG.max_length[1]), CFG.pad),
        "lower_lengths": np.full((b, CFG.max_bars), 2),
    }
    out, preds = e_step(params, state, batch)
    assert np.isfinite(float(out.loss))
    assert preds["upper_tokens"].shape[0] == b

    # the harness-facing default stays unchunked (reference parity):
    # make_jitted_steps' eval == an explicit decode_chunk=None eval,
    # bitwise, even on this weak (batch-coupled-exit) model.
    from piano_a2s_tpu.train.step import make_jitted_steps
    _, e_default = make_jitted_steps(make_optimizer(lr=1.0), CFG)
    out_d, preds_d = e_default(params, state, batch)
    e_none = jax.jit(partial(eval_step, cfg=CFG, decode_chunk=None))
    out_n, preds_n = e_none(params, state, batch)
    assert float(out_d.loss) == float(out_n.loss)
    np.testing.assert_array_equal(np.asarray(preds_d["upper_tokens"]),
                                  np.asarray(preds_n["upper_tokens"]))

    # the opt-in (extras eval_decode_chunk) threads through and runs
    _, e_opt = make_jitted_steps(make_optimizer(lr=1.0), CFG,
                                 eval_decode_chunk=9)
    out_o, preds_o = e_opt(params, state, batch)
    assert np.isfinite(float(out_o.loss))
    assert preds_o["upper_tokens"].shape[0] == b
