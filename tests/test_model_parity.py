"""Numerical parity of the JAX model vs the PyTorch reference.

Builds the live reference model (small dims), converts its state_dict with
models.convert, and asserts forward parity in float64:
  - inference mode: greedy tokens, lengths, and all log-probs
  - teacher-forced mode (tf=1.0 and tf=0.0 are deterministic: the per-step
    coin `random() < ratio` is constant)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_modules
from piano_a2s_tpu.models import ModelConfig, forward
from piano_a2s_tpu.models.convert import from_torch_state_dict

CFG = ModelConfig(freq_bins=32, conv_feature_size=64, hidden_size=48,
                  max_bars=2, max_length=(12, 9), note_emb_size=8,
                  staff_emb_size=8, time_sig_emb_size=5, key_emb_size=8)
B, T_SPEC = 2, 40


@pytest.fixture(scope="module")
def x64():
    with jax.enable_x64(True):
        yield


@pytest.fixture(scope="module")
def pair(x64):
    import torch
    ref_models, _ = reference_modules()
    torch.manual_seed(0)
    tm = ref_models.ScoreTranscription(
        in_channels=1, freq_bins=CFG.freq_bins,
        conv_feature_size=CFG.conv_feature_size, hidden_size=CFG.hidden_size,
        max_bars=CFG.max_bars, num_time_sig=CFG.num_time_sig,
        num_keys=CFG.num_keys, max_length=CFG.max_length,
        note_emb_size=CFG.note_emb_size, staff_emb_size=CFG.staff_emb_size,
        time_sig_emb_size=CFG.time_sig_emb_size,
        key_emb_size=CFG.key_emb_size).double().eval()
    params, state = from_torch_state_dict(tm.state_dict(), CFG)
    return tm, params, state


def _rand_spec(seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(B, 1, T_SPEC, CFG.freq_bins).astype(np.float64)


def _rand_gt(seed=1):
    """Random ground truth with dataset-like structure (tokens, EOS, pads)."""
    rng = np.random.RandomState(seed)
    ts = rng.randint(0, CFG.num_time_sig, (B, CFG.max_bars))
    key = rng.randint(0, CFG.num_keys, (B, CFG.max_bars))

    def staff(maxlen):
        tok = np.full((B, CFG.max_bars, maxlen), CFG.pad, np.int64)
        lens = np.zeros((B, CFG.max_bars), np.int64)
        for b in range(B):
            for m in range(CFG.max_bars):
                n = rng.randint(1, maxlen - 1)
                tok[b, m, :n] = rng.randint(0, 140, n)
                tok[b, m, n] = CFG.eos
                lens[b, m] = n  # dataset lengths exclude the EOS
        return tok, lens

    up, up_len = staff(CFG.max_length[0])
    low, low_len = staff(CFG.max_length[1])
    return ts, key, up, up_len, low, low_len


def _torch_forward(tm, spec, gt=None, tf=0.0):
    import torch
    with torch.no_grad():
        if gt is None:
            outs = tm(torch.from_numpy(spec), inference=True,
                      ground_truth=None, teacher_forcing_ratio=0.0,
                      device=torch.device("cpu"))
        else:
            tgt = [torch.from_numpy(np.asarray(g)) for g in gt]
            outs = tm(torch.from_numpy(spec), inference=False,
                      ground_truth=tgt, teacher_forcing_ratio=tf,
                      device=torch.device("cpu"))
    return [o.numpy() for o in outs]


def _jax_forward(params, state, spec, gt=None, tf=0.0):
    (ts, key, up, low, aux), _ = forward(
        params, state, jnp.asarray(spec), jax.random.PRNGKey(0), cfg=CFG,
        train=False, ground_truth=gt, tf_ratio=tf)
    return ([np.asarray(ts), np.asarray(key), np.asarray(up),
             np.asarray(low)], jax.tree.map(np.asarray, aux))


def _compare_staff(t_out, j_out, name):
    """Compare per-step log-probs wherever the torch loop actually ran
    (rows after its early break are all-zero placeholders)."""
    ran = np.abs(t_out).sum(-1) > 0  # (B, bars, T)
    assert ran.any()
    np.testing.assert_allclose(j_out[ran], t_out[ran], atol=1e-8,
                               err_msg=name)


def test_inference_parity(pair, x64):
    tm, params, state = pair
    spec = _rand_spec()
    t_ts, t_key, t_up, t_low = _torch_forward(tm, spec)
    (j_ts, j_key, j_up, j_low), aux = _jax_forward(params, state, spec)
    np.testing.assert_allclose(j_ts, t_ts, atol=1e-8)
    np.testing.assert_allclose(j_key, t_key, atol=1e-8)
    # Early-exit decode leaves zeros after the stop step exactly like the
    # reference's preallocated buffers -> FULL tensors must match.
    np.testing.assert_allclose(j_up, t_up, atol=1e-8)
    np.testing.assert_allclose(j_low, t_low, atol=1e-8)
    # Greedy tokens where torch ran match our argmax.
    ran = np.abs(t_up).sum(-1) > 0
    assert (np.asarray(aux["upper_tokens"])[ran]
            == t_up.argmax(-1)[ran]).all()


@pytest.mark.parametrize("tf", [0.0, 1.0])
def test_teacher_forced_parity(pair, x64, tf):
    tm, params, state = pair
    spec = _rand_spec(2)
    gt = _rand_gt()
    t_outs = _torch_forward(tm, spec, gt=gt, tf=tf)
    (j_outs, aux) = _jax_forward(params, state, spec, gt=gt, tf=tf)
    np.testing.assert_allclose(j_outs[0], t_outs[0], atol=1e-8)
    np.testing.assert_allclose(j_outs[1], t_outs[1], atol=1e-8)
    _compare_staff(t_outs[2], j_outs[2], "upper")
    _compare_staff(t_outs[3], j_outs[3], "lower")
    # With gt given, lengths derive from gt EOS positions (+1) per reference.
    up_len_expect = np.asarray(gt[3]) + 1
    assert (np.asarray(aux["upper_lengths"]) == up_len_expect).all()


def test_eos_bias_stops_decode(pair, x64):
    """Bias both out layers hard toward EOS: every item emits EOS at step 0,
    so reference stops after one step; our lengths must be 1."""
    tm, params, state = pair
    import copy
    p2 = copy.deepcopy(jax.tree.map(np.asarray, params))
    for d in ("upper", "lower"):
        p2["decoder"][d]["out"]["b"][CFG.eos] += 100.0
    p2 = jax.tree.map(jnp.asarray, p2)
    spec = _rand_spec(3)
    _, aux = _jax_forward(p2, state, spec)
    assert (np.asarray(aux["upper_lengths"]) == 1).all()
    assert (np.asarray(aux["lower_lengths"]) == 1).all()

    import torch
    tm2 = copy.deepcopy(tm)
    with torch.no_grad():
        tm2.decoder.upper_decoder.out.bias[CFG.eos] += 100.0
        tm2.decoder.lower_decoder.out.bias[CFG.eos] += 100.0
    t_up = _torch_forward(tm2, spec)[2]
    j_up = _jax_forward(p2, state, spec)[0][2]
    ran = np.abs(t_up).sum(-1) > 0
    assert ran.sum() == B * CFG.max_bars  # exactly one step ran per bar
    np.testing.assert_allclose(j_up[ran], t_up[ran], atol=1e-8)


def test_convstack_encoder_parity(pair, x64):
    """Module-level diagnosis: conv features and encoder outputs."""
    import torch
    tm, params, state = pair
    spec = _rand_spec(4)
    with torch.no_grad():
        t_feat = tm.convstack(torch.from_numpy(spec))
        t_enc, t_hidden = tm.encoder(t_feat)
    from piano_a2s_tpu.models.score_transcription import (
        conv_stack_apply, encoder_apply)
    j_feat, _ = conv_stack_apply(params["convstack"], state["convstack"],
                                 jnp.asarray(spec), False,
                                 jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(j_feat), t_feat.numpy(), atol=1e-9)
    j_enc, j_hidden = encoder_apply(params["encoder"], j_feat)
    np.testing.assert_allclose(np.asarray(j_enc), t_enc.numpy(), atol=1e-9)
    np.testing.assert_allclose(np.asarray(j_hidden),
                               t_hidden.numpy()[0], atol=1e-9)
