"""FULL-PRODUCTION-SIZE parity vs the live PyTorch reference.

The small-dim tests (test_model_parity.py, test_gradient_parity.py) prove
the math module-by-module; this gate proves the *production configuration*
— the exact shape the reference self-tests (`/root/reference/models.py:
588-602`, (1,1,1200,480) forward) and the shape BASELINE.md's token-exact
clause refers to:

  spectrogram (B,1,1201,480), hidden 256, 5 bars x max_length (398,189).

Full size exercises paths toy dims cannot: the T = max(398,189) dual-staff
padding split, f32-vs-f64 accumulation over ~300 attention steps, and the
real decode lengths. Everything runs in float64 so any mismatch is a
structural bug, not noise.

Marked `slow` (~2-4 min of CPU): deselect with `-m "not slow"`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_modules
from piano_a2s_tpu.models import ModelConfig, forward
from piano_a2s_tpu.models.convert import from_torch_state_dict
from piano_a2s_tpu.train.losses import transcription_loss

pytestmark = pytest.mark.slow

CFG = ModelConfig()  # production defaults: 480 bins, hidden 256, 5 bars
B, T_SPEC = 2, 1201


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


def _rand_gt(seed=1, fill=0.6):
    """Dataset-like ground truth at production lengths (tokens, EOS, pads).

    `fill` caps how much of max_length each bar uses so the torch loop's
    early break and the pad tail are both exercised at full width.
    """
    rng = np.random.RandomState(seed)
    ts = rng.randint(0, CFG.num_time_sig, (B, CFG.max_bars))
    key = rng.randint(0, CFG.num_keys, (B, CFG.max_bars))

    def staff(maxlen):
        tok = np.full((B, CFG.max_bars, maxlen), CFG.pad, np.int64)
        lens = np.zeros((B, CFG.max_bars), np.int64)
        for b in range(B):
            for m in range(CFG.max_bars):
                n = rng.randint(1, int(maxlen * fill))
                tok[b, m, :n] = rng.randint(0, 140, n)
                tok[b, m, n] = CFG.eos
                lens[b, m] = n
        return tok, lens

    up, up_len = staff(CFG.max_length[0])
    low, low_len = staff(CFG.max_length[1])
    return ts, key, up, up_len, low, low_len


def test_full_size_inference_token_exact(pair, x64):
    """Token-for-token greedy decode + log-prob closeness at (1201, 480)."""
    import torch
    tm, params, state = pair
    spec = _rand_spec()
    with torch.no_grad():
        t_ts, t_key, t_up, t_low = [
            o.numpy() for o in tm(torch.from_numpy(spec), inference=True,
                                  ground_truth=None,
                                  teacher_forcing_ratio=0.0,
                                  device=torch.device("cpu"))]
    (j_ts, j_key, j_up, j_low, aux), _ = forward(
        params, state, jnp.asarray(spec), jax.random.PRNGKey(0), cfg=CFG,
        train=False)
    np.testing.assert_allclose(np.asarray(j_ts), t_ts, atol=1e-8)
    np.testing.assert_allclose(np.asarray(j_key), t_key, atol=1e-8)
    # Full tensors must match including the zero tail after the stop step.
    np.testing.assert_allclose(np.asarray(j_up), t_up, atol=1e-8)
    np.testing.assert_allclose(np.asarray(j_low), t_low, atol=1e-8)
    # TOKEN-EXACT greedy decode wherever the reference loop ran.
    for t_staff, name in ((t_up, "upper_tokens"), (t_low, "lower_tokens")):
        ran = np.abs(t_staff).sum(-1) > 0
        assert ran.any()
        assert (np.asarray(aux[name])[ran] == t_staff.argmax(-1)[ran]).all(), \
            f"greedy tokens diverge on {name}"
    # Per-bar time-sig / key argmax (the eval metrics' inputs) too.
    assert (np.asarray(j_ts).argmax(-1) == t_ts.argmax(-1)).all()
    assert (np.asarray(j_key).argmax(-1) == t_key.argmax(-1)).all()


def test_full_size_teacher_forced_loss_and_grads(pair, x64):
    """Loss value + every parameter gradient at production shapes."""
    import torch
    tm, params, state = pair
    tm.zero_grad()
    spec = _rand_spec(2)
    gt = _rand_gt()
    batch = {"time_sig": jnp.asarray(gt[0]), "key": jnp.asarray(gt[1]),
             "upper": jnp.asarray(gt[2]), "upper_lengths": jnp.asarray(gt[3]),
             "lower": jnp.asarray(gt[4]), "lower_lengths": jnp.asarray(gt[5])}

    tgt = [torch.from_numpy(np.asarray(g)) for g in gt]
    ts_t, key_t, up_t, low_t = tm(torch.from_numpy(spec), inference=False,
                                  ground_truth=tgt, teacher_forcing_ratio=1.0,
                                  device=torch.device("cpu"))
    nll = torch.nn.NLLLoss()
    nll_pad = torch.nn.NLLLoss(ignore_index=CFG.pad)
    loss_t = (nll(ts_t.permute(0, 2, 1), tgt[0])
              + nll(key_t.permute(0, 2, 1), tgt[1]))
    up_r = up_t.reshape(B * CFG.max_bars, -1, CFG.vocab_size)
    low_r = low_t.reshape(B * CFG.max_bars, -1, CFG.vocab_size)
    loss_t = loss_t + nll_pad(up_r.permute(0, 2, 1),
                              tgt[2].reshape(B * CFG.max_bars, -1))
    loss_t = loss_t + nll_pad(low_r.permute(0, 2, 1),
                              tgt[4].reshape(B * CFG.max_bars, -1))
    loss_t.backward()
    torch_grads = {}
    for name, p in tm.named_parameters():
        g = p.grad
        torch_grads[name] = np.zeros(p.shape) if g is None else g.numpy()
    for k, v in tm.state_dict().items():
        if k not in torch_grads:
            torch_grads[k] = np.zeros(v.shape)
    grads_ref, _ = from_torch_state_dict(torch_grads, CFG)

    def loss_fn(p):
        outs, _ = forward(p, state, jnp.asarray(spec), jax.random.PRNGKey(0),
                          cfg=CFG, train=False,
                          ground_truth=tuple(jnp.asarray(g) for g in gt),
                          tf_ratio=1.0)
        loss, comps = transcription_loss(outs, batch, CFG.pad)
        return loss, comps

    (loss_j, _), grads_j = jax.value_and_grad(loss_fn, has_aux=True)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=1e-9)

    flat_ref = jax.tree_util.tree_flatten_with_path(grads_ref)[0]
    flat_j = dict(jax.tree_util.tree_flatten_with_path(grads_j)[0])
    checked = 0
    for path, g_ref in flat_ref:
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(flat_j[path]),
                                   np.asarray(g_ref), atol=1e-6,
                                   err_msg=name)
        checked += 1
    assert checked > 50
