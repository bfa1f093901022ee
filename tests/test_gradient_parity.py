"""Backward-pass parity: loss and ALL parameter gradients vs the torch
reference, in float64, teacher-forced (tf=1.0 is deterministic).

This is the strongest training-correctness guarantee available: if losses
and gradients match to 1e-8, our jitted train step optimizes exactly the
reference's objective.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_modules
from piano_a2s_tpu.models import ModelConfig, forward
from piano_a2s_tpu.models.convert import from_torch_state_dict
from piano_a2s_tpu.train.losses import transcription_loss

CFG = ModelConfig(freq_bins=24, conv_feature_size=32, hidden_size=24,
                  max_bars=2, max_length=(10, 7), note_emb_size=8,
                  staff_emb_size=8, time_sig_emb_size=5, key_emb_size=8)
B, T_SPEC = 2, 30


@pytest.fixture(scope="module")
def x64():
    with jax.enable_x64(True):
        yield


def _rand_gt(seed=3):
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
                lens[b, m] = n
        return tok, lens

    up, up_len = staff(CFG.max_length[0])
    low, low_len = staff(CFG.max_length[1])
    return ts, key, up, up_len, low, low_len


def test_loss_and_gradient_parity(x64):
    import torch
    ref_models, _ = reference_modules()
    torch.manual_seed(1)
    tm = ref_models.ScoreTranscription(
        in_channels=1, freq_bins=CFG.freq_bins,
        conv_feature_size=CFG.conv_feature_size, hidden_size=CFG.hidden_size,
        max_bars=CFG.max_bars, num_time_sig=CFG.num_time_sig,
        num_keys=CFG.num_keys, max_length=CFG.max_length,
        note_emb_size=CFG.note_emb_size, staff_emb_size=CFG.staff_emb_size,
        time_sig_emb_size=CFG.time_sig_emb_size,
        key_emb_size=CFG.key_emb_size).double().eval()
    params, state = from_torch_state_dict(tm.state_dict(), CFG)

    spec = np.random.RandomState(0).randn(B, 1, T_SPEC,
                                          CFG.freq_bins)
    gt = _rand_gt()
    batch = {"time_sig": jnp.asarray(gt[0]), "key": jnp.asarray(gt[1]),
             "upper": jnp.asarray(gt[2]), "upper_lengths": jnp.asarray(gt[3]),
             "lower": jnp.asarray(gt[4]), "lower_lengths": jnp.asarray(gt[5])}

    # --- torch loss + grads (reference compute_objectives,
    #     pretrain.py:69-88) ---
    tgt = [torch.from_numpy(np.asarray(g)) for g in gt]
    ts_t, key_t, up_t, low_t = tm(torch.from_numpy(spec), inference=False,
                                  ground_truth=tgt,
                                  teacher_forcing_ratio=1.0,
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
        torch_grads[name] = (np.zeros(p.shape)
                             if g is None else g.numpy())
    # converter also expects BN running stats; fill with zeros
    for k, v in tm.state_dict().items():
        if k not in torch_grads:
            torch_grads[k] = np.zeros(v.shape)
    grads_ref, _ = from_torch_state_dict(torch_grads, CFG)

    # --- jax loss + grads ---
    def loss_fn(p):
        outs, _ = forward(p, state, jnp.asarray(spec), jax.random.PRNGKey(0),
                          cfg=CFG, train=False,
                          ground_truth=tuple(jnp.asarray(g) for g in gt),
                          tf_ratio=1.0)
        loss, comps = transcription_loss(outs, batch, CFG.pad)
        return loss, comps

    (loss_j, comps), grads_j = jax.value_and_grad(loss_fn,
                                                  has_aux=True)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=1e-10)

    flat_ref = jax.tree_util.tree_flatten_with_path(grads_ref)[0]
    flat_j = dict(jax.tree_util.tree_flatten_with_path(grads_j)[0])
    checked = 0
    for path, g_ref in flat_ref:
        g_j = flat_j[path]
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(g_j), np.asarray(g_ref),
                                   atol=1e-7, err_msg=name)
        checked += 1
    assert checked > 50  # every parameter tensor compared
