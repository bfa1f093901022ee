"""Parity of the JAX model vs a *trained* PyTorch reference checkpoint.

The random-init parity suite (test_model_parity.py) pins the math, but a
trained model is a different regime: BatchNorm running statistics have
moved off their (0, 1) init, the logits are confident (sharp softmax,
early EOS exits actually fire), and the state_dict is the one a real user
of the reference would hand us.  No trained reference checkpoint ships in
this image, so this test *makes* one: it trains the live reference model
(reference: /root/reference/models.py, loss shape
/root/reference/pretrain.py:57-88 — CE on time/key logits + pad-ignoring
NLL on the staff log-probs) for a few hundred Adam steps on a fixed tiny
batch until it is confident, then converts the trained state_dict with
models.convert.from_torch_state_dict and asserts:

  - eval-mode greedy decode token parity (the transcribe.py contract),
  - per-step log-prob parity wherever the torch loop ran,
  - BN running-stat-dependent conv features match (the part random-init
    parity cannot see, since fresh stats are trivially mean 0 / var 1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_modules
from piano_a2s_tpu.models import ModelConfig, forward
from piano_a2s_tpu.models.convert import from_torch_state_dict

CFG = ModelConfig(freq_bins=24, conv_feature_size=48, hidden_size=32,
                  max_bars=2, max_length=(10, 7), note_emb_size=8,
                  staff_emb_size=8, time_sig_emb_size=5, key_emb_size=8)
B, T_SPEC = 4, 32
STEPS = 250


def _fixed_batch():
    """One deterministic batch with dataset-like target structure."""
    rng = np.random.RandomState(7)
    spec = rng.randn(B, 1, T_SPEC, CFG.freq_bins).astype(np.float64)
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
    return spec, (ts, key, up, up_len, low, low_len)


@pytest.fixture(scope="module")
def x64():
    with jax.enable_x64(True):
        yield


@pytest.fixture(scope="module")
def trained(x64):
    """Reference model trained to confidence on the fixed batch, plus the
    converted JAX params/state (f64 — depends on x64 so jnp.asarray does
    not silently downcast the trained weights to f32)."""
    import torch
    ref_models, _ = reference_modules()
    torch.manual_seed(3)
    tm = ref_models.ScoreTranscription(
        in_channels=1, freq_bins=CFG.freq_bins,
        conv_feature_size=CFG.conv_feature_size, hidden_size=CFG.hidden_size,
        max_bars=CFG.max_bars, num_time_sig=CFG.num_time_sig,
        num_keys=CFG.num_keys, max_length=CFG.max_length,
        note_emb_size=CFG.note_emb_size, staff_emb_size=CFG.staff_emb_size,
        time_sig_emb_size=CFG.time_sig_emb_size,
        key_emb_size=CFG.key_emb_size).double()

    spec, gt = _fixed_batch()
    spec_t = torch.from_numpy(spec)
    gt_t = [torch.from_numpy(np.asarray(g)) for g in gt]
    ce = torch.nn.CrossEntropyLoss()
    nll = torch.nn.NLLLoss(ignore_index=CFG.pad)
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)

    tm.train()
    losses = []
    for _ in range(STEPS):
        opt.zero_grad()
        ts_o, key_o, up_o, low_o = tm(
            spec_t, inference=False, ground_truth=gt_t,
            teacher_forcing_ratio=1.0, device=torch.device("cpu"))
        # Reference loss shape (pretrain.py:71-88): logits for ts/key, the
        # staff heads emit log-probs -> NLL with pad ignored.  Targets are
        # shifted like the decoder consumes them: output step t predicts
        # token t of the (tokens + EOS) stream.
        loss = ce(ts_o.permute(0, 2, 1), gt_t[0])
        loss = loss + ce(key_o.permute(0, 2, 1), gt_t[1])

        def staff_loss(out, tok, lens, maxlen):
            # Valid target at step t: tok[..., t] for t < len+1 (incl. EOS).
            tgt = tok.clone()
            steps = torch.arange(maxlen)
            invalid = steps[None, None, :] > lens[:, :, None]
            tgt[invalid] = CFG.pad
            return nll(out.reshape(-1, out.shape[-1]), tgt.reshape(-1))

        loss = loss + staff_loss(up_o, gt_t[2], gt_t[3], CFG.max_length[0])
        loss = loss + staff_loss(low_o, gt_t[4], gt_t[5], CFG.max_length[1])
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))

    tm.eval()
    params, state = from_torch_state_dict(tm.state_dict(), CFG)
    return tm, params, state, spec, gt, losses


def test_training_moved_the_model(trained, x64):
    """Sanity: the checkpoint is genuinely trained, not cosmetically so."""
    import torch
    tm, _, _, _, _, losses = trained
    assert losses[-1] < 0.25 * losses[0], (losses[0], losses[-1])
    # BN running stats moved off the (0, 1) init — the regime random-init
    # parity can't exercise.
    moved = False
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            moved |= float(m.running_mean.abs().max()) > 1e-3
            moved |= float((m.running_var - 1).abs().max()) > 1e-3
    assert moved


def test_trained_inference_parity(trained, x64):
    """Greedy decode of the trained checkpoint: tokens, buffers, lengths."""
    import torch
    tm, params, state, spec, _, _ = trained
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
    # A confident model memorized the batch: decode must terminate early
    # (EOS fires), not run out the buffer — i.e. the early-exit while_loop
    # is exercised with real trained logits.
    assert (np.asarray(aux["upper_lengths"]) < CFG.max_length[0]).any()


def test_trained_bn_stats_flow_through_convert(trained, x64):
    """Conv features under eval-mode BN with *trained* running stats."""
    import torch
    tm, params, state, spec, _, _ = trained
    with torch.no_grad():
        t_feat = tm.convstack(torch.from_numpy(spec)).numpy()
    from piano_a2s_tpu.models.score_transcription import conv_stack_apply
    j_feat, _ = conv_stack_apply(params["convstack"], state["convstack"],
                                 jnp.asarray(spec), False,
                                 jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(j_feat), t_feat, atol=1e-9)
