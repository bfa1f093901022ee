"""Length-bucketed training: truncating the decode scan at the batch's max
target length is loss-exact (deterministic mode), and the harness picks
shorter compiled variants."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.models.score_transcription import forward
from piano_a2s_tpu.train.losses import transcription_loss_fused

CFG = ModelConfig(freq_bins=16, conv_feature_size=32, hidden_size=16,
                  max_bars=2, max_length=(32, 24), note_emb_size=8,
                  staff_emb_size=8)


def _batch(b=2, max_len_used=6):
    rng = np.random.RandomState(0)
    up = np.full((b, 2, CFG.max_length[0]), CFG.pad, np.int32)
    low = np.full((b, 2, CFG.max_length[1]), CFG.pad, np.int32)
    for i in range(b):
        for m in range(2):
            n = rng.randint(2, max_len_used)
            up[i, m, :n] = rng.randint(0, 140, n)
            up[i, m, n] = CFG.eos
            low[i, m, :n] = rng.randint(0, 140, n)
            low[i, m, n] = CFG.eos
    lens = (up != CFG.pad).sum(-1) - 1
    lens_l = (low != CFG.pad).sum(-1) - 1
    return {
        "spectrogram": rng.randn(b, 1, 20, 16).astype(np.float32),
        "time_sig": rng.randint(0, 7, (b, 2)),
        "key": rng.randint(0, 14, (b, 2)),
        "upper": up, "upper_lengths": lens.astype(np.int32),
        "lower": low, "lower_lengths": lens_l.astype(np.int32),
    }


def _loss(params, state, batch, cfg):
    gt = (batch["time_sig"], batch["key"], batch["upper"],
          batch["upper_lengths"], batch["lower"], batch["lower_lengths"])
    outs, _ = forward(params, state, jnp.asarray(batch["spectrogram"]),
                      jax.random.PRNGKey(3), cfg=cfg, train=False,
                      ground_truth=gt, tf_ratio=1.0, emit_full=False)
    return transcription_loss_fused(outs, batch, cfg.pad)


def test_truncated_scan_loss_exact():
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_state(CFG)
    batch = _batch()
    loss_full, comps_full = _loss(params, state, batch, CFG)

    cfg_b = dataclasses.replace(CFG, max_length=(8, 8))
    batch_b = dict(batch)
    batch_b["upper"] = batch["upper"][:, :, :8]
    batch_b["lower"] = batch["lower"][:, :, :8]
    loss_b, comps_b = _loss(params, state, batch_b, cfg_b)
    np.testing.assert_allclose(float(loss_b), float(loss_full), rtol=1e-6)
    for k in comps_full:
        np.testing.assert_allclose(float(comps_b[k]), float(comps_full[k]),
                                   rtol=1e-6, err_msg=k)


def test_harness_bucket_selection(tmp_path):
    import os
    from piano_a2s_tpu.config import ExperimentConfig
    from piano_a2s_tpu.train.harness import Trainer
    out = str(tmp_path / "out")
    exp = ExperimentConfig(
        seed=1, workspace=str(tmp_path), output_folder=out,
        feature_folder=str(tmp_path), save_folder=os.path.join(out, "save"),
        train_log=os.path.join(out, "log.txt"), max_length=(32, 24),
        max_bars=2, max_duration=1, frames_per_second=19,
        bins_per_octave=4, n_octaves=4, batch_size=2,
        conv_feature_size=32, hidden_size=16, note_emb_size=8,
        staff_emb_size=8)
    exp.extras["bucket_tokens"] = 8
    trainer = Trainer(exp)
    batch = _batch()
    sliced, step = trainer._bucketed(batch)
    assert sliced["upper"].shape[-1] == 8
    assert sliced["lower"].shape[-1] == 8
    assert step is not trainer.train_step
    assert (8, 8) in trainer._bucket_steps
    # long batch falls back to the full step
    batch2 = _batch(max_len_used=23)
    sliced2, step2 = trainer._bucketed(batch2)
    assert step2 is trainer.train_step or sliced2["upper"].shape[-1] <= 32
