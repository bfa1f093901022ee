"""Checkpoint conversion: torch .ckpt file -> params, including
SpeechBrain's ModuleList prefix convention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_modules
from piano_a2s_tpu.models import ModelConfig
from piano_a2s_tpu.models.convert import (from_torch_state_dict,
                                          load_torch_checkpoint)
from piano_a2s_tpu.models.score_transcription import forward

CFG = ModelConfig(freq_bins=16, conv_feature_size=16, hidden_size=16,
                  max_bars=2, max_length=(6, 5), note_emb_size=8,
                  staff_emb_size=8, time_sig_emb_size=5, key_emb_size=8)


def _ref_model():
    import torch
    ref_models, _ = reference_modules()
    torch.manual_seed(3)
    return ref_models.ScoreTranscription(
        in_channels=1, freq_bins=CFG.freq_bins,
        conv_feature_size=CFG.conv_feature_size,
        hidden_size=CFG.hidden_size, max_bars=CFG.max_bars,
        num_time_sig=CFG.num_time_sig, num_keys=CFG.num_keys,
        max_length=CFG.max_length, note_emb_size=CFG.note_emb_size,
        staff_emb_size=CFG.staff_emb_size,
        time_sig_emb_size=CFG.time_sig_emb_size,
        key_emb_size=CFG.key_emb_size).eval()


def test_load_torch_checkpoint_file(tmp_path):
    import torch
    tm = _ref_model()
    path = str(tmp_path / "model.ckpt")
    torch.save(tm.state_dict(), path)
    params, state = load_torch_checkpoint(path, CFG)
    spec = np.random.RandomState(0).randn(1, 1, 18, 16).astype(np.float32)
    (ts, *_), _ = forward(params, state, jnp.asarray(spec),
                          jax.random.PRNGKey(0), cfg=CFG, train=False)
    assert np.isfinite(np.asarray(ts)).all()


def test_speechbrain_modulelist_prefix(tmp_path):
    """SpeechBrain wraps the model in ModuleList -> keys prefixed '0.'."""
    tm = _ref_model()
    sd = {f"0.{k}": v for k, v in tm.state_dict().items()}
    params, state = from_torch_state_dict(sd, CFG)
    direct, _ = from_torch_state_dict(tm.state_dict(), CFG)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(direct)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))


def test_missing_key_raises():
    tm = _ref_model()
    sd = dict(tm.state_dict())
    sd.pop("encoder.fc.weight")
    with pytest.raises(KeyError):
        from_torch_state_dict(sd, CFG)
