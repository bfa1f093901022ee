"""Migration CLI: scripts/convert_reference_checkpoint.py imports a
SpeechBrain-format reference save folder into this framework's checkpoint
format, which Trainer.try_resume() then loads."""

import os
import subprocess
import sys

import numpy as np

from conftest import REPO_ROOT, reference_modules

SCRIPT = os.path.join(REPO_ROOT, "scripts",
                      "convert_reference_checkpoint.py")

TINY_YAML = """\
seed: 7
output_folder: {out}
save_folder: {save}
train_log: {out}/train_log.txt
feature_folder: {out}/features
max_length: [6, 5]
max_bars: 2
max_duration: 1
frames_per_second: 17
bins_per_octave: 4
n_octaves: 4
conv_feature_size: 16
hidden_size: 16
note_emb_size: 8
staff_emb_size: 8
"""


def _make_sb_save(tmp_path):
    """Reference-style save dir: save/CKPT+*/model.ckpt + CKPT.yaml."""
    import torch
    ref_models, _ = reference_modules()
    torch.manual_seed(3)
    tm = ref_models.ScoreTranscription(
        in_channels=1, freq_bins=16, conv_feature_size=16, hidden_size=16,
        max_bars=2, num_time_sig=7, num_keys=14, max_length=(6, 5),
        note_emb_size=8, staff_emb_size=8, time_sig_emb_size=5,
        key_emb_size=8).eval()
    for wer, tag in ((43.5, "CKPT+better"), (77.0, "CKPT+worse")):
        d = tmp_path / "ref_save" / tag
        os.makedirs(d)
        torch.save(tm.state_dict(), str(d / "model.ckpt"))
        with open(d / "CKPT.yaml", "w") as f:
            f.write(f"WER: {wer}\nunixtime: 1700000000.0\n")
    return str(tmp_path / "ref_save")


def test_convert_cli_roundtrip(tmp_path):
    src = _make_sb_save(tmp_path)
    out = str(tmp_path / "out")
    save = os.path.join(out, "save")
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        f.write(TINY_YAML.format(out=out, save=save))

    r = subprocess.run(
        [sys.executable, SCRIPT, src, "--config", cfg_path],
        capture_output=True, text=True, timeout=300, cwd=REPO_ROOT)
    assert r.returncode == 0, r.stdout + r.stderr
    # best-WER checkpoint chosen
    assert "CKPT+better" in r.stdout

    ckpts = [d for d in os.listdir(save) if d.startswith("CKPT")]
    assert len(ckpts) == 1

    from piano_a2s_tpu.config import load_experiment
    from piano_a2s_tpu.train.harness import Trainer
    import jax

    exp = load_experiment(cfg_path)
    trainer = Trainer(exp)
    assert trainer.try_resume()
    # imported meta carries the reference's WER so keep-best works
    meta = trainer.checkpointer._read_meta(trainer.checkpointer.best_path())
    assert meta["WER"] == 43.5

    # the restored model runs free inference
    batch = {
        "spectrogram": np.random.RandomState(0)
        .randn(2, 1, exp.max_frame_num, 16).astype(np.float32),
        "time_sig": np.zeros((2, 2), np.int32),
        "key": np.zeros((2, 2), np.int32),
        "upper": np.full((2, 2, 6), 147, np.int32),
        "upper_lengths": np.ones((2, 2), np.int32),
        "lower": np.full((2, 2, 5), 147, np.int32),
        "lower_lengths": np.ones((2, 2), np.int32),
        "sample_weight": np.ones(2, np.float32),
    }
    out_eval, preds = trainer.eval_step(trainer.params, trainer.state,
                                        batch)
    assert np.isfinite(float(jax.device_get(out_eval.loss)))
    assert preds["upper_tokens"].shape == (2, 2, 6)


def test_export_cli_full_cycle(tmp_path):
    """torch reference save -> import CLI -> export CLI -> state_dict that
    matches the original tensors exactly (the bidirectional checkpoint
    migration story)."""
    import torch

    src = _make_sb_save(tmp_path)
    out = str(tmp_path / "out")
    save = os.path.join(out, "save")
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        f.write(TINY_YAML.format(out=out, save=save))

    r = subprocess.run(
        [sys.executable, SCRIPT, src, "--config", cfg_path],
        capture_output=True, text=True, timeout=300, cwd=REPO_ROOT)
    assert r.returncode == 0, r.stdout + r.stderr

    export_script = os.path.join(REPO_ROOT, "scripts",
                                 "export_reference_checkpoint.py")
    exported = str(tmp_path / "exported")
    r = subprocess.run(
        [sys.executable, export_script, save, "--config", cfg_path,
         "--out", exported],
        capture_output=True, text=True, timeout=300, cwd=REPO_ROOT)
    assert r.returncode == 0, r.stdout + r.stderr

    sd_out = torch.load(os.path.join(exported, "model.ckpt"),
                        map_location="cpu", weights_only=True)
    sd_in = torch.load(os.path.join(src, "CKPT+better", "model.ckpt"),
                       map_location="cpu", weights_only=True)
    assert set(sd_out) == set(sd_in)
    for k in sd_in:
        if k.endswith("num_batches_tracked"):
            continue  # exported as 0 by design (no information content)
        np.testing.assert_allclose(
            sd_out[k].to(torch.float64).numpy(),
            sd_in[k].to(torch.float64).numpy(),
            atol=1e-7, err_msg=k)
    # WER meta rides along
    with open(os.path.join(exported, "CKPT.yaml")) as f:
        assert "WER: 43.5" in f.read()


def test_export_cli_modulelist_layout(tmp_path):
    """--modulelist writes the reference checkpointer's '0.'-prefixed
    ModuleList key layout, which from_torch_state_dict strips back."""
    import torch

    src = _make_sb_save(tmp_path)
    out = str(tmp_path / "out")
    save = os.path.join(out, "save")
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        f.write(TINY_YAML.format(out=out, save=save))
    r = subprocess.run(
        [sys.executable, SCRIPT, src, "--config", cfg_path],
        capture_output=True, text=True, timeout=300, cwd=REPO_ROOT)
    assert r.returncode == 0, r.stdout + r.stderr

    export_script = os.path.join(REPO_ROOT, "scripts",
                                 "export_reference_checkpoint.py")
    exported = str(tmp_path / "exported_ml")
    r = subprocess.run(
        [sys.executable, export_script, save, "--config", cfg_path,
         "--out", exported, "--modulelist"],
        capture_output=True, text=True, timeout=300, cwd=REPO_ROOT)
    assert r.returncode == 0, r.stdout + r.stderr
    sd = torch.load(os.path.join(exported, "model.ckpt"),
                    map_location="cpu", weights_only=True)
    assert all(k.startswith("0.") for k in sd)
    # The import path accepts this layout directly (strips the prefix).
    from piano_a2s_tpu.models import ModelConfig
    from piano_a2s_tpu.models.convert import from_torch_state_dict
    cfg = ModelConfig(freq_bins=16, conv_feature_size=16, hidden_size=16,
                      max_bars=2, max_length=(6, 5), note_emb_size=8,
                      staff_emb_size=8)
    params, state = from_torch_state_dict(sd, cfg)
    assert "convstack" in params and "bn1" in state["convstack"]
