"""scripts/frontend_ab.py end-to-end at toy size on CPU: synth corpus
with audio -> trained-checkpoint-style save dir -> A/B report."""

import json
import os
import subprocess
import sys

import numpy as np

from conftest import REPO_ROOT


def test_frontend_ab_cli(tmp_path):
    # Small-model config YAML shared by checkpoint creation and the CLI.
    cfg_yaml = tmp_path / "tiny.yaml"
    cfg_yaml.write_text(
        "seed: 0\nmidi_syn: score\nworkspace: {0}\n"
        "output_folder: {0}/out\nfeature_folder: {0}/features\n"
        "save_folder: {0}/out/save\ntrain_log: {0}/out/log.txt\n"
        "max_length: [64, 64]\nmax_bars: 2\nbins_per_octave: 60\n"
        "n_octaves: 8\nconv_feature_size: 16\nhidden_size: 16\n"
        "note_emb_size: 8\nstaff_emb_size: 8\nnumber_of_epochs: 1\n"
        "batch_size: 2\n".format(tmp_path))

    # 2-song corpus WITH audio (full 480 freq bins, small model on top).
    from piano_a2s_tpu.data.synth import write_corpus
    write_corpus(str(tmp_path / "features"), "test", 2, seed=3, n_bars=2,
                 frontend="direct")

    # A checkpoint in the save format (random small model).
    import jax
    from piano_a2s_tpu.config import load_experiment
    from piano_a2s_tpu.models import init_params, init_state
    from piano_a2s_tpu.train.checkpoint import Checkpointer
    from piano_a2s_tpu.train.step import make_optimizer

    exp = load_experiment(str(cfg_yaml))
    cfg = exp.model_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    for d in ("upper", "lower"):  # EOS-biased: terminating decode
        b = np.array(params["decoder"][d]["out"]["b"])
        b[cfg.eos] += 4.0
        params["decoder"][d]["out"]["b"] = b
    opt = make_optimizer()
    Checkpointer(exp.save_folder).save(
        {"params": params, "state": init_state(cfg),
         "opt_state": opt.init(jax.tree.map(np.asarray, params))},
        meta={"WER": 1.0}, host_state={"epoch": 1})

    out_json = str(tmp_path / "report.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "scripts/frontend_ab.py"),
         exp.save_folder, str(tmp_path / "features"),
         "--config", str(cfg_yaml), "--out", out_json,
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=600, cwd=REPO_ROOT)
    assert r.returncode == 0, r.stdout + r.stderr
    with open(out_json) as f:
        report = json.load(f)
    assert report["clips"] == 2
    for k in ("ts_agreement", "key_agreement", "upper_token_agreement",
              "lower_token_agreement"):
        assert 0.0 <= report[k] <= 1.0
    assert set(report["wer_vs_target"]) == {
        "oracle_spectrogram_upper", "oracle_spectrogram_lower",
        "ondevice_vqt_upper", "ondevice_vqt_lower"}
