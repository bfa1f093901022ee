"""CLI entry-point smoke tests: the actual `python pretrain.py <yaml>
key=value ...` / `python finetune.py <yaml>` surface (argument parsing,
config interpolation + overrides, dataset wiring, warm-start import) on a
tiny fixture dataset — the reference's CLI contract end-to-end
(reference: README.md:116-132)."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np

from conftest import REPO_ROOT
from test_external_tool_contracts import fake_bin  # noqa: F401
from test_harness_e2e import _make_fixture

N_FRAMES = 24
N_BINS = 16

TINY_YAML = """\
seed: 7
midi_syn: score
workspace: {root}
output_folder: {root}/out_pre
feature_folder: {root}/features
save_folder: {root}/out_pre/save
train_log: {root}/out_pre/train_log.txt
max_length: [8, 6]
max_bars: 2
max_duration: 1
frames_per_second: 23
bins_per_octave: 4
n_octaves: 4
number_of_epochs: 2
batch_size: 2
conv_feature_size: 16
hidden_size: 16
note_emb_size: 8
staff_emb_size: 8
train_versions: 1
"""

FINETUNE_YAML = """\
seed: 7
midi_syn: score
workspace: {root}
output_folder: {root}/out_fin
feature_folder: {root}/asap_features
save_folder: {root}/out_fin/save
train_log: {root}/out_fin/train_log.txt
pretrained_output_folder: {root}/out_pre
max_length: [8, 6]
max_bars: 2
max_duration: 1
frames_per_second: 23
bins_per_octave: 4
n_octaves: 4
number_of_epochs: 1
batch_size: 2
teacher_forcing_ratio: 0.6
teacher_forcing_decay: 1.0
conv_feature_size: 16
hidden_size: 16
note_emb_size: 8
staff_emb_size: 8
"""


def _make_asap_fixture(root, split, n_songs=2, seed=0):
    """ASAP layout: {split}/{spectrogram,target,info} with no version dir."""
    rng = np.random.RandomState(seed)
    base = os.path.join(root, split)
    for sub in ("spectrogram", "target", "info"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    for s in range(n_songs):
        name = f"perf{s}_0"
        spec = rng.rand(N_FRAMES - 2, N_BINS).astype(np.float32)
        np.save(os.path.join(base, "spectrogram", f"{name}.npy"), spec)
        target = []
        for _ in range(2):
            key = int(rng.randint(-6, 8))
            ts = ["4/4", "3/4"][rng.randint(2)]
            lower = rng.randint(0, 140, rng.randint(2, 5)).tolist()
            upper = rng.randint(0, 140, rng.randint(2, 6)).tolist()
            target.append([key, ts, lower, upper])
        with open(os.path.join(base, "target", f"{name}.pkl"), "wb") as f:
            pickle.dump(target, f)
        with open(os.path.join(base, "info", f"{name}.json"), "w") as f:
            json.dump({"composer": "Bach"}, f)


def _run(script, yaml_path, *extra):
    # --platform cpu keeps the smoke test off the (single-client) TPU
    # tunnel; the TPU plugin ignores the JAX_PLATFORMS env var.
    return subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, script), yaml_path,
         "--platform", "cpu", *extra],
        capture_output=True, text=True, timeout=480, cwd=REPO_ROOT)


def test_pretrain_then_finetune_cli(tmp_path):
    root = str(tmp_path)
    features = os.path.join(root, "features")
    _make_fixture(features, "train", 0)
    _make_fixture(features, "valid", 0, n_songs=2, seed=1)
    _make_fixture(features, "test", 0, n_songs=2, seed=2)
    _make_asap_fixture(os.path.join(root, "asap_features"), "train")
    _make_asap_fixture(os.path.join(root, "asap_features"), "test", seed=3)

    pre_yaml = str(tmp_path / "pretrain.yaml")
    with open(pre_yaml, "w") as f:
        f.write(TINY_YAML.format(root=root))

    # CLI override surface: dotted key=value args (epochs 2 -> 1).
    r = _run("pretrain.py", pre_yaml, "number_of_epochs=1")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "WER" in r.stdout  # final test stats printed
    out_pre = os.path.join(root, "out_pre")
    assert os.path.exists(os.path.join(out_pre, "train_log.txt"))
    log = open(os.path.join(out_pre, "train_log.txt")).read()
    assert "epoch: 1" in log and "epoch: 2" not in log  # override applied
    ckpts = [d for d in os.listdir(os.path.join(out_pre, "save"))
             if d.startswith("CKPT")]
    assert len(ckpts) == 1
    assert os.listdir(os.path.join(out_pre, "results", "test"))

    fin_yaml = str(tmp_path / "finetune.yaml")
    with open(fin_yaml, "w") as f:
        f.write(FINETUNE_YAML.format(root=root))

    r = _run("finetune.py", fin_yaml)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "WARNING: no pretrained" not in r.stdout  # warm start found
    out_fin = os.path.join(root, "out_fin")
    log = open(os.path.join(out_fin, "train_log.txt")).read()
    assert "epoch: 1" in log
    # warm-start import + the finetune epoch ran -> checkpoints exist and
    # result records were written for the ASAP test split
    assert [d for d in os.listdir(os.path.join(out_fin, "save"))
            if d.startswith("CKPT")]
    results = os.listdir(os.path.join(out_fin, "results", "test"))
    assert results and all(r_.startswith("asap~") for r_ in results)

    # evaluate.py (offline summaries; host-only, no jax): WER/F1 works
    # without Java, and MV2H still runs — the native scorer
    # (train/mv2h.py) takes over when java/classpath are absent.
    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "evaluate.py"), fin_yaml],
        capture_output=True, text=True, timeout=240, cwd=REPO_ROOT)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "WER/F1 over" in r.stdout
    assert "MV2H engine: native scorer" in r.stdout
    assert "MV2H (native) over" in r.stdout


def test_evaluate_cli_mv2h_with_fake_java(fake_bin, tmp_path):  # noqa: F811
    """The evaluate.py CLI's NON-skip MV2H branch: with java on PATH and
    an existing mv2h_bin, the CLI exports pred/target scores, runs MV2H
    per pair, and prints the syn summary table (reference:
    evaluate.py:174-186). The in-process wrapper is contract-tested in
    test_external_tool_contracts; this pins the CLI gating + wiring."""
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
    from test_external_tool_contracts import _make_result_fixture

    out = str(tmp_path / "out_eval")
    toks = LabelsMultiple(extended=True).encode("4c 4c 4c 4c")
    target = [[0, "4/4", toks, toks]]
    # Synthetic-format clip id: version~chunk~soundfont.
    _make_result_fixture(out, "test", "0~songA.0~Upright", target)
    mv2h_bin = tmp_path / "MV2H" / "bin"
    mv2h_bin.mkdir(parents=True)

    yaml_path = tmp_path / "eval.yaml"
    yaml_path.write_text(f"""\
seed: 7
workspace: {tmp_path}
output_folder: {out}
feature_folder: {tmp_path}/features
mv2h_bin: {mv2h_bin}
mv2h_timeout: 120
""")
    # --muster consumes the XML pairs the MV2H stage exports; the fake
    # MUSTER script (replaying the cwd-ER.txt contract) stands in.
    from test_external_tool_contracts import FAKE_MUSTER
    muster = tmp_path / "evaluate_XML_voicePlus.sh"
    muster.write_text(FAKE_MUSTER.format(python=sys.executable))
    muster.chmod(0o755)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "evaluate.py"),
         str(yaml_path), "--muster", "--muster-script", str(muster)],
        capture_output=True, text=True, timeout=240, cwd=str(tmp_path),
        env=dict(os.environ, PYTHONPATH=REPO_ROOT))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "WER/F1 over 1 clips" in r.stdout
    assert "skipping MV2H" not in r.stdout
    assert "MV2H export errors: 0" in r.stdout
    assert "MV2H (java) over 1 clips" in r.stdout
    # pred == target -> the fake java replays Multi-pitch 1.0
    assert "'Multi-pitch': 1.0" in r.stdout
    mv2h_json = os.path.join(out, "results", "mv2h",
                             "0~songA.0~Upright_mv2h.json")
    assert os.path.exists(mv2h_json)
    # MUSTER summary over the one exported pair, replayed components
    # (labeled external — the canonical engine when the script exists)
    assert "MUSTER (external) ER over 1 pairs: [0.1," in r.stdout


def test_evaluate_cli_muster_skips_explicitly(tmp_path):
    """--muster-engine external without the tool (or --muster without
    MV2H exports) prints an explicit skip notice — never an all-zero
    'ER over 0 pairs' that reads as a perfect score, and never a crash
    on the absent mv2h folder. Plain --muster without the tool falls
    back to the NATIVE scorer instead of skipping."""
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
    from test_external_tool_contracts import (FAKE_MUSTER,
                                              _make_result_fixture)

    out = str(tmp_path / "out_eval")
    toks = LabelsMultiple(extended=True).encode("4c 4c 4c 4c")
    _make_result_fixture(out, "test", "0~songA.0~Upright",
                         [[0, "4/4", toks, toks]])
    yaml_path = tmp_path / "eval.yaml"
    yaml_path.write_text(f"""\
seed: 7
workspace: {tmp_path}
output_folder: {out}
feature_folder: {tmp_path}/features
""")
    env = dict(os.environ, PYTHONPATH=REPO_ROOT)

    # FORCED external with the tool missing: explicit skip.
    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "evaluate.py"),
         str(yaml_path), "--muster", "--muster-engine", "external",
         "--muster-script", str(tmp_path / "missing.sh")],
        capture_output=True, text=True, timeout=240, cwd=str(tmp_path),
        env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "skipping MUSTER" in r.stdout
    assert "MUSTER tool not found" in r.stdout
    assert "ER over" not in r.stdout

    # Auto-resolution with the tool missing: the NATIVE scorer runs the
    # exported pair end-to-end (identical pred/target -> all-zero ERs,
    # labeled with the engine + component names).
    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "evaluate.py"),
         str(yaml_path), "--muster", "--muster-script",
         str(tmp_path / "missing.sh")],
        capture_output=True, text=True, timeout=240, cwd=str(tmp_path),
        env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "MUSTER (native) ER over 1 pairs:" in r.stdout
    assert "'note_duration': 0.0" in r.stdout

    # Tool present but zero successful MV2H exports (an empty results
    # split -> mv2h/ exists but is EMPTY): explicit notice, never an
    # 'ER over 0 pairs' line that reads as a perfect score.
    out2 = str(tmp_path / "out_eval2")
    _make_result_fixture(out2, "test", "0~songB.0~Upright",
                         [[0, "4/4", [4], [4]]])
    os.remove(os.path.join(out2, "results", "test",
                           "0~songB.0~Upright.json"))
    yaml2 = tmp_path / "eval2.yaml"
    yaml2.write_text(f"""\
seed: 7
workspace: {tmp_path}
output_folder: {out2}
feature_folder: {tmp_path}/features
""")
    muster = tmp_path / "evaluate_XML_voicePlus.sh"
    muster.write_text(FAKE_MUSTER.format(python=sys.executable))
    muster.chmod(0o755)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "evaluate.py"),
         str(yaml2), "--muster", "--muster-script", str(muster)],
        capture_output=True, text=True, timeout=240, cwd=str(tmp_path),
        env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "MV2H export errors: 0" in r.stdout
    assert "no MV2H exports yet" in r.stdout
    assert "MUSTER ER over" not in r.stdout


def test_resolved_config_snapshot_roundtrips(tmp_path):
    """The run dir records exactly what it ran with (reference:
    pretrain.py:263-267 create_experiment_directory semantics), and the
    snapshot is itself loadable — a rerun from <out>/hyperparams.yaml
    reproduces the resolved config, overrides and extras included."""
    from piano_a2s_tpu.config import load_experiment

    exp = load_experiment(
        os.path.join(REPO_ROOT, "configs", "pretrain.yaml"),
        ["patient=6", "guided_attention=4.0",
         f"output_folder={tmp_path}/run"])
    path = exp.snapshot(str(tmp_path / "run"))
    assert os.path.basename(path) == "hyperparams.yaml"
    again = load_experiment(path)
    assert again.patient == 6
    assert again.extras["guided_attention"] == 4.0
    # Interpolations were resolved BEFORE the snapshot: derived paths
    # follow the overridden output_folder, not the template.
    assert again.save_folder == f"{tmp_path}/run/save"
    assert again.max_length == exp.max_length
