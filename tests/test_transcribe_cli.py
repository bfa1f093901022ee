"""transcribe.py CLI smoke: the many-file path streams through the
pipelined serving loop (lazy wav reads, incremental outputs)."""

import os
import subprocess
import sys

import numpy as np

from conftest import REPO_ROOT

TINY_YAML = """\
seed: 0
midi_syn: score
workspace: {root}
output_folder: {root}/out
feature_folder: {root}/features
save_folder: {root}/out/save
train_log: {root}/out/log.txt
max_length: [8, 6]
max_bars: 2
max_duration: 1
frames_per_second: 23
bins_per_octave: 3
n_octaves: 4
conv_feature_size: 16
hidden_size: 16
note_emb_size: 8
staff_emb_size: 8
number_of_epochs: 1
batch_size: 2
"""


def test_transcribe_cli_stream_path(tmp_path):
    from piano_a2s_tpu.utils.audio import write_wav
    rng = np.random.RandomState(0)
    wavs = []
    for i in range(6):  # >4 inputs -> the stream path
        p = str(tmp_path / f"clip{i}.wav")
        write_wav(p, 0.1 * rng.randn(8000), 16000)
        wavs.append(p)
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML.format(root=tmp_path))
    out_dir = str(tmp_path / "scores")

    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "transcribe.py"), *wavs,
         "--out-dir", out_dir, "--config", str(cfg), "--batch-size", "2",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=480, cwd=REPO_ROOT)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "transcribed 6 clip(s)" in r.stdout
    for i in range(6):
        for ext in (".krn", ".xml", ".mid"):
            assert os.path.exists(os.path.join(out_dir, f"clip{i}{ext}")), \
                (i, ext, os.listdir(out_dir))


def test_transcribe_cli_npy_inputs(tmp_path):
    """.npy audio inputs (the synthetic corpus generator's audio/ format)
    mix with wav inputs on the small-job blocking path."""
    from piano_a2s_tpu.utils.audio import write_wav
    rng = np.random.RandomState(1)
    npy = str(tmp_path / "clip_a.npy")
    np.save(npy, (0.1 * rng.randn(8000)).astype(np.float32))
    wav = str(tmp_path / "clip_b.wav")
    write_wav(wav, 0.1 * rng.randn(8000), 16000)
    # int16 PCM .npy rides the raw-int16 fast path (converted on device)
    pcm = str(tmp_path / "clip_c.npy")
    np.save(pcm, rng.randint(-3000, 3000, 8000).astype(np.int16))
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML.format(root=tmp_path))
    out_dir = str(tmp_path / "scores")

    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "transcribe.py"), npy, wav,
         pcm, "--out-dir", out_dir, "--config", str(cfg),
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=480, cwd=REPO_ROOT)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "transcribed 3 clip(s)" in r.stdout
    for stem in ("clip_a", "clip_b", "clip_c"):
        for ext in (".krn", ".xml", ".mid"):
            assert os.path.exists(os.path.join(out_dir, f"{stem}{ext}"))


def test_transcribe_cli_rejects_nonaudio_npy(tmp_path):
    """A 2-D .npy (spectrogram / stereo) fails fast with a clear message
    naming the file, not deep inside the VQT."""
    bad = str(tmp_path / "spec.npy")
    np.save(bad, np.zeros((10, 480), np.float32))
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML.format(root=tmp_path))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "transcribe.py"), bad,
         "--out-dir", str(tmp_path / "scores"), "--config", str(cfg),
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=480, cwd=REPO_ROOT)
    assert r.returncode != 0
    assert "spec.npy" in r.stderr
    assert "1-D float or int16 PCM audio" in r.stderr
