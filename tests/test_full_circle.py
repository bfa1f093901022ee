"""Full-circle integration: kern score -> chunk targets -> dataset ->
training -> evaluation records -> score-file export. Catches contract
drift between pipeline stages that unit tests can't see."""

import json
import os
import pickle

import numpy as np

from piano_a2s_tpu.config import ExperimentConfig
from piano_a2s_tpu.data import DataLoader, SyntheticTrainDataset, \
    SyntheticTestDataset
from piano_a2s_tpu.data.datasets import load_time_signatures
from piano_a2s_tpu.data.render import split_single_score
from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
from piano_a2s_tpu.train.evaluate_offline import get_mv2h_from_test
from piano_a2s_tpu.train.harness import Trainer

HEADER = "**kern\t**kern\n*clefF4\t*clefG2\n*k[f#]\t*k[f#]\n*M4/4\t*M4/4\n"
MEAS = ["2C 2E\t4cc\n.\t4dd\n2G\t2ee\n", "1D\t2ff#\n.\t2gg\n"]


def _make_corpus(kern_dir, n_scores=2, n_measures=14):
    os.makedirs(kern_dir, exist_ok=True)
    for s in range(n_scores):
        lines = [HEADER + MEAS[s % 2]]
        for m in range(2, n_measures + 1):
            lines.append(f"={m}\t={m}\n" + MEAS[(m + s) % 2])
        with open(os.path.join(kern_dir, f"song{s}.krn"), "w") as f:
            f.write("".join(lines) + "=\n*-\t*-\n")


def test_full_circle(tmp_path):
    root = str(tmp_path)
    features = os.path.join(root, "features")
    kern_dir = os.path.join(root, "kern")
    _make_corpus(kern_dir)

    # Stage 1: score -> chunks -> targets (native pipeline)
    labels = LabelsMultiple(extended=True)
    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        for path in sorted(os.listdir(kern_dir)):
            split_single_score(os.path.join(kern_dir, path), features,
                               labels, load_time_signatures(), split=split,
                               version=0, rng=rng)
    train_targets = os.listdir(os.path.join(features, "train", "0",
                                            "target"))
    assert len(train_targets) >= 4

    # Stage 2: synthesize spectrograms for each target (stand-in for the
    # FluidSynth render; shapes/layout are what matters here)
    n_frames, n_bins = 20, 16
    for split in ("train", "test"):
        base = os.path.join(features, split, "0")
        spec_dir = os.path.join(base, "spectrogram")
        os.makedirs(spec_dir, exist_ok=True)
        for t in os.listdir(os.path.join(base, "target")):
            name = t[:-4] + "~Upright"
            np.save(os.path.join(spec_dir, f"{name}.npy"),
                    rng.rand(n_frames - 2, n_bins).astype(np.float32))

    # Stage 3: datasets + one epoch of training + evaluation records
    out = os.path.join(root, "out")
    exp = ExperimentConfig(
        seed=3, workspace=root, output_folder=out, feature_folder=features,
        save_folder=os.path.join(out, "save"),
        train_log=os.path.join(out, "log.txt"), max_length=(24, 16),
        max_bars=5, max_duration=1, frames_per_second=n_frames - 1,
        bins_per_octave=4, n_octaves=4, number_of_epochs=1, batch_size=2,
        conv_feature_size=16, hidden_size=16, note_emb_size=8,
        staff_emb_size=8)
    train_ds = SyntheticTrainDataset(
        features, "train", versions=[0], max_frame_num=exp.max_frame_num,
        max_length=exp.max_length, rng=np.random.RandomState(1))
    test_ds = SyntheticTestDataset(
        features, "test", versions=[0], max_frame_num=exp.max_frame_num,
        max_length=exp.max_length)
    item = train_ds[0]
    assert item["spectrogram"].shape == (1, n_frames, n_bins)
    assert (item["time_sig"] < 7).all()

    trainer = Trainer(exp)
    trainer.fit(DataLoader(train_ds, 2, shuffle=True, seed=0),
                DataLoader(test_ds, 2), epochs=1)
    trainer.evaluate(DataLoader(test_ds, 2))

    # Stage 4: offline export from the evaluation records + the native
    # MV2H scorer (the engine the CLI resolves to without java)
    assert os.listdir(os.path.join(out, "results", "test"))
    errors = get_mv2h_from_test(out, "test", mv2h_bin="/nonexistent",
                                engine="native")
    assert errors == []  # every pred AND target exported AND scored
    exported = os.listdir(os.path.join(out, "results", "midi", "target"))
    assert len(exported) == len(os.listdir(
        os.path.join(out, "results", "test")))
    # Target-side MIDI must contain real notes (round-trip through the
    # pickle -> token -> kern -> Score -> SMF chain)
    from piano_a2s_tpu.symbolic.midi_io import read_midi
    midi = read_midi(os.path.join(out, "results", "midi", "target",
                                  exported[0]))
    assert len(midi.notes()) > 3
