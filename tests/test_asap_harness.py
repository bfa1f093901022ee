"""Finetune-style harness run over the ASAP on-disk layout (no version
subdirectory): result records must reference existing target files —
the reference's finetune writes broken 'asap~'-prefixed paths; we fix it.
"""

import json
import os
import pickle

import numpy as np

from piano_a2s_tpu.config import ExperimentConfig
from piano_a2s_tpu.data import ASAPDataset, DataLoader
from piano_a2s_tpu.train.harness import Trainer

N_FRAMES, N_BINS = 24, 16


def _make_asap_fixture(root, split, n=2, seed=0):
    rng = np.random.RandomState(seed)
    base = os.path.join(root, split)
    for sub in ("spectrogram", "target"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    for s in range(n):
        name = f"Bach#piece{s}#perf"
        np.save(os.path.join(base, "spectrogram", f"{name}.npy"),
                rng.rand(N_FRAMES - 2, N_BINS).astype(np.float32))
        target = [[int(rng.randint(-6, 8)), "4/4",
                   rng.randint(0, 140, 3).tolist(),
                   rng.randint(0, 140, 4).tolist()] for _ in range(2)]
        with open(os.path.join(base, "target", f"{name}.pkl"), "wb") as f:
            pickle.dump(target, f)


def test_asap_records_reference_existing_targets(tmp_path):
    root = str(tmp_path / "features")
    _make_asap_fixture(root, "train")
    _make_asap_fixture(root, "test", seed=1)
    out = str(tmp_path / "out")
    exp = ExperimentConfig(
        seed=5, workspace=str(tmp_path), output_folder=out,
        feature_folder=root, save_folder=os.path.join(out, "save"),
        train_log=os.path.join(out, "log.txt"),
        max_length=(8, 6), max_bars=2, max_duration=1, frames_per_second=23,
        bins_per_octave=4, n_octaves=4, number_of_epochs=1, batch_size=2,
        conv_feature_size=16, hidden_size=16, note_emb_size=8,
        staff_emb_size=8)
    ds_train = ASAPDataset(root, "train", max_frame_num=exp.max_frame_num,
                           max_length=exp.max_length)
    ds_test = ASAPDataset(root, "test", max_frame_num=exp.max_frame_num,
                          max_length=exp.max_length)
    item = ds_train[0]
    assert item["version"] == "asap"

    trainer = Trainer(exp)
    trainer.fit(DataLoader(ds_train, 2), DataLoader(ds_test, 2), epochs=1)
    results_dir = os.path.join(out, "results", "valid")
    records = sorted(os.listdir(results_dir))
    assert len(records) == 2
    for rec_file in records:
        assert rec_file.startswith("asap~")
        rec = json.load(open(os.path.join(results_dir, rec_file)))
        assert os.path.exists(rec["target_path"]), rec["target_path"]
