"""End-to-end harness test: build a tiny on-disk fixture dataset with the
reference's folder layout, train 2 epochs, validate WER/F1/checkpoint/log
behavior, resume, and evaluate."""

import json
import os
import pickle

import numpy as np
import pytest

from piano_a2s_tpu.config import ExperimentConfig
from piano_a2s_tpu.data import (DataLoader, SyntheticTestDataset,
                                SyntheticTrainDataset)
from piano_a2s_tpu.train.harness import Trainer

N_FRAMES = 24
N_BINS = 16


def _make_fixture(root, split, version, n_songs=4, seed=0):
    rng = np.random.RandomState(seed)
    base = os.path.join(root, split, str(version))
    for sub in ("spectrogram", "target", "info"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    for s in range(n_songs):
        name = f"song{s}~v0~font{s % 2}"
        spec = rng.rand(N_FRAMES - 2, N_BINS).astype(np.float32)
        np.save(os.path.join(base, "spectrogram", f"{name}.npy"), spec)
        target = []
        for _ in range(2):  # max_bars = 2
            key = int(rng.randint(-6, 8))
            ts = ["4/4", "3/4"][rng.randint(2)]
            lower = rng.randint(0, 140, rng.randint(2, 5)).tolist()
            upper = rng.randint(0, 140, rng.randint(2, 6)).tolist()
            target.append([key, ts, lower, upper])
        with open(os.path.join(base, "target",
                               f"{name.split('~')[0]}.pkl"), "wb") as f:
            pickle.dump(target, f)
        with open(os.path.join(base, "info",
                               f"{name.split('~')[0]}.json"), "w") as f:
            json.dump({"composer": "testcomposer"}, f)


@pytest.fixture()
def exp(tmp_path):
    root = str(tmp_path / "features")
    _make_fixture(root, "train", 0)
    _make_fixture(root, "valid", 0, n_songs=2, seed=1)
    _make_fixture(root, "test", 0, n_songs=2, seed=2)
    out = str(tmp_path / "out")
    return ExperimentConfig(
        seed=7, workspace=str(tmp_path), output_folder=out,
        feature_folder=root, save_folder=os.path.join(out, "save"),
        train_log=os.path.join(out, "train_log.txt"),
        max_length=(8, 6), max_bars=2, max_duration=1, frames_per_second=23,
        bins_per_octave=4, n_octaves=4, number_of_epochs=2, batch_size=2,
        conv_feature_size=16, hidden_size=16, note_emb_size=8,
        staff_emb_size=8)


def test_dataset_contract(exp):
    ds = SyntheticTrainDataset(exp.feature_folder, "train", versions=[0],
                               max_frame_num=exp.max_frame_num,
                               max_length=exp.max_length,
                               rng=np.random.RandomState(0))
    item = ds[0]
    assert item["spectrogram"].shape == (1, N_FRAMES, N_BINS)
    assert item["time_sig"].shape == (2,)
    assert item["upper"].shape == (2, 8)
    assert item["lower"].shape == (2, 6)
    # EOS directly after tokens, pad elsewhere
    up, lens = item["upper"], item["upper_lengths"]
    for bar in range(2):
        assert up[bar, lens[bar]] == 146
        assert (up[bar, lens[bar] + 1:] == 147).all()
    assert (item["key"] >= 0).all() and (item["key"] < 14).all()


def test_fit_evaluate_resume(exp):
    train_ds = SyntheticTrainDataset(
        exp.feature_folder, "train", versions=[0],
        max_frame_num=exp.max_frame_num, max_length=exp.max_length,
        rng=np.random.RandomState(0))
    valid_ds = SyntheticTestDataset(
        exp.feature_folder, "valid", versions=[0],
        max_frame_num=exp.max_frame_num, max_length=exp.max_length)
    test_ds = SyntheticTestDataset(
        exp.feature_folder, "test", versions=[0],
        max_frame_num=exp.max_frame_num, max_length=exp.max_length)

    train_loader = DataLoader(train_ds, exp.batch_size, shuffle=True, seed=0)
    valid_loader = DataLoader(valid_ds, exp.batch_size)
    test_loader = DataLoader(test_ds, exp.batch_size)

    trainer = Trainer(exp)
    trainer.fit(train_loader, valid_loader)

    # train log written with epoch lines
    log = open(exp.train_log).read()
    assert "epoch: 1" in log and "epoch: 2" in log
    assert "WER" in log

    # exactly one checkpoint kept (best WER)
    ckpts = [d for d in os.listdir(exp.save_folder) if d.startswith("CKPT")]
    assert len(ckpts) == 1

    # per-clip result JSONs exist with the reference's record schema
    results = os.listdir(os.path.join(exp.output_folder, "results", "valid"))
    assert len(results) == 2
    rec = json.load(open(os.path.join(exp.output_folder, "results", "valid",
                                      results[0])))
    for field in ("style", "soundfont", "composer", "pred", "wer_upper",
                  "wer_lower", "key_f1", "time_f1"):
        assert field in rec
    assert rec["composer"] == "testcomposer"
    assert len(rec["pred"]) == 2 and len(rec["pred"][0]) == 4

    # evaluate loads best ckpt and writes test results
    stats = trainer.evaluate(test_loader)
    assert np.isfinite(stats["loss"]) and 0 <= stats["key_f1"] <= 1
    assert os.path.isdir(os.path.join(exp.output_folder, "results", "test"))

    # resume: a fresh trainer picks up after the kept (best-WER) checkpoint
    # — keep-only-best means resume restarts after the BEST epoch, exactly
    # like SpeechBrain's Checkpointer recovery under save_and_keep_only.
    trainer2 = Trainer(exp)
    assert trainer2.try_resume()
    assert trainer2.start_epoch in (2, 3)
    trainer2.fit(train_loader, valid_loader, epochs=3)
    log = open(exp.train_log).read()
    assert "epoch: 3" in log


def test_partial_checkpoint_ignored_and_swept(tmp_path):
    """Crash recovery: a CKPT dir without meta.json (meta is written last,
    so this is the debris of a save killed mid-flight — observed on a real
    SIGKILL mid-save) is invisible to best/latest/resume, and the next
    save_and_keep_only sweeps it."""
    import jax
    from piano_a2s_tpu.train.checkpoint import Checkpointer

    ckptr = Checkpointer(str(tmp_path / "save"))
    trees = {"params": {"w": np.ones(3, np.float32)}}
    good = ckptr.save_and_keep_only(trees, {"WER": 5.0},
                                    {"epoch": 1}, min_keys=("WER",))
    # simulate a killed save: partial dir with arrays but no meta.json
    partial = os.path.join(str(tmp_path / "save"), "CKPT+9999+partial")
    os.makedirs(os.path.join(partial, "params"))
    assert ckptr.latest_path() == good
    assert ckptr.best_path() == good
    # a non-improving epoch SKIPS the save entirely (it would be deleted
    # by keep-only-best anyway; saving costs a full device_get)
    worse = ckptr.save_and_keep_only(
        {"params": {"w": 9 * np.ones(3, np.float32)}}, {"WER": 7.0},
        {"epoch": 2}, min_keys=("WER",))
    assert worse == good and ckptr._ckpt_dirs() == [good]
    # debris is swept even on the skip-save path (non-improving epochs
    # are the common case after a crash late in training)
    assert not os.path.exists(partial)
    os.makedirs(os.path.join(partial, "params"))  # fresh debris
    trees2 = {"params": {"w": 2 * np.ones(3, np.float32)}}
    ckptr.save_and_keep_only(trees2, {"WER": 4.0}, {"epoch": 2},
                             min_keys=("WER",))
    assert not os.path.exists(partial)  # debris swept
    best = ckptr.best_path()
    loaded, host_state, meta = ckptr.load(best, trees)
    np.testing.assert_array_equal(np.asarray(loaded["params"]["w"]),
                                  2 * np.ones(3))
    assert host_state["epoch"] == 2 and meta["WER"] == 4.0
    del jax  # imported for platform side effects only


def test_profile_flag_produces_trace_and_step_times(exp):
    """--profile wiring: an XLA trace of the first steps plus per-step
    timing (profile/step_times.json and step_ms in the train log)."""
    exp.extras["profile"] = True
    exp.number_of_epochs = 1
    train_ds = SyntheticTrainDataset(
        exp.feature_folder, "train", versions=[0],
        max_frame_num=exp.max_frame_num, max_length=exp.max_length,
        rng=np.random.RandomState(0))
    valid_ds = SyntheticTestDataset(
        exp.feature_folder, "valid", versions=[0],
        max_frame_num=exp.max_frame_num, max_length=exp.max_length)
    trainer = Trainer(exp)
    trainer.fit(DataLoader(train_ds, exp.batch_size, shuffle=True, seed=0),
                DataLoader(valid_ds, exp.batch_size))

    prof_dir = os.path.join(exp.output_folder, "profile")
    # jax.profiler writes plugins/profile/<ts>/*.trace.json.gz etc.
    trace_files = [os.path.join(dp, f)
                   for dp, _, fs in os.walk(prof_dir) for f in fs]
    assert any("trace" in f or f.endswith(".pb") for f in trace_files), \
        trace_files
    times = json.load(open(os.path.join(prof_dir, "step_times.json")))
    assert times["train_step"]["count"] == 2  # 4 songs / batch 2
    assert times["train_step"]["mean_s"] > 0
    assert "step_ms" in open(exp.train_log).read()


def test_checkpoint_tag_collision_same_second(tmp_path):
    """Two saves within one wall-clock second after keep-only deletions
    must land in DISTINCT dirs (regression: the count suffix reset after
    deletions, colliding the tag; orbax refuses existing destinations)."""
    from piano_a2s_tpu.train.checkpoint import Checkpointer

    ck = Checkpointer(str(tmp_path / "save"))
    trees = {"params": {"w": np.zeros(3, np.float32)}}
    p1 = ck.save_and_keep_only(trees, {"WER": 2.0})
    p2 = ck.save_and_keep_only(trees, {"WER": 1.0})  # improves -> saves,
    p3 = ck.save_and_keep_only(trees, {"WER": 0.5})  # deleting the prior
    assert len({p1, p2, p3}) == 3
    assert os.path.isdir(p3)


def test_warm_start_uses_fresh_optimizer(exp, tmp_path):
    """import_from marks checkpoints fresh_optimizer; restoring one
    re-initializes Adadelta (the reference's recoverables exclude the
    optimizer, so finetune epoch 1 runs at the config lr with zero
    accumulators), while intra-run resume keeps the full opt state."""
    import jax
    from piano_a2s_tpu.train.checkpoint import Checkpointer

    train_ds = SyntheticTrainDataset(
        exp.feature_folder, "train", versions=[0],
        max_frame_num=exp.max_frame_num, max_length=exp.max_length,
        rng=np.random.RandomState(0))
    valid_ds = SyntheticTestDataset(
        exp.feature_folder, "valid", versions=[0],
        max_frame_num=exp.max_frame_num, max_length=exp.max_length)
    trainer = Trainer(exp)
    trainer.fit(DataLoader(train_ds, 2, shuffle=True, seed=0),
                DataLoader(valid_ds, 2))
    # after two epochs the Adadelta accumulators are non-zero
    acc_leaves = jax.tree.leaves(trainer.opt_state)
    assert any(float(np.abs(np.asarray(a)).max()) > 0 for a in acc_leaves)

    # intra-run resume restores the full optimizer state
    resumed = Trainer(exp)
    assert resumed.try_resume()
    for a, b in zip(jax.tree.leaves(resumed.opt_state),
                    jax.tree.leaves(trainer.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # warm-start import -> fresh optimizer on restore
    exp2 = ExperimentConfig(
        **{**{f.name: getattr(exp, f.name)
              for f in __import__("dataclasses").fields(exp)
              if f.name != "extras"},
           "output_folder": str(tmp_path / "out2"),
           "save_folder": str(tmp_path / "out2" / "save"),
           "train_log": str(tmp_path / "out2" / "log.txt")})
    Checkpointer(exp2.save_folder).import_from(
        exp.save_folder, reset_meta={"WER": 100},
        reset_host_state={"epoch": 0, "global_step": 0})
    warm = Trainer(exp2)
    assert warm.try_resume()
    fresh = warm.optimizer.init(warm.params)
    for a, b in zip(jax.tree.leaves(warm.opt_state),
                    jax.tree.leaves(fresh)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params DID carry over from the pretrained run
    for a, b in zip(jax.tree.leaves(warm.params),
                    jax.tree.leaves(trainer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
