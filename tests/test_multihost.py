"""Multi-host (multi-process) data parallelism over the DCN axis.

Two jax.distributed processes with 4 virtual CPU devices each form one
8-device global mesh and run the full Trainer path (SURVEY §2.4: the
torchrun/NCCL replacement must also cover the multi-HOST case, not just
multi-chip within one process). Verifies:

- both processes compute identical training results;
- the result equals a single-process 8-device run of the same config
  (process boundaries change nothing);
- only process 0 writes checkpoints/results/log (harness process gating);
- the cross-host batch-contract check fails loudly when hosts draw
  different batches (the silent-corruption mode this guards against).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from test_harness_e2e import _make_fixture

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(workdir: str, mode: str):
    port = _free_port()
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), workdir, mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append((p.returncode, out))
    return outs


@pytest.fixture()
def fixture_dir(tmp_path):
    root = str(tmp_path / "features")
    _make_fixture(root, "train", 0, n_songs=4)
    _make_fixture(root, "valid", 0, n_songs=2, seed=1)
    return str(tmp_path)


@pytest.mark.slow
def test_two_process_training_matches_single_process(fixture_dir):
    outs = _launch(fixture_dir, "train")
    for rc, out in outs:
        assert rc == 0, out

    stats = [json.load(open(os.path.join(fixture_dir, f"stats_{i}.json")))
             for i in range(2)]
    # Identical results on every host (replicated outputs of one SPMD
    # program); process-0 flag set on exactly one.
    assert stats[0]["train_loss"] == stats[1]["train_loss"]
    assert stats[0]["param_sum"] == stats[1]["param_sum"]
    assert np.isfinite(stats[0]["train_loss"])
    assert [s["is_main"] for s in stats] == [True, False]

    # Only process 0 wrote checkpoints / results / the train log.
    out = os.path.join(fixture_dir, "out")
    ckpts = [d for d in os.listdir(os.path.join(out, "save"))
             if d.startswith("CKPT")]
    assert len(ckpts) == 1
    assert os.path.exists(os.path.join(out, "train_log.txt"))
    assert len(os.listdir(os.path.join(out, "results", "valid"))) == 2

    # Process boundaries change nothing: the same config on ONE process
    # spanning all 8 devices (this pytest process's virtual platform)
    # produces the same loss and parameters.
    from piano_a2s_tpu.config import ExperimentConfig
    from piano_a2s_tpu.data import (DataLoader, SyntheticTestDataset,
                                    SyntheticTrainDataset)
    from piano_a2s_tpu.train.harness import Trainer
    import jax

    sp_out = os.path.join(fixture_dir, "out_single")
    exp = ExperimentConfig(
        seed=7, workspace=fixture_dir, output_folder=sp_out,
        feature_folder=os.path.join(fixture_dir, "features"),
        save_folder=os.path.join(sp_out, "save"),
        train_log=os.path.join(sp_out, "train_log.txt"),
        max_length=(8, 6), max_bars=2, max_duration=1, frames_per_second=23,
        bins_per_octave=4, n_octaves=4, number_of_epochs=1, batch_size=8,
        conv_feature_size=16, hidden_size=16, note_emb_size=8,
        staff_emb_size=8)
    train_ds = SyntheticTrainDataset(
        exp.feature_folder, "train", versions=[0],
        max_frame_num=exp.max_frame_num, max_length=exp.max_length,
        rng=np.random.RandomState(0))
    valid_ds = SyntheticTestDataset(
        exp.feature_folder, "valid", versions=[0],
        max_frame_num=exp.max_frame_num, max_length=exp.max_length)
    trainer = Trainer(exp, use_mesh=True, n_devices=8)
    trainer.fit(DataLoader(train_ds, exp.batch_size, shuffle=True, seed=0),
                DataLoader(valid_ds, exp.batch_size))
    params_host = jax.device_get(trainer.params)
    param_sum = float(sum(np.float64(np.asarray(p)).sum()
                          for p in jax.tree.leaves(params_host)))
    # Approximate equality: gloo (2-process) and single-process XLA reduce
    # gradients in different orders, so f32 results differ at rounding
    # level; what is exact is cross-HOST agreement (asserted above).
    np.testing.assert_allclose(trainer.train_stats["loss"],
                               stats[0]["train_loss"], rtol=1e-5)
    np.testing.assert_allclose(param_sum, stats[0]["param_sum"], rtol=1e-4)


@pytest.mark.slow
def test_mismatched_host_batches_fail_loudly(fixture_dir):
    outs = _launch(fixture_dir, "mismatch")
    assert any(rc != 0 for rc, _ in outs), outs
    combined = "\n".join(out for _, out in outs)
    assert "batch mismatch" in combined, combined


def test_loader_determinism_across_hosts(tmp_path):
    """The multi-host loader contract: identical seed + dataset listing
    order => identical batch streams (what every host relies on)."""
    root = str(tmp_path / "features")
    _make_fixture(root, "train", 0, n_songs=4)
    from piano_a2s_tpu.data import DataLoader, SyntheticTrainDataset

    def stream():
        ds = SyntheticTrainDataset(root, "train", versions=[0],
                                   max_frame_num=24, max_length=(8, 6),
                                   rng=np.random.RandomState(0))
        return list(DataLoader(ds, 2, shuffle=True, seed=0))

    a, b = stream(), stream()
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        assert ba["names"] == bb["names"]
        for k in ("spectrogram", "upper", "lower", "time_sig", "key"):
            np.testing.assert_array_equal(ba[k], bb[k])
