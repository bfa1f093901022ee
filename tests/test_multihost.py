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


def _launch_once(workdir: str, mode: str):
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
    try:
        for p in procs:
            # 900 s: two jax.distributed processes compiling on a fully
            # loaded CI host have been observed to exceed 480 s.
            out, _ = p.communicate(timeout=900)
            outs.append((p.returncode, out))
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
        # synthesize an environmental-timeout marker _launch retries on
        outs = [(-1, "ENV-TIMEOUT: worker pair exceeded 900 s "
                     "(compile/collective skew under host load)")]
    return outs


_ENV_FLAKE_MARKS = (
    # Gloo establishes its collective context at the first cross-process
    # collective under a hard ~30 s internal deadline; compile-time skew
    # between workers on a loaded host blows it (parallel.distributed_init)
    "Gloo context initialization failed",
    "DEADLINE_EXCEEDED",
    # coordinator/barrier timeouts in the same init phase
    "Barrier timed out",
    "barrier timed out",
    "ENV-TIMEOUT",
)


def _launch(workdir: str, mode: str):
    """Launch the 2-process worker pair, retrying ONCE on documented
    ENVIRONMENTAL failures (Gloo context deadline, distributed barrier
    timeout, or the pair exceeding the hard wall limit under host load).
    Those say nothing about the code under test; a single retry keeps
    full-suite runs deterministic without masking real failures — any
    other error, or a second environmental failure, still fails."""
    outs = _launch_once(workdir, mode)
    if any(mark in out for _, out in outs for mark in _ENV_FLAKE_MARKS):
        outs = _launch_once(workdir, mode)
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


@pytest.fixture()
def big_fixture_dir(tmp_path):
    # 8 train songs so per-host sharded loading (4 spectrograms/host) is
    # distinguishable from full replication (8/host).
    root = str(tmp_path / "features")
    _make_fixture(root, "train", 0, n_songs=8)
    _make_fixture(root, "valid", 0, n_songs=2, seed=1)
    return str(tmp_path)


@pytest.mark.slow
def test_per_host_sharded_loading_matches_replicated(big_fixture_dir):
    """Per-host sharded train loading: each process reads only its own
    shard's spectrograms, and training results are identical across hosts
    and equal (at reduction-order tolerance) to a single-process 8-device
    run with plain replicated loading."""
    outs = _launch(big_fixture_dir, "train_sharded")
    for rc, out in outs:
        assert rc == 0, out
    stats = [json.load(open(os.path.join(big_fixture_dir,
                                         f"stats_{i}.json")))
             for i in range(2)]
    assert stats[0]["train_loss"] == stats[1]["train_loss"]
    assert stats[0]["param_sum"] == stats[1]["param_sum"]
    # IO scaling: 1 epoch = one global batch of 8 -> 4 spectrogram reads
    # per host (half the global batch each), not 8.
    assert [s["train_spectrogram_loads"] for s in stats] == [4, 4]

    from piano_a2s_tpu.config import ExperimentConfig
    from piano_a2s_tpu.data import (DataLoader, SyntheticTestDataset,
                                    SyntheticTrainDataset)
    from piano_a2s_tpu.train.harness import Trainer
    import jax

    sp_out = os.path.join(big_fixture_dir, "out_single")
    exp = ExperimentConfig(
        seed=7, workspace=big_fixture_dir, output_folder=sp_out,
        feature_folder=os.path.join(big_fixture_dir, "features"),
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
    np.testing.assert_allclose(trainer.train_stats["loss"],
                               stats[0]["train_loss"], rtol=1e-5)
    np.testing.assert_allclose(param_sum, stats[0]["param_sum"], rtol=1e-4)


@pytest.mark.slow
def test_mismatched_sharded_batch_plans_fail_loudly(big_fixture_dir):
    """With per-host loading, a seed mismatch corrupts WHICH rows each
    host loads; the global-plan digest must catch it."""
    outs = _launch(big_fixture_dir, "mismatch_sharded")
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


def test_sharded_loader_contract(tmp_path):
    """Host-level contract of shard=(rank, world): global batch plan and
    targets on every rank, complementary contiguous spectrogram shards."""
    root = str(tmp_path / "features")
    _make_fixture(root, "train", 0, n_songs=8)
    from piano_a2s_tpu.data import DataLoader, SyntheticTrainDataset

    def loader(rank):
        ds = SyntheticTrainDataset(root, "train", versions=[0],
                                   max_frame_num=24, max_length=(8, 6),
                                   rng=np.random.RandomState(0))
        return DataLoader(ds, 8, shuffle=True, seed=0, shard=(rank, 2))

    (b0,), (b1,) = list(loader(0)), list(loader(1))
    # identical global plan + targets on both ranks
    assert b0["names"] == b1["names"] and len(b0["names"]) == 8
    assert b0["n_real"] == b1["n_real"] == 8
    for k in ("time_sig", "key", "upper", "upper_lengths", "lower",
              "lower_lengths"):
        assert b0[k].shape[0] == 8
        np.testing.assert_array_equal(b0[k], b1[k])
    # complementary contiguous local spectrogram shards
    assert b0["local_rows"] == (0, 4) and b1["local_rows"] == (4, 8)
    assert b0["spectrogram"].shape[0] == 4
    full = loader(0)
    full.shard = None
    (ref,) = list(full)
    np.testing.assert_array_equal(
        np.concatenate([b0["spectrogram"], b1["spectrogram"]]),
        ref["spectrogram"])

    # final-batch padding replicates the last locator globally
    ds = SyntheticTrainDataset(root, "train", versions=[0],
                               max_frame_num=24, max_length=(8, 6),
                               rng=np.random.RandomState(0))
    batches = list(DataLoader(ds, 6, shuffle=False, seed=0, shard=(1, 2)))
    last = batches[-1]
    assert last["n_real"] == 2 and len(last["names"]) == 6
    assert last["names"][1:] == [last["names"][1]] * 5

    # divisibility and capability validation
    with pytest.raises(ValueError):
        DataLoader(ds, 5, shard=(0, 2))
    with pytest.raises(ValueError):
        DataLoader(ds, 4, shard=(2, 2))


def test_put_batch_process_local_rejects_wrong_rows(tmp_path):
    """A loader shard that doesn't match the rows this process's devices
    own must fail loudly instead of silently misassigning rows."""
    import jax
    from piano_a2s_tpu.parallel import (make_mesh,
                                        put_batch_process_local)
    if jax.device_count() < 4:
        pytest.skip("needs the 8-virtual-device CPU platform")
    mesh = make_mesh(4)
    batch = {"spectrogram": np.zeros((2, 3), np.float32),  # claims 2 rows
             "key": np.zeros((4, 2), np.int32)}
    # single process owns ALL 4 rows; a (0, 2) claim is inconsistent
    with pytest.raises(ValueError, match="owned by process"):
        put_batch_process_local(batch, mesh, (0, 2))
    # the consistent claim assembles a correctly sharded global array
    batch["spectrogram"] = np.zeros((4, 3), np.float32)
    out = put_batch_process_local(batch, mesh, (0, 4))
    assert out["spectrogram"].shape == (4, 3)
    assert out["key"].sharding.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
        ndim=2)
