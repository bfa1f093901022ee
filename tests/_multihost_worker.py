"""Subprocess worker for the multi-host (multi-process) training test.

Launched by tests/test_multihost.py: 2 processes x 4 virtual CPU devices
form one 8-device global mesh over DCN, exercising the process>1 paths in
the Trainer (process-0 gating of checkpoints/results/log, global-sharded
device_put of host-replicated batches, cross-host batch-contract check).

Usage: python _multihost_worker.py <process_id> <num_processes> <port>
           <workdir> <mode>
  mode "train":    fit 1 epoch on the shared fixture; dump stats JSON.
  mode "mismatch": draw per-process DIFFERENT batches; the harness's
                   cross-host batch assertion must fail.
  mode "train_sharded":    per-host sharded train loading (each process
                   reads only its shard's spectrograms); same results.
  mode "mismatch_sharded": sharded loading with diverging loader seeds;
                   the global-plan digest must fail loudly.
"""

import json
import os
import sys

process_id = int(sys.argv[1])
num_processes = int(sys.argv[2])
port = sys.argv[3]
workdir = sys.argv[4]
mode = sys.argv[5]

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# 4 virtual CPU devices per process (replaces the parent's inherited
# device-count flag; shared helper).
from piano_a2s_tpu.utils.platform import force_virtual_cpu_devices  # noqa: E402

force_virtual_cpu_devices(4)

import numpy as np  # noqa: E402

import jax  # noqa: E402

from piano_a2s_tpu.parallel import distributed_init  # noqa: E402

# distributed_init's post-initialize barrier establishes the Gloo
# collective context while the processes are still in lockstep; without
# it, compile-time skew between loaded workers can blow Gloo's internal
# ~30 s context-init deadline at the FIRST real collective (observed as
# "Gloo context initialization failed: DEADLINE_EXCEEDED" when the full
# suite shares the host with other load).
distributed_init(coordinator_address=f"localhost:{port}",
                 num_processes=num_processes,
                 process_id=process_id)

from piano_a2s_tpu.config import ExperimentConfig  # noqa: E402
from piano_a2s_tpu.data import (DataLoader, SyntheticTestDataset,  # noqa: E402
                                SyntheticTrainDataset)
from piano_a2s_tpu.train.harness import Trainer  # noqa: E402

assert jax.process_count() == num_processes
assert len(jax.devices()) == 4 * num_processes

features = os.path.join(workdir, "features")
out = os.path.join(workdir, "out")
exp = ExperimentConfig(
    seed=7, workspace=workdir, output_folder=out, feature_folder=features,
    save_folder=os.path.join(out, "save"),
    train_log=os.path.join(out, "train_log.txt"),
    max_length=(8, 6), max_bars=2, max_duration=1, frames_per_second=23,
    bins_per_octave=4, n_octaves=4, number_of_epochs=1, batch_size=8,
    conv_feature_size=16, hidden_size=16, note_emb_size=8, staff_emb_size=8)

train_ds = SyntheticTrainDataset(
    features, "train", versions=[0], max_frame_num=exp.max_frame_num,
    max_length=exp.max_length, rng=np.random.RandomState(0))
valid_ds = SyntheticTestDataset(
    features, "valid", versions=[0], max_frame_num=exp.max_frame_num,
    max_length=exp.max_length)

# All hosts must draw identical batches: same loader seed everywhere —
# except in "mismatch*" modes, which deliberately violate the contract.
loader_seed = process_id if mode.startswith("mismatch") else 0
sharded = mode.endswith("sharded")

# Instrument the heavy-IO path so the test can prove each host only read
# its own shard's spectrograms.
spec_loads = {"n": 0}
_orig_load_spec = train_ds.load_spectrogram


def _counting_load_spec(locator):
    spec_loads["n"] += 1
    return _orig_load_spec(locator)


train_ds.load_spectrogram = _counting_load_spec

train_loader = DataLoader(
    train_ds, exp.batch_size, shuffle=True, seed=loader_seed,
    shard=(process_id, num_processes) if sharded else None)
valid_loader = DataLoader(valid_ds, exp.batch_size)

trainer = Trainer(exp, use_mesh=True)
assert trainer.mesh.devices.size == 4 * num_processes
trainer.fit(train_loader, valid_loader)

params_host = jax.device_get(trainer.params)
param_sum = float(sum(np.float64(np.asarray(p)).sum()
                      for p in jax.tree.leaves(params_host)))
stats = {"train_loss": trainer.train_stats["loss"],
         "param_sum": param_sum,
         "is_main": trainer.is_main_process,
         "train_spectrogram_loads": spec_loads["n"]}
with open(os.path.join(workdir, f"stats_{process_id}.json"), "w") as f:
    json.dump(stats, f)
print(f"[proc {process_id}] done: {stats}", flush=True)
