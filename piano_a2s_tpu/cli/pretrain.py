"""Pretrain on synthesized data.

Usage (same surface as the reference, reference: README.md:116-122):
    python pretrain.py configs/pretrain.yaml [key=value ...]
    python pretrain.py configs/pretrain.yaml --data-parallel   # mesh DP

Replaces `torchrun --nproc_per_node=N pretrain.py`: data parallelism is a
JAX device mesh over all local chips (add jax.distributed.initialize for
multi-host), enabled with --data-parallel.
"""

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("hparams", help="YAML config path")
    parser.add_argument("overrides", nargs="*", help="key=value overrides")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard the batch over all devices (mesh DP)")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() so the "
                             "mesh spans all hosts (DCN between hosts)")
    parser.add_argument("--profile", action="store_true",
                        help="capture an XLA trace of the first steps to "
                             "<output_folder>/profile and log per-step "
                             "timing (adds a device sync per step)")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. 'cpu' for a "
                             "hardware-free run; the TPU plugin ignores "
                             "the JAX_PLATFORMS env var)")
    args = parser.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        from piano_a2s_tpu.parallel import distributed_init
        distributed_init()

    from piano_a2s_tpu.config import load_experiment
    from piano_a2s_tpu.data import (DataLoader, SyntheticTestDataset,
                                    SyntheticTrainDataset)
    from piano_a2s_tpu.train.harness import Trainer
    from piano_a2s_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    exp = load_experiment(args.hparams, args.overrides)
    if args.profile:
        exp.extras["profile"] = True
    os.makedirs(exp.output_folder, exist_ok=True)
    # Snapshot the resolved config into the run dir (reference: pretrain.py:263-267).
    exp.snapshot(exp.output_folder)

    if args.data_parallel:
        # torchrun semantics: batch_size is PER DEVICE (the reference runs
        # batch 4 per torchrun process, README.md:119-132); the global
        # batch scales with the mesh and stays mesh-divisible.
        import jax
        exp.batch_size = exp.batch_size * jax.device_count()

    import numpy as np
    n_train_versions = int(exp.extras.get("train_versions", 10))
    # extras `input_features: audio` reads raw clips (features/.../audio/)
    # and runs the log-VQT frontend on device inside the train/eval steps
    # — no offline spectrogram stage, ~6x less feature disk/IO.
    ds_kw = exp.dataset_kwargs()
    train_ds = SyntheticTrainDataset(
        exp.feature_folder, "train", versions=range(n_train_versions),
        rng=np.random.RandomState(exp.seed), **ds_kw)
    # 4 composer-EPR variants for 'epr', 1 for 'score'
    # (reference: pretrain.py:271-274)
    test_versions = range(4) if exp.midi_syn == "epr" else [0]
    valid_ds = SyntheticTestDataset(
        exp.feature_folder, "valid", versions=test_versions, **ds_kw)
    test_ds = SyntheticTestDataset(
        exp.feature_folder, "test", versions=test_versions, **ds_kw)

    trainer = Trainer(exp, use_mesh=args.data_parallel)
    # Multi-host: per-host sharded TRAIN loading — each process reads only
    # its shard's spectrograms (host IO scales with the local shard, not
    # the global batch). Eval loaders stay fully replicated: WER/F1 and
    # the per-clip result JSONs need every clip's targets on the host.
    import jax
    shard = ((jax.process_index(), jax.process_count())
             if args.data_parallel and jax.process_count() > 1 else None)
    trainer.fit(
        DataLoader(train_ds, exp.batch_size, shuffle=True, seed=exp.seed,
                   shard=shard),
        DataLoader(valid_ds, exp.batch_size))
    stats = trainer.evaluate(DataLoader(test_ds, exp.batch_size),
                             min_key="WER")
    print({k: round(v, 4) for k, v in stats.items()})


if __name__ == "__main__":
    sys.exit(main())
