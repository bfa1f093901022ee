"""Finetune on real recordings (ASAP).

Usage: python finetune.py configs/finetune.yaml [key=value ...]

Warm-starts from the pretrained checkpoints by importing them with their
WER meta reset to 100 so a new best can register (the reference's cp -r +
CKPT.yaml rewrite; reference: finetune.py:250-258). Teacher forcing is fixed
at 0.6 (decay 1.0 in the config).
"""

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("hparams")
    parser.add_argument("overrides", nargs="*")
    parser.add_argument("--data-parallel", action="store_true")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() so the "
                             "mesh spans all hosts (DCN between hosts); "
                             "the reference's torchrun finetune analog "
                             "(reference: README.md:129-132)")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. 'cpu'; the TPU "
                             "plugin ignores the JAX_PLATFORMS env var)")
    args = parser.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        from piano_a2s_tpu.parallel import distributed_init
        distributed_init()

    from piano_a2s_tpu.config import load_experiment
    from piano_a2s_tpu.data import ASAPDataset, DataLoader
    from piano_a2s_tpu.train.harness import Trainer
    from piano_a2s_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    exp = load_experiment(args.hparams, args.overrides)
    os.makedirs(exp.output_folder, exist_ok=True)
    # Snapshot the resolved config into the run dir (reference: pretrain.py:263-267).
    exp.snapshot(exp.output_folder)

    if args.data_parallel:
        import jax
        exp.batch_size = exp.batch_size * jax.device_count()

    trainer = Trainer(exp, use_mesh=args.data_parallel)
    pretrained_save = os.path.join(exp.pretrained_output_folder, "save")
    # Multi-host: the warm-start decision AND the copy both happen on
    # process 0 only — non-main hosts must not inspect the save dir at all
    # (latest_path() during process 0's import_from rmtree/copytree could
    # see a partially copied CKPT dir); the barrier makes the import
    # visible before any host's try_resume.
    if trainer.is_main_process and not trainer.checkpointer.latest_path():
        if os.path.isdir(pretrained_save):
            trainer.checkpointer.import_from(
                pretrained_save, reset_meta={"WER": 100},
                reset_host_state={"epoch": 0, "global_step": 0})
        else:
            print(f"WARNING: no pretrained checkpoints at "
                  f"{pretrained_save!r} — finetuning from RANDOM weights")
    trainer.barrier("finetune:after-warmstart-import")

    # extras `input_features: audio` = on-device-VQT training from raw
    # clips (see pretrain.py; prepare_data's asap pass writes audio/).
    ds_kw = exp.dataset_kwargs()
    train_ds = ASAPDataset(exp.feature_folder, "train", **ds_kw)
    # valid == test in the reference finetune setup (finetune.py:261-263)
    test_ds = ASAPDataset(exp.feature_folder, "test", **ds_kw)

    # Per-host sharded train loading in multi-host runs (see pretrain.py).
    import jax
    shard = ((jax.process_index(), jax.process_count())
             if args.data_parallel and jax.process_count() > 1 else None)
    trainer.fit(
        DataLoader(train_ds, exp.batch_size, shuffle=True, seed=exp.seed,
                   shard=shard),
        DataLoader(test_ds, exp.batch_size))
    stats = trainer.evaluate(DataLoader(test_ds, exp.batch_size),
                             min_key="WER")
    print({k: round(v, 4) for k, v in stats.items()})


if __name__ == "__main__":
    sys.exit(main())
