#!/usr/bin/env python3
"""Export a checkpoint trained here back into the PyTorch reference format.

Mirror of convert_reference_checkpoint.py: picks the best-WER (default)
or latest checkpoint from one of this framework's save folders, reverses
every layout permutation (models/convert.to_torch_state_dict), and writes
a ``CKPT+export-*`` directory containing ``model.ckpt`` (a torch.save of
the reference ``ScoreTranscription.state_dict()``; reference: models.py)
plus a ``CKPT.yaml`` carrying the WER/loss meta.

By default keys are bare (load with
``ScoreTranscription().load_state_dict(torch.load(...))``). Pass
``--modulelist`` to prefix every key with ``0.`` — the layout the
reference's SpeechBrain checkpointer writes, because it wraps the model
in ``torch.nn.ModuleList([transcription])`` (reference:
hparams/pretrain.yaml model/checkpointer blocks). Note a full recoverer
CKPT dir also wants scheduler/normalizer/counter files this framework
does not produce; load the model weights explicitly on the reference
side rather than relying on its auto-recovery.

Usage:
  python scripts/export_reference_checkpoint.py SAVE_FOLDER \
      [--config configs/pretrain.yaml] [--out DIR] [--latest] \
      [--modulelist]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(
        description="Export a framework checkpoint to the torch reference "
                    "format")
    ap.add_argument("save_folder",
                    help="this framework's checkpoints dir (Trainer "
                         "save_folder)")
    ap.add_argument("--config", default="configs/pretrain.yaml",
                    help="experiment yaml fixing the model shape")
    ap.add_argument("--out", default=None,
                    help="output directory (default: "
                         "<save_folder>/CKPT+export-<unixtime>)")
    ap.add_argument("--latest", action="store_true",
                    help="export the most recent checkpoint instead of "
                         "the best-WER one")
    ap.add_argument("--modulelist", action="store_true",
                    help="prefix keys with '0.' (the reference "
                         "checkpointer's ModuleList layout) instead of "
                         "bare ScoreTranscription keys")
    args = ap.parse_args()

    # Export is pure host work; never touch the TPU tunnel.
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from piano_a2s_tpu.config import load_experiment
    from piano_a2s_tpu.models import init_params, init_state
    from piano_a2s_tpu.models.convert import to_torch_state_dict
    from piano_a2s_tpu.train.checkpoint import Checkpointer

    exp = load_experiment(args.config)
    cfg = exp.model_config()

    ckptr = Checkpointer(args.save_folder)
    path = ckptr.latest_path() if args.latest else ckptr.best_path()
    if path is None:
        sys.exit(f"no checkpoints under {args.save_folder}")
    templates = {"params": init_params(jax.random.PRNGKey(0), cfg),
                 "state": init_state(cfg)}
    trees, _, meta = ckptr.load(path, templates)
    print(f"exporting {path} (WER={meta.get('WER')})")

    sd = to_torch_state_dict(trees["params"], trees["state"], cfg)
    if args.modulelist:
        sd = {f"0.{k}": v for k, v in sd.items()}

    out = args.out or os.path.join(args.save_folder,
                                   f"CKPT+export-{int(time.time())}")
    os.makedirs(out, exist_ok=True)
    torch.save(sd, os.path.join(out, "model.ckpt"))
    with open(os.path.join(out, "CKPT.yaml"), "w") as f:
        f.write(f"WER: {float(meta.get('WER', 100.0))}\n")
        f.write(f"loss: {float(meta.get('loss', -1.0))}\n")
        f.write(f"unixtime: {time.time()}\n")
        f.write(f"exported_from: {path}\n")
    how = ("the reference checkpointer's ModuleList layout ('0.'-prefixed)"
           if args.modulelist else
           "ScoreTranscription().load_state_dict(torch.load(...))")
    print(f"wrote {out}/model.ckpt (+ CKPT.yaml); key layout: {how}")


if __name__ == "__main__":
    main()
