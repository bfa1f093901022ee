#!/usr/bin/env python3
"""Import a PyTorch reference checkpoint into this framework's save format.

Migration entry point for users of wei-zeng98/piano-a2s: point it at the
reference's SpeechBrain save folder (<output_folder>/save with CKPT+*
subdirs; reference: hparams/pretrain.yaml:110-116, pretrain.py:185-187),
a single CKPT+* directory, or a bare model .ckpt file, and it writes a
checkpoint that Trainer.try_resume() / evaluate() here load directly —
so pretrained reference weights can be finetuned or served without
retraining.

Usage:
  python scripts/convert_reference_checkpoint.py SRC \
      [--config configs/pretrain.yaml] [--out <save_folder>] [--wer WER]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_ckpt_yaml(path):
    """SpeechBrain CKPT.yaml: flat `key: value` lines (WER, unixtime...)."""
    meta = {}
    if not os.path.exists(path):
        return meta
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            try:
                meta[k.strip()] = float(v.strip())
            except ValueError:
                meta[k.strip()] = v.strip()
    return meta


def _resolve(src):
    """-> (model_ckpt_path, ckpt_yaml_meta). Picks best-WER CKPT dir when
    given a whole save folder."""
    if os.path.isfile(src):
        return src, _read_ckpt_yaml(
            os.path.join(os.path.dirname(src), "CKPT.yaml"))
    if os.path.isfile(os.path.join(src, "model.ckpt")):
        return (os.path.join(src, "model.ckpt"),
                _read_ckpt_yaml(os.path.join(src, "CKPT.yaml")))
    ckpts = [os.path.join(src, d) for d in os.listdir(src)
             if d.startswith("CKPT") and
             os.path.isfile(os.path.join(src, d, "model.ckpt"))]
    if not ckpts:
        raise SystemExit(f"no model.ckpt found under {src}")
    wers = {c: _read_ckpt_yaml(os.path.join(c, "CKPT.yaml")).get("WER")
            for c in ckpts}
    if all(not isinstance(w, float) for w in wers.values()):
        # Make the arbitrary pick visible instead of silently pretending a
        # best-WER selection happened (CKPT.yaml absent or non-flat YAML).
        best = min(ckpts)
        print(f"WARNING: no parseable WER metadata in any CKPT.yaml under "
              f"{src}; using {os.path.basename(best)} (alphabetically "
              f"first of {len(ckpts)})")
    else:
        best = min(ckpts, key=lambda c: wers[c]
                   if isinstance(wers[c], float) else float("inf"))
    return (os.path.join(best, "model.ckpt"),
            _read_ckpt_yaml(os.path.join(best, "CKPT.yaml")))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="reference save folder, CKPT dir, or .ckpt")
    ap.add_argument("--config", default="configs/pretrain.yaml",
                    help="experiment YAML giving model dims + save_folder")
    ap.add_argument("--out", default=None,
                    help="destination save folder (default: the config's)")
    ap.add_argument("--wer", type=float, default=None,
                    help="override the WER recorded in the checkpoint meta "
                         "(default: CKPT.yaml's, else 100)")
    args = ap.parse_args()

    # Conversion is pure host work; run on the CPU platform so the tool
    # never touches (or waits minutes for) the single-client TPU tunnel.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from piano_a2s_tpu.config import load_experiment
    from piano_a2s_tpu.models.convert import load_torch_checkpoint
    from piano_a2s_tpu.train.checkpoint import Checkpointer
    from piano_a2s_tpu.train.step import make_optimizer

    exp = load_experiment(args.config)
    model_path, sb_meta = _resolve(args.src)
    print(f"converting {model_path}")
    params, state = load_torch_checkpoint(model_path, exp.model_config())

    optimizer = make_optimizer(lr=exp.lr,
                               rho=float(exp.extras.get("rho", 0.95)),
                               eps=float(exp.extras.get("eps", 1e-8)))
    opt_state = optimizer.init(params)

    wer = args.wer if args.wer is not None else sb_meta.get("WER", 100.0)
    out = args.out or exp.save_folder
    ckptr = Checkpointer(out)
    path = ckptr.save(
        {"params": params, "state": state, "opt_state": opt_state},
        meta={"WER": float(wer), "loss": float(sb_meta.get("loss", -1.0)),
              "imported_from": model_path},
        host_state={"epoch": 0, "global_step": 0})
    print(f"wrote {path} (WER={wer}); Trainer.try_resume()/evaluate() in "
          f"save_folder={out} will pick it up")


if __name__ == "__main__":
    main()
