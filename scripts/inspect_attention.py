"""Attention diagnostics: is the decoder aligned, diffuse, or stuck?

The round-4 scale-run plateau (docs/DESIGN.md §11) was localized by
looking at the note-decoder attention directly: entropy near
ln(n_frames) and a non-advancing argmax mean the model is decoding from
its language model, not the audio — WER/loss alone cannot distinguish
that from "needs more steps". This tool ships that probe:

    python scripts/inspect_attention.py --checkpoint <save_dir> \
        --feature-folder <corpus> [--split train] [--config <yaml>] \
        [--clip N] [--bar N] [--platform cpu]

Prints, for one clip's bar: per-decode-step attention entropy, argmax
frame, the guided-attention expected center (when a duration table
applies), and teacher-forced token accuracy. Healthy aligned attention:
entropy well below uniform and argmax tracking the expected centers.
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def inspect_attention(trainer, batch, prep=None, bar: int = 0,
                      clip: int = 0, staff: str = "upper",
                      out=print):
    """Run conv+encoder and a teacher-forced note decode for one bar,
    capturing attention per step. `trainer` is a train.harness.Trainer
    with params loaded; `batch` a collated batch (see DataLoader).
    Returns a list of per-step dicts (entropy, argmax, expected)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    import piano_a2s_tpu.models.score_transcription as M
    from piano_a2s_tpu.ops import attention as A
    from piano_a2s_tpu.ops import gru as G
    from piano_a2s_tpu.ops import layers as L
    from piano_a2s_tpu.train.harness import _duration_fraction_table

    dev = trainer._device_batch(batch)
    if prep is not None:
        dev = prep(dev)
    params, state, cfg = trainer.params, trainer.state, trainer.cfg
    feat, _ = M.conv_stack_apply(params["convstack"], state["convstack"],
                                 dev["spectrogram"], train=False,
                                 rng=jax.random.PRNGKey(0))
    enc, h0 = M.encoder_apply(params["encoder"], feat)
    T_enc = enc.shape[1]
    dec = params["decoder"]

    # Bar-level GRU chain up to the requested bar (teacher-forced token).
    enc_proj_bar = A.precompute_enc_proj(dec["attn"], enc)
    B = enc.shape[0]
    sos_pair = jnp.tile(jnp.array([[cfg.sos, cfg.eos]], jnp.int32), (B, 1))
    staff0 = M._staff_summary(dec, sos_pair, jnp.full((B,), 2, jnp.int32))
    time0 = L.embed(dec["time_sig_emb"],
                    jnp.full((B,), cfg.num_time_sig, jnp.int32))
    key0 = L.embed(dec["key_emb"], jnp.full((B,), cfg.num_keys, jnp.int32))
    token = jnp.concatenate([staff0, staff0, time0, key0], axis=-1)
    hidden = h0
    gt_all = np.asarray(batch[staff])          # (B, bars, T)
    for j in range(bar + 1):
        ctx, _ = A.attention_step(dec["attn"], enc_proj_bar, enc, hidden)
        hidden = G.gru_step(dec["gru"],
                            jnp.concatenate([token, ctx], axis=-1), hidden)
        bar_h = hidden
        if j < bar:
            # Next-bar conditioning from GROUND TRUTH (tf=1 inspection).
            ts_t = jnp.asarray(batch["time_sig"])[:, j].astype(jnp.int32)
            key_t = jnp.asarray(batch["key"])[:, j].astype(jnp.int32)
            sums = []
            for s in ("upper", "lower"):
                toks = jnp.asarray(batch[s])[:, j].astype(jnp.int32)
                lens = jnp.asarray(batch[f"{s}_lengths"])[:, j].astype(
                    jnp.int32)
                sums.append(M._staff_summary(dec, toks, lens))
            token = jnp.concatenate(
                [sums[0], sums[1], L.embed(dec["time_sig_emb"], ts_t),
                 L.embed(dec["key_emb"], key_t)], axis=-1)

    sd = dec[staff]
    enc_proj = A.precompute_enc_proj(sd["attn"], enc)
    n_steps = int(batch[f"{staff}_lengths"][clip, bar])
    gt = gt_all[:, bar]

    dur_tab = _duration_fraction_table(cfg.vocab_size)
    # The auto dispatch matches training: chordal rows (newline event
    # separators) use the event-segmented map, legacy rows the token map.
    within = np.asarray(M.ga_within_bar_auto(
        jnp.asarray(gt[clip: clip + 1], jnp.int32), dur_tab, cfg.pad,
        cfg.newline))[0]
    content = np.asarray(dev["ga_content"])[clip] \
        if "ga_content" in dev else 1.0
    expected = ((bar + within) / cfg.max_bars * content * T_enc).astype(int)

    h = bar_h
    tok_prev = jnp.full((B,), cfg.sos, jnp.int32)
    rows = []
    correct = 0
    for t in range(n_steps):
        emb = L.embed(sd["emb"], tok_prev)
        ctx, w = A.attention_step(sd["attn"], enc_proj, enc, h)
        h = G.gru_step(sd["gru"], jnp.concatenate([emb, ctx], axis=-1), h)
        logits = L.linear(sd["out"],
                          jnp.concatenate([h, ctx], axis=-1))
        pred = int(jnp.argmax(logits[clip]))
        w0 = np.asarray(w[clip])
        rows.append({
            "step": t,
            "entropy": float(-(w0 * np.log(w0 + 1e-12)).sum()),
            "argmax_frame": int(w0.argmax()),
            "expected_frame": int(expected[t]),
            "gt": int(gt[clip, t]), "pred": pred,
        })
        correct += pred == int(gt[clip, t])
        tok_prev = jnp.asarray(gt[:, t], jnp.int32)  # teacher forcing
    uniform = float(np.log(T_enc))
    out(f"clip {clip} bar {bar} {staff}: {n_steps} steps, "
        f"tf accuracy {correct}/{n_steps}, uniform entropy {uniform:.2f}")
    out("step entropy argmax expected")
    for r in rows:
        out(f"{r['step']:4d} {r['entropy']:7.2f} {r['argmax_frame']:6d} "
            f"{r['expected_frame']:8d}")
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="save folder (orbax checkpoints)")
    ap.add_argument("--config", default=os.path.join(REPO, "configs",
                                                     "pretrain.yaml"))
    ap.add_argument("--feature-folder", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--versions", type=int, default=1)
    ap.add_argument("--clip", type=int, default=0)
    ap.add_argument("--bar", type=int, default=0)
    ap.add_argument("--staff", default="upper", choices=["upper", "lower"])
    ap.add_argument("--platform", default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from piano_a2s_tpu.config import load_experiment
    from piano_a2s_tpu.data import DataLoader, SyntheticTrainDataset
    from piano_a2s_tpu.train.harness import Trainer

    overrides = [f"feature_folder={args.feature_folder}",
                 f"save_folder={args.checkpoint}"] + list(args.overrides)
    exp = load_experiment(args.config, overrides)
    trainer = Trainer(exp)
    if not trainer.try_resume():
        raise SystemExit(f"no checkpoint found under {args.checkpoint}")
    ds = SyntheticTrainDataset(
        exp.feature_folder, args.split, versions=range(args.versions),
        rng=np.random.RandomState(exp.seed), **exp.dataset_kwargs())
    batch = next(iter(DataLoader(ds, batch_size=max(args.clip + 1, 2),
                                 shuffle=False, seed=0)))
    batch, _ = trainer._bucketed(batch)
    prep = None
    if trainer.from_audio:
        from piano_a2s_tpu.train.step import make_audio_frontend
        prep = make_audio_frontend(exp.vqt_config(), exp.max_frame_num)
    inspect_attention(trainer, batch, prep=prep, bar=args.bar,
                      clip=args.clip, staff=args.staff)


if __name__ == "__main__":
    main()
