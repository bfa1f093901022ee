#!/usr/bin/env python3
"""HBM roofline for the serving decode loop (DESIGN §8a).

The full-length greedy decode is a sequential while_loop
(models/score_transcription.py note_decoder_dual_infer): every one of the
~5*max(T_up,T_low) steps must re-read the attention-ready encoder
projection, the encoder output, and the decoder weights from HBM — no
reuse across steps is possible because step t+1 depends on step t's
argmax. This script states the byte model per step, multiplies it out
per clip, and divides the chip's HBM bandwidth by it: the resulting
clips/s is the hard memory-bound ceiling for this workload on this chip,
independent of any compute optimization. Compare against the measured
serving numbers (bench.py / scripts/ab_serving_dtype.py) to see what
fraction of the bound the shipped loop achieves and where the rest goes
(fixed per-step dispatch/latency floor — visible as bf16 failing to run
2x faster than f32 despite exactly half the bytes).

Usage: python scripts/roofline.py [batch] [measured_f32] [measured_bf16]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e (TPU v5 lite): 16 GB HBM2 @ 819 GB/s per chip (public spec,
# cloud.google.com/tpu/docs/v5e).
HBM_GBPS = 819e9


def decode_bytes_per_step(B: int, itemsize: int) -> dict:
    """HBM bytes read/written per while_loop step (fast_step body)."""
    from piano_a2s_tpu.models import ModelConfig
    cfg = ModelConfig()
    T_enc = 1201                         # encoder frames (12 s * 100 + 1)
    H = cfg.hidden_size                  # 256
    H2 = 2 * H                           # decoder GRU width 512
    V = cfg.vocab_size                   # 173
    E = cfg.note_emb_size                # 16
    S = 2                                # staves, fused in one step
    n_gates = 3 * H2

    return {
        # energy = tanh(enc_proj2 + q): reads the precomputed attention
        # projection of the encoder output, (S, B, T_enc, H).
        "enc_proj_read": S * B * T_enc * H * itemsize,
        # ctx = weights @ enc: reads the encoder output (B, T_enc, H2)
        # once per staff (same array, two einsums -> may or may not be
        # deduplicated by XLA; count once per staff as upper bound...
        # XLA fuses both contractions over one read in practice, so
        # count it ONCE -- the lower bound consistent with profiles).
        "enc_read": B * T_enc * H2 * itemsize,
        # attention scores/weights, (S, B, T_enc) twice (write + read).
        "attn_weights": 2 * S * B * T_enc * itemsize,
        # weights re-read every step (batch-independent):
        # fused recurrent+query (S, H2, 3H2+H), context-side input
        # projection (S, H2, 3H2), output head (S, H2+H2, V).
        "w_recurrent_query": S * H2 * (n_gates + H) * itemsize,
        "w_ih_ctx": S * H2 * n_gates * itemsize,
        "w_out": S * (H2 + H2) * V * itemsize,
        # folded embedding table (S, V, 3H2) gather: only B rows read.
        "emb_rows": S * B * n_gates * itemsize,
        # per-step activation vectors (h, gates, ctx, out, logp write):
        # ~10 vectors of (S, B, H2) plus the (S, B, V) f32 logp buffer.
        "activations": 10 * S * B * H2 * itemsize + S * B * V * 4,
        "_note_E": E,  # unused in traffic; documents the folded tok path
    }


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    measured = [float(a) for a in sys.argv[2:4]]

    from piano_a2s_tpu.models import ModelConfig
    cfg = ModelConfig()
    steps_per_clip = cfg.max_bars * max(cfg.max_length)  # full-length

    out = {"batch": B, "steps_per_clip": steps_per_clip,
           "hbm_gbps": HBM_GBPS / 1e9}
    for name, itemsize in (("f32", 4), ("bf16", 2)):
        parts = decode_bytes_per_step(B, itemsize)
        per_step = sum(v for k, v in parts.items() if not k.startswith("_"))
        per_clip = per_step * steps_per_clip / B
        bound = HBM_GBPS / per_clip
        step_floor_us = per_step / HBM_GBPS * 1e6
        out[name] = {
            "bytes_per_step_MB": round(per_step / 1e6, 1),
            "terms_MB": {
                k: round(v / 1e6, 2) for k, v in parts.items()
                if not k.startswith("_")},
            "bytes_per_clip_GB": round(per_clip / 1e9, 2),
            "bw_bound_clips_per_sec": round(bound, 1),
            "bw_step_floor_us": round(step_floor_us, 0),
        }
    for name, m in zip(("f32", "bf16"), measured):
        step_us = B / m / steps_per_clip * 1e6
        out[name]["measured_clips_per_sec"] = m
        out[name]["measured_step_us"] = round(step_us, 0)
        out[name]["fraction_of_bw_bound"] = round(
            m / out[name]["bw_bound_clips_per_sec"], 3)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
