#!/usr/bin/env python3
"""Interleaved A/B: compact (uint8/int16) vs int32 device->host outputs.

The serving stream's download per 64-batch is ~7.5 MB of int32 token ids
(vocab 173 fits in uint8); transfers do not overlap compute on this
platform (docs/DESIGN.md §2a), so download bytes sit on the critical
path. This measures the shipped compact payload against a variant that
restores the old int32 returns, round-robin in one process so tunnel
drift cannot invert the ordering.

Usage: python scripts/ab_download_dtype.py [rounds=4]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import numpy as np  # noqa: E402

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))


def build(variant: str):
    import jax
    import jax.numpy as jnp
    from piano_a2s_tpu.infer import Transcriber
    from piano_a2s_tpu.models import ModelConfig, init_params, init_state
    from piano_a2s_tpu.models.score_transcription import forward
    from piano_a2s_tpu.ops.vqt import get_vqt
    from piano_a2s_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    cfg = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = init_state(cfg)
    tr = Transcriber(params, state, cfg)
    if variant == "int32":
        # Restore the pre-change device return (full-width int32) on the
        # same Transcriber, same fused VQT+model program structure.
        def infer(params, state, spec_batch):
            (ts, key, up, low, aux), _ = forward(
                params, state, spec_batch, jax.random.PRNGKey(0), cfg=cfg,
                train=False, decode_chunk="auto")
            return (jnp.argmax(ts, -1), jnp.argmax(key, -1),
                    aux["upper_tokens"], aux["lower_tokens"],
                    aux["upper_lengths"], aux["lower_lengths"])

        def infer_audio(params, state, audio_batch):
            if audio_batch.dtype == jnp.int16:
                audio_batch = audio_batch.astype(jnp.float32) / 32768.0
            spec = get_vqt(audio_batch, tr.kernels, tr.vqt_cfg)
            t = spec.shape[1]
            if t >= tr.max_frame_num:
                spec = spec[:, : tr.max_frame_num]
            else:
                spec = jnp.pad(
                    spec, ((0, 0), (0, tr.max_frame_num - t), (0, 0)))
            return infer(params, state, spec[:, None, :, :])

        tr._infer_audio = jax.jit(infer_audio)
    rng = np.random.RandomState(0)
    clips = [(0.2 * rng.randn(12 * 16000)).astype(np.float32)
             for _ in range(ITERS * BATCH)]
    list(tr.transcribe_stream(clips[:BATCH], batch_size=BATCH, depth=0))
    return tr, clips


def timed(tr, clips) -> float:
    t0 = time.time()
    n = sum(1 for _ in tr.transcribe_stream(clips, batch_size=BATCH,
                                            depth=3))
    assert n == len(clips)
    return BATCH * ITERS / (time.time() - t0)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    variants = {name: build(name) for name in ("compact", "int32")}
    best = {name: 0.0 for name in variants}
    for r in range(rounds):
        for name, (tr, clips) in variants.items():
            v = timed(tr, clips)
            best[name] = max(best[name], v)
            print(f"round {r}: {name:8s} {v:7.2f} clips/s", flush=True)
    print({k: round(v, 2) for k, v in best.items()})


if __name__ == "__main__":
    main()
