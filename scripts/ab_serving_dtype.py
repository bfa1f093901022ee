#!/usr/bin/env python3
"""Dedicated long interleaved A/B: f32 vs bf16 full-length serving.

Settles the decode_dtype ordering question (VERDICT r04 weak #2): the
round-robin alternates f32 and bf16 every ~6 s, so any tunnel-drift dip
spans many cycles and cannot invert the ordering the way it could in a
sequential sweep (r04's driver bench showed bf16 41.9 < f32 55.1 while
same-day interleaved runs showed them within 1.5%). Every round of BOTH
variants is recorded with its timestamp; the f32 rounds double as canary
drift samples, and the per-cycle bf16/f32 ratio cancels drift entirely
(adjacent measurements see the same tunnel phase).

Output: one JSON with the full per-round trace, the per-cycle ratio
series, and the verdict (median ratio +/- IQR). Publish in DESIGN §12c.

Usage: python scripts/ab_serving_dtype.py [rounds]   (default 20)
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

BATCH = int(os.environ.get("BENCH_BATCH", "64"))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    import jax.numpy as jnp
    from bench import _ServeVariant

    t_build = time.time()
    variants = {
        "f32_full_length": _ServeVariant(),
        "bf16_full_length": _ServeVariant(decode_dtype=jnp.bfloat16),
    }
    build_s = time.time() - t_build

    trace = {name: [] for name in variants}  # (t_rel, clips/s)
    t0 = time.time()
    for _ in range(rounds):
        for name, v in variants.items():
            ts = time.time()
            val = BATCH / v.timed_loop()
            trace[name].append((round((ts + time.time()) / 2 - t0, 1),
                                round(val, 2)))

    ratios = sorted(b / f for (_, f), (_, b)
                    in zip(trace["f32_full_length"],
                           trace["bf16_full_length"]))
    n = len(ratios)
    med = ratios[n // 2]
    iqr = (ratios[n // 4], ratios[(3 * n) // 4])
    f32_vals = sorted(v for _, v in trace["f32_full_length"])
    bf16_vals = sorted(v for _, v in trace["bf16_full_length"])
    print(json.dumps({
        "batch": BATCH,
        "rounds": rounds,
        "build_s": round(build_s, 1),
        "trace": trace,
        "per_cycle_ratio_bf16_over_f32": [round(r, 4) for r in ratios],
        "ratio_median": round(med, 4),
        "ratio_iqr": [round(iqr[0], 4), round(iqr[1], 4)],
        "f32_median": round(f32_vals[len(f32_vals) // 2], 2),
        "bf16_median": round(bf16_vals[len(bf16_vals) // 2], 2),
        "verdict": ("bf16 faster" if med > 1.02 else
                    "f32 faster" if med < 0.98 else
                    "parity (within 2%)"),
    }))


if __name__ == "__main__":
    main()
