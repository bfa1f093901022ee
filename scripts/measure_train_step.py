#!/usr/bin/env python3
"""Measure full-size train-step throughput on the attached accelerator."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from piano_a2s_tpu.models import ModelConfig, init_params, init_state  # noqa: E402
from piano_a2s_tpu.train.step import make_jitted_steps, make_optimizer  # noqa: E402


def main():
    cfg = ModelConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = init_state(cfg)
    opt = make_optimizer(lr=1.0)
    opt_state = opt.init(params)
    t_step, _ = make_jitted_steps(opt, cfg, mesh=None)
    rng = np.random.RandomState(0)
    for b in (4, 16):
        batch = {
            "spectrogram": jnp.asarray(
                rng.randn(b, 1, 1201, 480).astype(np.float32)),
            "time_sig": jnp.asarray(rng.randint(0, 7, (b, 5))),
            "key": jnp.asarray(rng.randint(0, 14, (b, 5))),
            "upper": jnp.asarray(rng.randint(0, 140, (b, 5, 398))),
            "upper_lengths": jnp.asarray(rng.randint(3, 60, (b, 5))),
            "lower": jnp.asarray(rng.randint(0, 140, (b, 5, 189))),
            "lower_lengths": jnp.asarray(rng.randint(3, 40, (b, 5))),
        }
        p, o, s = params, opt_state, state
        t0 = time.time()
        p, o, s, out = t_step(p, o, s, batch, jax.random.PRNGKey(0), 0.7)
        loss = float(jax.device_get(out.loss))
        print(f"B={b}: compile+first step {time.time()-t0:.1f}s "
              f"loss={loss:.3f}", flush=True)
        n = 5
        t0 = time.time()
        for i in range(n):
            p, o, s, out = t_step(p, o, s, batch, jax.random.PRNGKey(i),
                                  0.7)
            loss = float(jax.device_get(out.loss))
        dt = (time.time() - t0) / n
        print(f"B={b}: steady {dt*1e3:.0f}ms/step -> "
              f"{b/dt:.2f} clips/s training throughput, loss={loss:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
