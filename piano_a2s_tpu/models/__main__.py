"""Module self-test, the reference's ``python models.py`` equivalent
(reference: models.py:588-602 — random-input forward + parameter count).

    python -m piano_a2s_tpu.models [--full]

Default runs a reduced-size forward on CPU in seconds; --full uses the
production configuration (1201x480 input, 5 bars x (398,189)).
"""

import sys

import numpy as np

import jax

from . import ModelConfig, forward, init_params, init_state


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if "--full" in argv:
        cfg = ModelConfig()
        frames = 1201
    else:
        jax.config.update("jax_platforms", "cpu")
        cfg = ModelConfig(freq_bins=24, conv_feature_size=24,
                          hidden_size=24, max_bars=2, max_length=(10, 8),
                          note_emb_size=8, staff_emb_size=8)
        frames = 40

    params = init_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"config: {cfg}")
    print(f"parameters: {n_params:,}")

    state = init_state(cfg)
    spec = np.random.RandomState(0).randn(
        1, 1, frames, cfg.freq_bins).astype(np.float32)
    (ts, key, up, low, aux), _ = jax.jit(
        lambda p, s, x: forward(p, s, x, jax.random.PRNGKey(0), cfg=cfg,
                                train=False))(params, state, spec)
    print(f"time_sig: {ts.shape}  key: {key.shape}")
    print(f"upper log-probs: {up.shape}  lower log-probs: {low.shape}")
    print(f"upper tokens: {aux['upper_tokens'].shape}  "
          f"lengths: {np.asarray(aux['upper_lengths'])[0]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
