"""piano_a2s_tpu — a TPU-native (JAX/XLA/Pallas) piano audio-to-score framework.

Re-implements the full capability surface of wei-zeng98/piano-a2s
(reference mounted at /root/reference) with a TPU-first design:

- ``symbolic``: Kern/Humdrum parsing, tokenization, score export (host).
- ``ops``: TPU compute primitives — VQT frontend, GRU scans, attention.
- ``models``: the ScoreTranscription model family (encoder + hierarchical
  autoregressive decoder) as pure-functional JAX.
- ``data``: dataset loaders and offline synthesis pipelines.
- ``train``: training/eval harness (losses, schedulers, checkpointing,
  metrics, logging) replacing the reference's SpeechBrain dependency.
- ``parallel``: device-mesh construction and sharded train/eval steps.
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml
