"""Model family: ScoreTranscription (CNN + BiGRU encoder, hierarchical
autoregressive GRU decoder with additive attention)."""

from .score_transcription import (  # noqa: F401
    ModelConfig, init_params, init_state, forward, forward_infer,
)
