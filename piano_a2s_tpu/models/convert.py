"""PyTorch reference checkpoint -> JAX params converter.

Maps the reference ScoreTranscription state_dict (reference: models.py) onto
this package's parameter pytree, permuting layouts (OIHW->HWIO convs,
transposed linears, split attention matrices, per-direction GRUs). Used by
the parity test-suite and to warm-start from reference checkpoints.

Accepts either a bare ``ScoreTranscription.state_dict()`` or a SpeechBrain
ModuleList checkpoint (keys prefixed ``0.``).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp

from .score_transcription import ModelConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _strip_prefix(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if k.startswith("0."):
            k = k[2:]
        out[k] = _np(v)
    return out


def _linear(sd, name, bias=True):
    p = {"w": jnp.asarray(sd[f"{name}.weight"].T)}
    if bias and f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _gru_dir(sd, name, layer, reverse=False):
    sfx = f"l{layer}" + ("_reverse" if reverse else "")
    return {
        "w_ih": jnp.asarray(sd[f"{name}.weight_ih_{sfx}"].T),
        "w_hh": jnp.asarray(sd[f"{name}.weight_hh_{sfx}"].T),
        "b_ih": jnp.asarray(sd[f"{name}.bias_ih_{sfx}"]),
        "b_hh": jnp.asarray(sd[f"{name}.bias_hh_{sfx}"]),
    }


def _attention(sd, name, hidden):
    w = sd[f"{name}.attn.weight"]  # (H, 4H)
    return {
        "w_query": jnp.asarray(w[:, : 2 * hidden].T),
        "w_enc": jnp.asarray(w[:, 2 * hidden:].T),
        "b": jnp.asarray(sd[f"{name}.attn.bias"]),
        "v": jnp.asarray(sd[f"{name}.v.weight"][0]),
    }


def _bn(sd, name):
    return ({"scale": jnp.asarray(sd[f"{name}.weight"]),
             "bias": jnp.asarray(sd[f"{name}.bias"])},
            {"mean": jnp.asarray(sd[f"{name}.running_mean"]),
             "var": jnp.asarray(sd[f"{name}.running_var"])})


def _note_decoder(sd, name, cfg):
    return {
        "emb": {"emb": jnp.asarray(sd[f"{name}.embedding.weight"])},
        "attn": _attention(sd, f"{name}.attn", cfg.hidden_size),
        "gru": _gru_dir(sd, f"{name}.gru", 0),
        "out": _linear(sd, f"{name}.out"),
    }


def from_torch_state_dict(state_dict: Mapping[str, Any],
                          cfg: ModelConfig = ModelConfig()):
    """Returns (params, state) pytrees matching score_transcription."""
    sd = _strip_prefix(state_dict)
    h = cfg.hidden_size

    convstack: Dict[str, Any] = {}
    conv_state: Dict[str, Any] = {}
    for i in (1, 2, 3, 4):
        w = sd[f"convstack.conv{i}.weight"]  # OIHW
        convstack[f"conv{i}"] = {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}
        convstack[f"bn{i}"], conv_state[f"bn{i}"] = _bn(
            sd, f"convstack.bn{i}")
    # Flatten-order permutation: torch flattens (C, F) as c*F + f
    # (models.py:537); we flatten NHWC as f*C + c.
    w_out = sd["convstack.out.weight"]  # (out, C*F)
    out_ch = w_out.shape[0]
    w_out = w_out.reshape(out_ch, 40, cfg.freq_bins)
    w_out = w_out.transpose(0, 2, 1).reshape(out_ch, -1)
    convstack["out"] = {"w": jnp.asarray(w_out.T)}
    convstack["out_bn"], conv_state["out_bn"] = _bn(sd, "convstack.out_bn")

    encoder = {
        "l0_fwd": _gru_dir(sd, "encoder.gru", 0),
        "l0_bwd": _gru_dir(sd, "encoder.gru", 0, reverse=True),
        "l1_fwd": _gru_dir(sd, "encoder.gru", 1),
        "l1_bwd": _gru_dir(sd, "encoder.gru", 1, reverse=True),
        "fc": _linear(sd, "encoder.fc"),
    }

    decoder = {
        "note_emb": {"emb": jnp.asarray(sd["decoder.note_emb.weight"])},
        "time_sig_emb": {
            "emb": jnp.asarray(sd["decoder.time_sig_emb.weight"])},
        "key_emb": {"emb": jnp.asarray(sd["decoder.key_emb.weight"])},
        "staff_fwd": _gru_dir(sd, "decoder.staff_emb", 0),
        "staff_bwd": _gru_dir(sd, "decoder.staff_emb", 0, reverse=True),
        "attn": _attention(sd, "decoder.attn", h),
        "gru": _gru_dir(sd, "decoder.gru", 0),
        "time_head": {
            "l1": _linear(sd, "decoder.time_sig_out.0"),
            "l2": _linear(sd, "decoder.time_sig_out.2"),
            "l3": _linear(sd, "decoder.time_sig_out.4"),
        },
        "key_head": {
            "l1": _linear(sd, "decoder.key_out.0"),
            "l2": _linear(sd, "decoder.key_out.2"),
            "l3": _linear(sd, "decoder.key_out.4"),
        },
        "upper": _note_decoder(sd, "decoder.upper_decoder", cfg),
        "lower": _note_decoder(sd, "decoder.lower_decoder", cfg),
    }

    params = {"convstack": convstack, "encoder": encoder, "decoder": decoder}
    state = {"convstack": conv_state}
    return params, state


def load_torch_checkpoint(path: str, cfg: ModelConfig = ModelConfig()):
    """Load a torch .ckpt/.pt file (CPU) and convert."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return from_torch_state_dict(sd, cfg)
