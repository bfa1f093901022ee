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


def to_torch_state_dict(params, state, cfg: ModelConfig = ModelConfig()):
    """JAX params/state -> reference ``ScoreTranscription.state_dict()``.

    Exact inverse of :func:`from_torch_state_dict` (every layout permutation
    reversed), so checkpoints trained in this framework can be exported back
    into the PyTorch reference ecosystem (reference model: models.py) and
    loaded with ``tm.load_state_dict(sd)`` strictly.  BatchNorm
    ``num_batches_tracked`` counters — which carry no information the
    momentum-updated running stats don't — are emitted as 0.
    """
    import torch

    def t(x):
        return torch.from_numpy(np.array(x))  # copy: jax buffers are read-only

    sd: Dict[str, Any] = {}

    def put_linear(name, p):
        sd[f"{name}.weight"] = t(p["w"]).T.contiguous()
        if "b" in p:
            sd[f"{name}.bias"] = t(p["b"])

    def put_gru_dir(name, p, layer, reverse=False):
        sfx = f"l{layer}" + ("_reverse" if reverse else "")
        sd[f"{name}.weight_ih_{sfx}"] = t(p["w_ih"]).T.contiguous()
        sd[f"{name}.weight_hh_{sfx}"] = t(p["w_hh"]).T.contiguous()
        sd[f"{name}.bias_ih_{sfx}"] = t(p["b_ih"])
        sd[f"{name}.bias_hh_{sfx}"] = t(p["b_hh"])

    def put_attention(name, p):
        w_query = t(p["w_query"]).T  # (H, 2H)
        w_enc = t(p["w_enc"]).T      # (H, 2H)
        sd[f"{name}.attn.weight"] = torch.cat([w_query, w_enc],
                                              dim=1).contiguous()
        sd[f"{name}.attn.bias"] = t(p["b"])
        sd[f"{name}.v.weight"] = t(p["v"])[None, :].contiguous()

    def put_bn(name, p, s):
        sd[f"{name}.weight"] = t(p["scale"])
        sd[f"{name}.bias"] = t(p["bias"])
        sd[f"{name}.running_mean"] = t(s["mean"])
        sd[f"{name}.running_var"] = t(s["var"])
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0,
                                                         dtype=torch.int64)

    def put_note_decoder(name, p):
        sd[f"{name}.embedding.weight"] = t(p["emb"]["emb"])
        put_attention(f"{name}.attn", p["attn"])
        put_gru_dir(f"{name}.gru", p["gru"], 0)
        put_linear(f"{name}.out", p["out"])

    cs, cstate = params["convstack"], state["convstack"]
    for i in (1, 2, 3, 4):
        w = t(cs[f"conv{i}"]["w"])  # HWIO
        sd[f"convstack.conv{i}.weight"] = w.permute(3, 2, 0, 1).contiguous()
        put_bn(f"convstack.bn{i}", cs[f"bn{i}"], cstate[f"bn{i}"])
    # Invert the flatten-order permutation (see from_torch_state_dict):
    # ours is (F*C, out) flattened f*C + c; torch wants (out, C*F), c*F + f.
    w_out = t(cs["out"]["w"]).T  # (out, F*C)
    out_ch = w_out.shape[0]
    w_out = w_out.reshape(out_ch, cfg.freq_bins, 40)
    sd["convstack.out.weight"] = (
        w_out.permute(0, 2, 1).reshape(out_ch, -1).contiguous())
    put_bn("convstack.out_bn", cs["out_bn"], cstate["out_bn"])

    enc = params["encoder"]
    put_gru_dir("encoder.gru", enc["l0_fwd"], 0)
    put_gru_dir("encoder.gru", enc["l0_bwd"], 0, reverse=True)
    put_gru_dir("encoder.gru", enc["l1_fwd"], 1)
    put_gru_dir("encoder.gru", enc["l1_bwd"], 1, reverse=True)
    put_linear("encoder.fc", enc["fc"])

    dec = params["decoder"]
    sd["decoder.note_emb.weight"] = t(dec["note_emb"]["emb"])
    sd["decoder.time_sig_emb.weight"] = t(dec["time_sig_emb"]["emb"])
    sd["decoder.key_emb.weight"] = t(dec["key_emb"]["emb"])
    put_gru_dir("decoder.staff_emb", dec["staff_fwd"], 0)
    put_gru_dir("decoder.staff_emb", dec["staff_bwd"], 0, reverse=True)
    put_attention("decoder.attn", dec["attn"])
    put_gru_dir("decoder.gru", dec["gru"], 0)
    for head, tname in (("time_head", "decoder.time_sig_out"),
                        ("key_head", "decoder.key_out")):
        for li, ti in (("l1", 0), ("l2", 2), ("l3", 4)):
            put_linear(f"{tname}.{ti}", dec[head][li])
    put_note_decoder("decoder.upper_decoder", dec["upper"])
    put_note_decoder("decoder.lower_decoder", dec["lower"])
    return sd


def load_torch_checkpoint(path: str, cfg: ModelConfig = ModelConfig()):
    """Load a torch .ckpt/.pt file (CPU) and convert."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return from_torch_state_dict(sd, cfg)
