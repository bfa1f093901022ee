"""Loss functions — 4-way NLL sum with pad masking.

torch.nn.NLLLoss semantics (reference: pretrain.py:56-119,
hparams/pretrain.yaml:49-54): mean over non-ignored targets; the staff
losses ignore the <pad> index (147).
"""

from __future__ import annotations

import jax.numpy as jnp


def _weight_mask(mask: jnp.ndarray, sample_weight) -> jnp.ndarray:
    """Apply optional per-sample (leading-axis) weights to a mask."""
    if sample_weight is None:
        return mask
    w = jnp.asarray(sample_weight, mask.dtype)
    return mask * w.reshape(w.shape + (1,) * (mask.ndim - 1))


def nll(log_probs: jnp.ndarray, targets: jnp.ndarray,
        ignore_index: int | None = None,
        sample_weight=None) -> jnp.ndarray:
    """Negative log likelihood, mean over non-ignored targets.

    log_probs: (..., C); targets: (...) int. sample_weight (B,) weights
    whole batch items (0 excludes padding duplicates from the mean).
    """
    tgt = targets.astype(jnp.int32)
    picked = jnp.take_along_axis(log_probs, tgt[..., None],
                                 axis=-1)[..., 0]
    if ignore_index is None:
        mask = jnp.ones_like(picked)
    else:
        mask = (tgt != ignore_index).astype(log_probs.dtype)
    mask = _weight_mask(mask, sample_weight)
    total = jnp.sum(mask)
    return -jnp.sum(picked * mask) / jnp.maximum(total, 1.0)


def transcription_loss(outputs, batch, pad_index: int = 147,
                       sample_weight=None):
    """Total loss = time + key + upper + lower NLL (reference:
    pretrain.py:69-88). Returns (loss, components dict)."""
    ts_logp, key_logp, up_logp, low_logp = outputs[:4]
    w = sample_weight
    time_loss = nll(ts_logp, batch["time_sig"], sample_weight=w)
    key_loss = nll(key_logp, batch["key"], sample_weight=w)
    upper_loss = nll(up_logp, batch["upper"], ignore_index=pad_index,
                     sample_weight=w)
    lower_loss = nll(low_logp, batch["lower"], ignore_index=pad_index,
                     sample_weight=w)
    loss = time_loss + key_loss + upper_loss + lower_loss
    return loss, {"time_loss": time_loss, "key_loss": key_loss,
                  "upper_loss": upper_loss, "lower_loss": lower_loss}


def _masked_mean_neg(picked: jnp.ndarray, targets: jnp.ndarray,
                     pad_index: int, sample_weight=None) -> jnp.ndarray:
    mask = (targets.astype(jnp.int32) != pad_index).astype(picked.dtype)
    mask = _weight_mask(mask, sample_weight)
    total = jnp.maximum(jnp.sum(mask), 1.0)
    return -jnp.sum(picked * mask) / total


def transcription_loss_fused(outputs, batch, pad_index: int = 147,
                             sample_weight=None, ga_weight: float = 0.0):
    """Same loss from gt-picked log-probs (forward(emit_full=False)):
    upper/lower outputs are (B, bars, T) log-probs AT the target tokens,
    so the (B, bars, T, V) distributions never exist in HBM.

    ga_weight > 0 adds the guided-attention penalty (opt-in training aid;
    see models.note_decoder_dual_scan): mean per non-pad note step of the
    attention mass outside the diagonal guide, from the forward's
    aux["ga_num"] sums. OFF (0.0) by default — the reference has no such
    term and every parity surface keeps it off."""
    ts_logp, key_logp, up_picked, low_picked = outputs[:4]
    w = sample_weight
    time_loss = nll(ts_logp, batch["time_sig"], sample_weight=w)
    key_loss = nll(key_logp, batch["key"], sample_weight=w)
    upper_loss = _masked_mean_neg(up_picked, batch["upper"], pad_index, w)
    lower_loss = _masked_mean_neg(low_picked, batch["lower"], pad_index, w)
    loss = time_loss + key_loss + upper_loss + lower_loss
    comps = {"time_loss": time_loss, "key_loss": key_loss,
             "upper_loss": upper_loss, "lower_loss": lower_loss}
    if ga_weight:
        num = _ga_numerator(outputs, sample_weight, ga_weight)
        ga_loss = num / _ga_total(batch, pad_index, sample_weight)
        comps["ga_loss"] = ga_loss
        loss = loss + ga_loss
    return loss, comps


def _ga_numerator(outputs, sample_weight, ga_weight: float):
    """Weighted guided-attention penalty sum for one (micro)batch."""
    ga_num = outputs[4]["ga_num"]          # (B, bars, 2) step-penalty sums
    per_clip = jnp.sum(ga_num, axis=(1, 2))
    if sample_weight is not None:
        per_clip = per_clip * sample_weight
    return ga_weight * jnp.sum(per_clip)


def _ga_total(batch, pad_index: int, sample_weight):
    """Guide denominator: total non-pad note steps over BOTH staves —
    computable from targets alone (exact microbatch decomposition)."""
    def total(targets):
        mask = (targets.astype(jnp.int32) != pad_index).astype(jnp.float32)
        return jnp.sum(_weight_mask(mask, sample_weight))
    return jnp.maximum(total(batch["upper"]) + total(batch["lower"]), 1.0)


# --- gradient-accumulation decomposition ----------------------------------
#
# Each component loss is a masked MEAN: -sum(picked*mask) / sum(mask).
# The denominators depend only on the targets/sample weights, never on the
# parameters, so the full-batch loss decomposes exactly over microbatches:
#     loss = sum_c ( sum_m numerator_c(micro_m) ) / total_c(full batch)
# Microbatch steps therefore accumulate numerators (and their gradients);
# the division by the GLOBAL totals reproduces the full-batch loss and
# gradient exactly.


def fused_component_sums(outputs, batch, pad_index: int = 147,
                         sample_weight=None, ga_weight: float = 0.0):
    """Per-component NLL numerators (-sum picked*mask) for one microbatch,
    from the fused forward's gt-picked log-probs. ga_weight > 0 adds the
    guided-attention numerator (key "ga_loss")."""
    ts_logp, key_logp, up_picked, low_picked = outputs[:4]
    w = sample_weight

    def pick_sum(log_probs, targets):
        tgt = targets.astype(jnp.int32)
        picked = jnp.take_along_axis(log_probs, tgt[..., None],
                                     axis=-1)[..., 0]
        mask = _weight_mask(jnp.ones_like(picked), w)
        return -jnp.sum(picked * mask)

    def masked_sum(picked, targets):
        mask = (targets.astype(jnp.int32) != pad_index).astype(picked.dtype)
        mask = _weight_mask(mask, w)
        return -jnp.sum(picked * mask)

    nums = {"time_loss": pick_sum(ts_logp, batch["time_sig"]),
            "key_loss": pick_sum(key_logp, batch["key"]),
            "upper_loss": masked_sum(up_picked, batch["upper"]),
            "lower_loss": masked_sum(low_picked, batch["lower"])}
    if ga_weight:
        nums["ga_loss"] = _ga_numerator(outputs, w, ga_weight)
    return nums


def component_totals(batch, pad_index: int = 147, sample_weight=None,
                     ga: bool = False):
    """Global mask totals (the mean denominators), computed from targets
    alone — no forward pass needed. ga=True adds the guided-attention
    denominator (matching fused_component_sums(ga_weight>0))."""
    w = sample_weight

    def total(mask):
        mask = _weight_mask(mask, w)
        return jnp.maximum(jnp.sum(mask), 1.0)

    ones_bars = jnp.ones(batch["time_sig"].shape, jnp.float32)
    totals = {
        "time_loss": total(ones_bars),
        "key_loss": total(ones_bars),
        "upper_loss": total(
            (batch["upper"].astype(jnp.int32) != pad_index
             ).astype(jnp.float32)),
        "lower_loss": total(
            (batch["lower"].astype(jnp.int32) != pad_index
             ).astype(jnp.float32)),
    }
    if ga:
        totals["ga_loss"] = _ga_total(batch, pad_index, w)
    return totals
