"""ScoreTranscription model — TPU-native JAX implementation.

Architecture (numerically matching the PyTorch reference for converted
checkpoints; reference: models.py:14-543):

    spectrogram (B, 1, T=1201, F=480)
      -> ConvStack: 4x [3x3 conv + BN + ReLU] -> flatten freq -> Linear+BN
         -> (B, T, 256)                                (models.py:463-543)
      -> Encoder: 2-layer bidirectional GRU -> enc (B, T, 512),
         bridge hidden (B, 512)                        (models.py:53-82)
      -> HierarchicalDecoder: per-bar GRU + additive attention emitting a
         bar summary, two per-bar NoteDecoders (upper/lower staff) and
         time-/key-signature MLP heads               (models.py:84-438)

TPU-first design decisions (not translations):
  - Every recurrence is a `lax.scan`; the whole forward is ONE jitted XLA
    program (the reference leaks host<->device syncs each step).
  - Attention encoder projections are hoisted out of the ~2900 sequential
    decode steps (one MXU matmul per attention module per clip).
  - The reference's data-dependent early-exit note loop (models.py:388-419)
    is a fixed-length scan; its stopping/length semantics (stop when ALL
    batch items emitted EOS; length = last EOS before the stop step) are
    reproduced exactly with post-scan masks, which preserves losses and
    greedy-decode tokens (see tests/test_model_parity.py).
  - Parameters are plain pytrees; train/infer are pure functions.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import gru as G
from ..ops import attention as A
from ..ops import layers as L


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    in_channels: int = 1
    freq_bins: int = 480
    conv_feature_size: int = 256
    hidden_size: int = 256
    max_bars: int = 5
    num_time_sig: int = 7
    num_keys: int = 14
    max_length: Tuple[int, int] = (398, 189)
    note_emb_size: int = 16
    staff_emb_size: int = 32
    time_sig_emb_size: int = 5
    key_emb_size: int = 8
    vocab_size: int = 173
    sos: int = 145
    eos: int = 146
    pad: int = 147
    # Event separator (the '\n' token): real-pipeline targets separate
    # simultaneous EVENTS with it; chord notes within an event are joined
    # by '<b>' (reference: data_processing/humdrum.py:99-127). Drives the
    # chord-aware guided-attention dispatch (ga_within_bar_auto).
    newline: int = 143

    @property
    def bar_gru_in(self) -> int:
        return (self.staff_emb_size * 4 + self.time_sig_emb_size
                + self.key_emb_size + self.hidden_size * 2)

    @property
    def note_gru_in(self) -> int:
        return self.note_emb_size + self.hidden_size * 2


# ---------------------------------------------------------------------------
# Initialization (distribution-level parity with the reference's init:
# xavier/orthogonal where the reference re-inits, torch defaults elsewhere).
# ---------------------------------------------------------------------------

def _init_note_decoder(key, cfg: ModelConfig) -> Dict[str, Any]:
    k = jax.random.split(key, 4)
    h = cfg.hidden_size
    return {
        "emb": L.init_embedding_params(k[0], cfg.vocab_size,
                                       cfg.note_emb_size),
        "attn": A.init_attention_params(k[1], h),
        "gru": G.init_gru_params(k[2], cfg.note_gru_in, 2 * h, mode="piano"),
        "out": L.init_linear_params(k[3], 4 * h, cfg.vocab_size,
                                    mode="xavier"),
    }


def init_params(key, cfg: ModelConfig = ModelConfig()) -> Dict[str, Any]:
    kc, ke, kd = jax.random.split(key, 3)
    h = cfg.hidden_size
    f = cfg.conv_feature_size

    kcs = jax.random.split(kc, 5)
    convstack = {
        "conv1": L.init_conv_params(kcs[0], 3, 3, cfg.in_channels, 20),
        "conv2": L.init_conv_params(kcs[1], 3, 3, 20, 20),
        "conv3": L.init_conv_params(kcs[2], 3, 3, 20, 40),
        "conv4": L.init_conv_params(kcs[3], 3, 3, 40, 40),
        "bn1": L.init_bn_params(20), "bn2": L.init_bn_params(20),
        "bn3": L.init_bn_params(40), "bn4": L.init_bn_params(40),
        "out": L.init_linear_params(kcs[4], cfg.freq_bins * 40, f,
                                    bias=False, mode="xavier"),
        "out_bn": L.init_bn_params(f),
    }

    kes = jax.random.split(ke, 5)
    encoder = {
        # The reference's init_gru touches only weight_ih_l{i}/
        # weight_hh_l{i} (models.py:574-585) — the bidirectional
        # encoder's *_reverse parameters KEEP torch defaults, so the
        # backward directions init with mode="torch" here.
        "l0_fwd": G.init_gru_params(kes[0], f, h, mode="piano"),
        "l0_bwd": G.init_gru_params(kes[1], f, h, mode="torch"),
        "l1_fwd": G.init_gru_params(kes[2], 2 * h, h, mode="piano"),
        "l1_bwd": G.init_gru_params(kes[3], 2 * h, h, mode="torch"),
        "fc": L.init_linear_params(kes[4], 2 * h, h, mode="xavier"),
    }

    kds = jax.random.split(kd, 12)
    decoder = {
        "note_emb": L.init_embedding_params(kds[0], cfg.vocab_size,
                                            cfg.note_emb_size),
        "time_sig_emb": L.init_embedding_params(kds[1], cfg.num_time_sig + 1,
                                                cfg.time_sig_emb_size),
        "key_emb": L.init_embedding_params(kds[2], cfg.num_keys + 1,
                                           cfg.key_emb_size),
        # Staff summarizer keeps torch-default init (never re-initialized in
        # the reference; models.py:136-139 only re-inits the bar GRU).
        "staff_fwd": G.init_gru_params(kds[3], cfg.note_emb_size,
                                       cfg.staff_emb_size, mode="torch"),
        "staff_bwd": G.init_gru_params(kds[4], cfg.note_emb_size,
                                       cfg.staff_emb_size, mode="torch"),
        "attn": A.init_attention_params(kds[5], h),
        "gru": G.init_gru_params(kds[6], cfg.bar_gru_in, 2 * h, mode="piano"),
        "time_head": {
            "l1": L.init_linear_params(kds[7], 4 * h, 4 * h, mode="torch"),
            "l2": L.init_linear_params(kds[8], 4 * h, 2 * h, mode="torch"),
            "l3": L.init_linear_params(kds[9], 2 * h, cfg.num_time_sig,
                                       mode="torch"),
        },
        "key_head": {
            "l1": L.init_linear_params(jax.random.fold_in(kds[7], 1),
                                       4 * h, 4 * h, mode="torch"),
            "l2": L.init_linear_params(jax.random.fold_in(kds[8], 1),
                                       4 * h, 2 * h, mode="torch"),
            "l3": L.init_linear_params(jax.random.fold_in(kds[9], 1),
                                       2 * h, cfg.num_keys, mode="torch"),
        },
        "upper": _init_note_decoder(kds[10], cfg),
        "lower": _init_note_decoder(kds[11], cfg),
    }
    return {"convstack": convstack, "encoder": encoder, "decoder": decoder}


def init_state(cfg: ModelConfig = ModelConfig()) -> Dict[str, Any]:
    """Mutable (non-trained) state: BatchNorm running statistics."""
    return {"convstack": {
        "bn1": L.init_bn_state(20), "bn2": L.init_bn_state(20),
        "bn3": L.init_bn_state(40), "bn4": L.init_bn_state(40),
        "out_bn": L.init_bn_state(cfg.conv_feature_size),
    }}


# ---------------------------------------------------------------------------
# ConvStack + Encoder
# ---------------------------------------------------------------------------

def conv_stack_apply(params, state, x: jnp.ndarray, train: bool,
                     rng, compute_dtype=None, sample_weight=None
                     ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """x: (B, 1, T, F) -> (B, T, conv_feature_size). NHWC internally.

    sample_weight (train only; (B,) 0/1): masks the final batch's padding
    duplicates out of the BatchNorm batch statistics — see
    ops.layers.batch_norm. None (every parity/bench path) is unchanged.

    Inference folds each BatchNorm (running stats = a per-channel affine)
    into the preceding conv's weights / the flatten linear's weights:
    y = relu(conv(x, w*g) + (beta - mean*g)) with g = scale*rsqrt(var+eps).
    Exact algebraic rewrite; removes a full elementwise pass (and its XLA
    layout copy) over the ~GB conv activation tensors per layer.

    compute_dtype (train path only; e.g. jnp.bfloat16): mixed-precision
    conv training — conv/linear matmuls run in compute_dtype and the
    MATERIALIZED inter-layer activations (what autodiff saves for the
    conv weight gradients, ~1.9 GB/batch-element in f32) are stored in
    it, while BatchNorm statistics and normalization are computed in
    f32 (the up/down casts fuse into the surrounding elementwise ops, so
    no f32 activation tensor is materialized). Params stay f32; their
    gradients arrive through the cast and accumulate in f32. bf16 shares
    f32's exponent range, so no loss scaling is needed."""
    p, s = params, state
    y = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
    new_s = {}
    if not train:
        # Folding happens in >=f32 precision; the folded weights/bias are
        # then cast to the activation dtype (bf16 on the reduced-precision
        # serving path; f32/f64 pass through unchanged).
        dt = y.dtype
        fdt = jnp.promote_types(dt, jnp.float32)
        for i in (1, 2, 3, 4):
            bn_p, bn_s = p[f"bn{i}"], s[f"bn{i}"]
            g = (bn_p["scale"].astype(fdt)
                 * jax.lax.rsqrt(bn_s["var"].astype(fdt) + L.BN_EPS))
            w = p[f"conv{i}"]["w"].astype(fdt) * g
            bias = bn_p["bias"].astype(fdt) - bn_s["mean"].astype(fdt) * g
            y = jax.nn.relu(L.conv2d_same({"w": w.astype(dt)}, y)
                            + bias.astype(dt))
            new_s[f"bn{i}"] = bn_s
        b, t, f, c = y.shape
        y = y.reshape(b, t, f * c)
        bn_p, bn_s = p["out_bn"], s["out_bn"]
        g = (bn_p["scale"].astype(fdt)
             * jax.lax.rsqrt(bn_s["var"].astype(fdt) + L.BN_EPS))
        w = p["out"]["w"].astype(fdt) * g
        bias = bn_p["bias"].astype(fdt) - bn_s["mean"].astype(fdt) * g
        if p["out"].get("b") is not None:
            bias = bias + p["out"]["b"].astype(fdt) * g
        y = jax.nn.relu(y @ w.astype(dt) + bias.astype(dt))
        new_s["out_bn"] = bn_s
        return y, new_s
    if compute_dtype is not None:
        cast_p = lambda t: jax.tree.map(  # noqa: E731
            lambda a: a.astype(compute_dtype)
            if a.dtype == jnp.float32 else a, t)
        y = y.astype(compute_dtype)
    else:
        cast_p = lambda t: t  # noqa: E731
    fdt = jnp.promote_types(y.dtype, jnp.float32)

    def bn_f32(bn_p, bn_s, v, axes):
        # Statistics and normalization in >=f32; output back in the
        # activation dtype. The casts fuse with the adjacent elementwise
        # chain, so no full-resolution f32 tensor is materialized.
        out, ns = L.batch_norm(bn_p, bn_s, v.astype(fdt), axes=axes,
                               train=train, weight=sample_weight)
        return out.astype(v.dtype), ns

    for i, ch in zip((1, 2, 3, 4), (20, 20, 40, 40)):
        y = L.conv2d_same(cast_p(p[f"conv{i}"]), y)
        y, new_s[f"bn{i}"] = bn_f32(p[f"bn{i}"], s[f"bn{i}"], y,
                                    axes=(0, 1, 2))
        y = jax.nn.relu(y)
        del ch
    b, t, f, c = y.shape
    # Flatten freq x channel. NHWC order (f*c + c_idx); the checkpoint
    # converter permutes torch's (c*F + f) columns to match.
    y = y.reshape(b, t, f * c)
    y = L.linear(cast_p(p["out"]), y)
    y, new_s["out_bn"] = bn_f32(p["out_bn"], s["out_bn"], y, axes=(0, 1))
    y = jax.nn.relu(y)
    y = L.dropout(rng, y, 0.2, train)
    # Returned in the activation/compute dtype (like the eval path);
    # forward() owns the single promotion back to >=f32 for the encoder.
    return y, new_s


def encoder_apply(params, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (B, T, F_in) -> (enc (B, T, 2H), bridge hidden (B, 2H)).

    Each bidirectional layer runs as a single fused scan (both directions
    stacked) — see ops.gru.bidir_gru_layer."""
    xs = jnp.swapaxes(x, 0, 1)  # (T, B, F)
    B = xs.shape[1]
    h0 = jnp.zeros((B, params["fc"]["w"].shape[1]), xs.dtype)
    l0, h_l0f, h_l0b = G.bidir_gru_layer(params["l0_fwd"], params["l0_bwd"],
                                         xs, h0)
    l1, h_l1f, h_l1b = G.bidir_gru_layer(params["l1_fwd"], params["l1_bwd"],
                                         l0, h0)
    enc = jnp.swapaxes(l1, 0, 1)
    # Bridge (reference: models.py:77-82): per-layer tanh(fc([h_fwd; h_bwd]))
    # then concatenate the two layers.
    h1 = jnp.tanh(L.linear(params["fc"],
                           jnp.concatenate([h_l0f, h_l0b], axis=-1)))
    h2 = jnp.tanh(L.linear(params["fc"],
                           jnp.concatenate([h_l1f, h_l1b], axis=-1)))
    return enc, jnp.concatenate([h1, h2], axis=-1)


# ---------------------------------------------------------------------------
# Note-level decoder (fixed-length scan with reference stopping semantics)
# ---------------------------------------------------------------------------

def _note_lengths(signal: jnp.ndarray, max_steps: int) -> jnp.ndarray:
    """Reproduce the reference's per-item `lengths` bookkeeping
    (models.py:386-419) from a full-length EOS signal matrix.

    signal: (B, T) bool — EOS emitted/required at step t. The torch loop
    stops at T_stop = max_i(first_eos_i) + 1 and records, per item, the LAST
    EOS step before T_stop (+1), defaulting to max_steps if none.
    """
    T = signal.shape[1]
    any_eos = jnp.any(signal, axis=1)
    first = jnp.where(any_eos, jnp.argmax(signal, axis=1), T)
    t_stop = jnp.minimum(jnp.max(first) + 1, T)
    valid = signal & (jnp.arange(T)[None, :] < t_stop)
    any_valid = jnp.any(valid, axis=1)
    last = T - 1 - jnp.argmax(valid[:, ::-1], axis=1)
    return jnp.where(any_valid, last + 1, max_steps).astype(jnp.int32)


def _note_step(params, cfg: ModelConfig, enc, enc_proj, h, tok_emb,
               key, train: bool):
    """One decode step: dropout -> attention -> GRU -> output head.

    The decode loop is HBM-bandwidth-bound (enc + enc_proj + GRU weights
    re-read every one of ~398 sequential steps); if those arrays arrive as
    bfloat16 (see `decode_dtype`), the attention/GRU matmuls read half the
    bytes while logits are promoted back to f32 for a stable log-softmax
    and argmax."""
    tok = L.dropout(key, tok_emb, 0.1, train)
    context, weights = A.attention_step(params["attn"], enc_proj, enc, h)
    x = jnp.concatenate([tok, context], axis=-1)
    h = G.gru_step(params["gru"], x, h)
    out = L.linear(params["out"], jnp.concatenate([h, context], axis=-1))
    logp = jax.nn.log_softmax(
        out.astype(jnp.promote_types(out.dtype, jnp.float32)), axis=-1)
    pred = jnp.argmax(logp, axis=-1).astype(jnp.int32)
    return h, logp, pred, weights


def stack_staff_params(upper, lower):
    """Stack the (shape-identical) upper/lower decoder params on a leading
    axis so both staves decode in ONE scan (see note_decoder_dual_*)."""
    return jax.tree.map(lambda a, b: jnp.stack([a, b]), upper, lower)


def _dual_step(dual_params, cfg: ModelConfig, enc, enc_proj2, h2, tok2,
               keys2, train: bool):
    """One decode step for BOTH staves, vmapped over the leading axis.

    TPU-first: the reference decodes the upper staff's 398 steps then the
    lower's 189 sequentially (models.py:260-275); stacking them runs one
    398-step chain instead of 587 and doubles the per-step matmul rows.
    """
    def step(params, enc_proj, h, tok, key):
        return _note_step(params, cfg, enc, enc_proj, h, tok, key, train)

    return jax.vmap(step, in_axes=(0, 0, 0, 0, 0))(
        dual_params, enc_proj2, h2, tok2, keys2)


def _dual_embed(dual_params, ids2: jnp.ndarray) -> jnp.ndarray:
    """Per-staff embedding lookup: ids2 (2, B) -> (2, B, E)."""
    return jax.vmap(lambda emb, ids: jnp.take(emb, ids, axis=0))(
        dual_params["emb"]["emb"], ids2)


def ga_within_bar(gt: jnp.ndarray, dur_frac, pad: int) -> jnp.ndarray:
    """Within-bar time fraction per token for the guided-attention guide.

    gt: (..., T) token ids; dur_frac: (vocab,) whole-note fraction per
    DURATION token id (0 elsewhere). Every token of note k expects note
    k's MIDPOINT: duration tokens sit at cumsum - dur/2 directly;
    pitch/separator tokens (dur 0) forward-fill the last duration
    token's midpoint (cum is monotone, so a running max fills exactly)
    — without the fill they'd point at the NEXT note's onset. Leading
    non-duration tokens clamp to the bar start; everything normalizes
    by the bar's total duration.

    Scope: time advances at EVERY duration token — correct for streams
    where each duration token is its own sequential note (the legacy
    chord-free synth corpora join sequential notes with '<b>'). Real-
    pipeline targets separate EVENTS with the newline token and chord
    notes with '<b>', each chord note carrying its own duration token,
    so chords would double-count here — use ga_within_bar_events (or
    the per-row ga_within_bar_auto dispatch) for those."""
    valid = (gt != pad).astype(jnp.float32)
    dur = jnp.asarray(dur_frac, jnp.float32)[gt] * valid
    cum = jnp.cumsum(dur, axis=-1) - dur / 2.0
    mid = jnp.where(dur > 0, cum, -1.0)
    mid = jax.lax.cummax(mid, axis=gt.ndim - 1)
    mid = jnp.maximum(mid, 0.0)
    total = jnp.maximum(jnp.sum(dur, axis=-1, keepdims=True), 1e-6)
    return jnp.clip(mid / total, 0.0, 1.0)


def ga_within_bar_events(gt: jnp.ndarray, dur_frac, pad: int,
                         sep: int) -> jnp.ndarray:
    """Chord-aware within-bar time fraction: EVENT-segmented centers.

    Real-pipeline targets (reference: data_processing/humdrum.py:99-127)
    separate simultaneous events with the newline token `sep` and join a
    chord's notes with '<b>', each note carrying its OWN duration token.
    Time therefore advances once per EVENT, by the event's max duration
    (chord notes share the event duration; multi-voice tab columns are
    approximated by the max — the guide is a prior, not a loss target).
    Every token of event k expects event k's temporal MIDPOINT.

    Vectorized over (..., T): event ids come from a cumsum over shifted
    separator flags; per-event max/size/start reduce over a (..., T, T)
    same-event mask (T<=398 → a few MB transient, computed once per
    forward, no gradient flows through it). Each position contributes
    its event's duration divided by the event's size, so summing those
    contributions over earlier-event positions counts every earlier
    event exactly once. Trailing <pad>/<eos> merge into the last event
    with zero duration — they inflate neither the event max nor the
    totals."""
    valid = (gt != pad).astype(jnp.float32)
    dur = jnp.asarray(dur_frac, jnp.float32)[gt] * valid
    is_sep = (gt == sep)
    new_event = jnp.concatenate(
        [jnp.ones_like(is_sep[..., :1]), is_sep[..., :-1]], axis=-1)
    seg = jnp.cumsum(new_event.astype(jnp.int32), axis=-1)   # (..., T) >= 1
    same = seg[..., :, None] == seg[..., None, :]            # (..., T, T)
    event_dur = jnp.max(jnp.where(same, dur[..., None, :], 0.0), axis=-1)
    seg_size = jnp.maximum(jnp.sum(same, axis=-1), 1).astype(jnp.float32)
    per_pos = event_dur / seg_size
    earlier = seg[..., None, :] < seg[..., :, None]
    start = jnp.sum(jnp.where(earlier, per_pos[..., None, :], 0.0), axis=-1)
    total = jnp.maximum(jnp.sum(per_pos, axis=-1, keepdims=True), 1e-6)
    return jnp.clip((start + event_dur / 2.0) / total, 0.0, 1.0)


def ga_within_bar_auto(gt: jnp.ndarray, dur_frac, pad: int,
                       sep: int) -> jnp.ndarray:
    """Per-row dispatch between the two bar-time maps: rows containing
    the event separator (real-pipeline / chordal-synth targets) use the
    event-segmented map; separator-free rows (legacy chord-free synth
    streams, one duration per sequential note) keep the per-duration
    token map. Both maps are computed (cheap, once per forward) and the
    choice is a data-dependent select, so one compiled program covers
    mixed batches."""
    token_map = ga_within_bar(gt, dur_frac, pad)
    event_map = ga_within_bar_events(gt, dur_frac, pad, sep)
    has_sep = jnp.any(gt == sep, axis=-1, keepdims=True)
    return jnp.where(has_sep, event_map, token_map)


def ga_within_bar_map(gt: jnp.ndarray, dur_frac, pad: int, sep: int,
                      mode: str = "auto") -> jnp.ndarray:
    """Select the within-bar map by `mode`.

    'auto' (default) is the per-row heuristic above — right for mixed
    batches, but a real-pipeline bar holding a SINGLE chord event has no
    separator and is token-indistinguishable from a legacy '<b>'-joined
    sequential stream, so auto routes it to the per-duration map and the
    chord double-counts. Corpora with known target structure should pin
    the map: 'events' for real-pipeline / chordal-synth targets
    (extras `guided_attention_map: events`), 'tokens' for the legacy
    chord-free streams."""
    if mode == "events":
        return ga_within_bar_events(gt, dur_frac, pad, sep)
    if mode == "tokens":
        return ga_within_bar(gt, dur_frac, pad)
    if mode != "auto":
        raise ValueError(f"ga_map={mode!r}: expected auto|events|tokens")
    return ga_within_bar_auto(gt, dur_frac, pad, sep)


def note_decoder_dual_scan(dual_params, cfg: ModelConfig, enc, enc_proj2,
                           h0, gt_up, gt_low, tf_ratio, train: bool, rng,
                           emit_full: bool = True, ga_frac=None,
                           ga_sigma: float = 0.15, ga_dur_frac=None,
                           ga_content=None, ga_map: str = "auto"):
    """Teacher-forced decode of one bar for BOTH staves in one fixed-length
    scan of max(T_up, T_low) steps. Returns (upper, lower, ga_num) with
    per-staff (logp, tokens, lengths).

    emit_full=False emits only the log-prob of the ground-truth token at
    each step ("picked" NLL inputs, shape (B, T)) instead of full (B, T, V)
    distributions — the full logits for one batch of 16 clips are 22 GB
    and only their gt-gather is needed for the training loss.

    ga_frac=(bar_start_frac, bar_span_frac) turns on the guided-attention
    penalty (opt-in training aid, OFF by default — see losses.py): the
    expected attention center for step t is bar_start + bar_span *
    within(t), and the penalty is the attention mass outside a Gaussian
    of width `ga_sigma` (fractional) around it, summed over non-pad
    steps. within(t) is the bar-time fraction: with `ga_dur_frac` (a
    (vocab,) table of whole-note fractions per DURATION token id, zero
    elsewhere) it is the cumulative ground-truth duration at t over the
    bar total — exact for scores whose bars are rendered
    proportional-to-duration; without it, the linear token-index
    approximation (t+0.5)/L. `ga_content` ((B,) fraction of the encoder
    window the clip's audio actually occupies) compresses the centers
    for clips shorter than the window — without it a 10.8s clip in the
    12.5s window puts bar-4 expectations ~1 sigma off (DESIGN §11).
    Penalties accumulate INSIDE the scan (one fused multiply-add over
    (2,B,T_enc) per step, nothing materialized); ga_num is (2, B) or
    None when off.
    """
    B = enc.shape[0]
    t_up, t_low = cfg.max_length
    T = max(t_up, t_low)
    gt_up_p = jnp.pad(jnp.asarray(gt_up), ((0, 0), (0, T - t_up)),
                      constant_values=cfg.pad)
    gt_low_p = jnp.pad(jnp.asarray(gt_low), ((0, 0), (0, T - t_low)),
                       constant_values=cfg.pad)
    gt2 = jnp.stack([gt_up_p, gt_low_p]).astype(jnp.int32)
    gt_xs = jnp.moveaxis(gt2, 2, 0)  # (T, 2, B)
    sos2 = _dual_embed(dual_params, jnp.full((2, B), cfg.sos, jnp.int32))
    step_keys = jax.random.split(rng, T * 4).reshape(T, 4, 2)
    up_len = _note_lengths(jnp.asarray(gt_up) == cfg.eos, t_up)
    low_len = _note_lengths(jnp.asarray(gt_low) == cfg.eos, t_low)
    if ga_frac is not None:
        f_frac = (jnp.arange(enc.shape[1], dtype=jnp.float32)
                  / enc.shape[1])                                # (T_enc,)
        bar_start, bar_span = ga_frac
        valid2 = (gt2 != cfg.pad).astype(jnp.float32)            # (2,B,T)
        if ga_dur_frac is not None:
            within = ga_within_bar_map(gt2, ga_dur_frac, cfg.pad,
                                       cfg.newline, ga_map)      # (2,B,T)
        else:
            len2 = jnp.stack([up_len, low_len]).astype(jnp.float32)
            within = jnp.minimum(
                (jnp.arange(T, dtype=jnp.float32)[None, None, :] + 0.5)
                / jnp.maximum(len2, 1.0)[..., None], 1.0)
        phi = bar_start + bar_span * within                      # (2,B,T)
        if ga_content is not None:
            phi = phi * ga_content[None, :, None]
        phi_xs = jnp.moveaxis(phi, 2, 0)                         # (T,2,B)
    else:
        phi_xs = jnp.zeros((T, 2, B), jnp.float32)

    @jax.checkpoint  # remat: the (2,B,T_enc,H) attention energies would
    # otherwise be saved for EVERY step (~20 GB at full size, B=4);
    # recomputing them in the backward pass keeps activations ~step-sized.
    def body(carry, xs):
        h2, tok2, ga = carry
        keys, gt_t, phi_t = xs  # keys (4, 2); gt_t (2, B); phi_t (2, B)
        h2, logp2, pred2, w2 = _dual_step(dual_params, cfg, enc, enc_proj2,
                                          h2, tok2, keys[:2], train)
        if ga_frac is not None:
            guide = 1.0 - jnp.exp(
                -((f_frac[None, None, :] - phi_t[..., None]) ** 2)
                / (2.0 * ga_sigma ** 2))                    # (2, B, T_enc)
            step_pen = jnp.sum(w2.astype(jnp.float32) * guide, axis=-1)
            valid = (gt_t != cfg.pad).astype(jnp.float32)
            ga = ga + step_pen * valid
        # One coin per staff per step, shared across the batch
        # (reference: models.py:404).
        coins = jax.vmap(jax.random.uniform)(keys[2:]) < tf_ratio
        next2 = jnp.where(coins[:, None], gt_t, pred2)
        tok2 = _dual_embed(dual_params, next2)
        if emit_full:
            emitted = logp2
        else:
            emitted = jnp.take_along_axis(logp2, gt_t[..., None],
                                          axis=-1)[..., 0]  # (2, B)
        return (h2, tok2, ga), (emitted, pred2)

    h0_2 = jnp.stack([h0, h0])
    ga0 = jnp.zeros((2, B), jnp.float32)
    (_, _, ga_num), (logps, preds) = jax.lax.scan(
        body, (h0_2, sos2, ga0), (step_keys, gt_xs, phi_xs))
    # logps: (T, 2, B[, V]) -> per staff (B, T_staff[, V])
    up_logp = jnp.swapaxes(logps[:, 0], 0, 1)[:, :t_up]
    low_logp = jnp.swapaxes(logps[:, 1], 0, 1)[:, :t_low]
    up_tok = jnp.swapaxes(preds[:, 0], 0, 1)[:, :t_up]
    low_tok = jnp.swapaxes(preds[:, 1], 0, 1)[:, :t_low]
    return ((up_logp, up_tok, up_len), (low_logp, low_tok, low_len),
            ga_num if ga_frac is not None else None)


def note_decoder_dual_infer(dual_params, cfg: ModelConfig, enc, enc_proj2,
                            h0):
    """Greedy decode of both staves in one early-exit while_loop.

    Per-staff stopping mirrors the reference exactly: staff s runs while
    t < its max_steps and not every batch item emitted EOS; buffers stay
    zero past its stop. The loop runs to the LATEST staff stop — on real
    data ~max(len_up, len_low) sequential steps instead of 398+189.

    The step is latency-bound (every op waits on the previous), so the
    fast path minimizes dispatched ops: (1) the attention query projection
    rides along in the recurrent GRU matmul (h @ [W_hh | W_q]); (2) the
    token-side input projection is folded into the embedding table
    (emb @ W_ih_tok precomputed), turning embed+matmul into one gather.
    Both are exact rewrites (column-independent matmuls).
    """
    B = enc.shape[0]
    t_up, t_low = cfg.max_length
    T = max(t_up, t_low)
    caps = jnp.array([t_up, t_low], jnp.int32)
    E = cfg.note_emb_size

    gru2 = dual_params["gru"]
    attn2 = dual_params["attn"]
    # (2, H2, 3H2 + H) fused recurrent + query weights.
    w_hq2 = jnp.concatenate([gru2["w_hh"], attn2["w_query"]], axis=-1)
    # Token-side input projection folded into the embedding table.
    emb_proj2 = jnp.einsum("sve,sek->svk", dual_params["emb"]["emb"],
                           gru2["w_ih"][:, :E, :])
    w_ih_ctx2 = gru2["w_ih"][:, E:, :]
    n_gates = gru2["w_hh"].shape[-1]

    def fast_step(h2, tokp2):
        hq = jnp.einsum("sbh,shk->sbk", h2, w_hq2)
        h_proj2 = hq[..., :n_gates] + gru2["b_hh"][:, None]
        q2 = hq[..., n_gates:]
        energy = jnp.tanh(enc_proj2 + q2[:, :, None, :])
        scores = jnp.einsum("sbth,sh->sbt", energy, attn2["v"])
        weights = jax.nn.softmax(
            scores.astype(jnp.promote_types(scores.dtype, jnp.float32)),
            axis=-1).astype(enc.dtype)
        ctx2 = jnp.einsum("sbt,bth->sbh", weights, enc)
        x_proj2 = (tokp2 + jnp.einsum("sbh,shk->sbk", ctx2, w_ih_ctx2)
                   + gru2["b_ih"][:, None])
        ir, iz, inn = jnp.split(x_proj2, 3, axis=-1)
        hr, hz, hn = jnp.split(h_proj2, 3, axis=-1)
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(inn + r * hn)
        h2_new = (1.0 - z) * n + z * h2
        out = jnp.einsum("sbh,shv->sbv",
                         jnp.concatenate([h2_new, ctx2], axis=-1),
                         dual_params["out"]["w"]) + \
            dual_params["out"]["b"][:, None]
        logp2 = jax.nn.log_softmax(
            out.astype(jnp.promote_types(out.dtype, jnp.float32)), axis=-1)
        pred2 = jnp.argmax(logp2, axis=-1).astype(jnp.int32)
        return h2_new, logp2, pred2

    def tok_proj(ids2):
        return jax.vmap(lambda tbl, ids: jnp.take(tbl, ids, axis=0))(
            emb_proj2, ids2)

    sos2 = tok_proj(jnp.full((2, B), cfg.sos, jnp.int32))
    logps0 = jnp.zeros((T, 2, B, cfg.vocab_size),
                       jnp.promote_types(enc.dtype, jnp.float32))
    preds0 = jnp.zeros((T, 2, B), jnp.int32)
    state0 = (jnp.array(0, jnp.int32), jnp.stack([h0, h0]), sos2,
              jnp.zeros((2, B), bool),
              jnp.stack([jnp.full((B,), t_up, jnp.int32),
                         jnp.full((B,), t_low, jnp.int32)]),
              logps0, preds0)

    def active(t, done):
        return (t < caps) & ~jnp.all(done, axis=1)  # (2,)

    def cond(s):
        t, _, _, done, _, _, _ = s
        return jnp.any(active(t, done))

    def body(s):
        t, h2, tok2, done, lengths, logps, preds = s
        act = active(t, done)  # (2,) executed-this-step per staff
        h2_new, logp2, pred2 = fast_step(h2, tok2)
        h2 = jnp.where(act[:, None, None], h2_new, h2)
        write_logp = jnp.where(act[:, None, None], logp2, 0.0)
        write_pred = jnp.where(act[:, None], pred2, 0)
        logps = jax.lax.dynamic_update_index_in_dim(logps, write_logp, t, 0)
        preds = jax.lax.dynamic_update_index_in_dim(preds, write_pred, t, 0)
        is_eos = (pred2 == cfg.eos) & act[:, None]
        lengths = jnp.where(is_eos, t + 1, lengths)
        done = done | is_eos
        tok2_new = tok_proj(pred2)
        tok2 = jnp.where(act[:, None, None], tok2_new, tok2)
        return (t + 1, h2, tok2, done, lengths, logps, preds)

    (_, _, _, done, lengths, logps, preds) = jax.lax.while_loop(
        cond, body, state0)
    up = (jnp.swapaxes(logps[:, 0], 0, 1)[:, :t_up],
          jnp.swapaxes(preds[:, 0], 0, 1)[:, :t_up], lengths[0])
    low = (jnp.swapaxes(logps[:, 1], 0, 1)[:, :t_low],
           jnp.swapaxes(preds[:, 1], 0, 1)[:, :t_low], lengths[1])
    return up, low


# ---------------------------------------------------------------------------
# Hierarchical (bar-level) decoder
# ---------------------------------------------------------------------------

def _staff_summary(dec, tokens_or_emb: jnp.ndarray,
                   lengths: jnp.ndarray) -> jnp.ndarray:
    """Bidirectional staff-summarizer GRU final state over note embeddings
    (reference: models.py:164-189). tokens_or_emb: (B, T) int token ids."""
    emb = L.embed(dec["note_emb"], tokens_or_emb.astype(jnp.int32))
    return G.bidir_final(dec["staff_fwd"], dec["staff_bwd"], emb, lengths)


def _staff_summaries_fused(dec, tokens: jnp.ndarray,
                           lengths: jnp.ndarray) -> jnp.ndarray:
    """S staff summaries in ONE scan (ops.gru.bidir_final_fused).

    The reference runs a separate packed bidirectional GRU per summary
    (models.py:164-189, called 2-4x per bar at models.py:289-311); each
    step is tiny (B x 16 embeddings into a 32-wide GRU), so the cost is
    pure sequential-step latency — stacking all summaries and both
    directions into one scan divides that by 2S.

    tokens: (S, B, T) int ids; lengths: (S, B). Returns (S, B, 2H).
    """
    emb = L.embed(dec["note_emb"], tokens.astype(jnp.int32))
    return G.bidir_final_fused(dec["staff_fwd"], dec["staff_bwd"], emb,
                               lengths)


def _mlp_head(head, x: jnp.ndarray) -> jnp.ndarray:
    y = jax.nn.relu(L.linear(head["l1"], x))
    y = jax.nn.relu(L.linear(head["l2"], y))
    return jax.nn.log_softmax(L.linear(head["l3"], y), axis=-1)


def hierarchical_decoder_apply(params, cfg: ModelConfig, enc: jnp.ndarray,
                               hidden: jnp.ndarray,
                               ground_truth, tf_ratio, train: bool, rng,
                               decode_dtype=None, emit_full: bool = True,
                               ga_sigma: float = 0.0, ga_dur_frac=None,
                               ga_content=None, ga_map: str = "auto"):
    """Decode max_bars bars. ground_truth is None (inference) or the tuple
    (time_sig (B,bars), key (B,bars), upper (B,bars,Tu), upper_len (B,bars),
    lower (B,bars,Tl), lower_len (B,bars)).

    decode_dtype: optional storage dtype (e.g. jnp.bfloat16) for the
    note-decoder loop's large operands (enc, attention projections, staff
    params) — halves the HBM traffic that bounds decode speed. Logits,
    softmaxes and emitted log-probs stay float32. None = full f32 (parity).

    ga_sigma > 0 (training with ground truth only) turns on the
    guided-attention penalty: bar j of max_bars is expected to attend to
    frames [j, j+1]/max_bars, linearly in its token index (see
    note_decoder_dual_scan). The aux dict gains "ga_num" (B, bars, 2).
    """
    dec = params["decoder"]
    B = enc.shape[0]
    has_gt = ground_truth is not None

    enc_proj_bar = A.precompute_enc_proj(dec["attn"], enc)
    enc_proj_up = A.precompute_enc_proj(dec["upper"]["attn"], enc)
    enc_proj_low = A.precompute_enc_proj(dec["lower"]["attn"], enc)
    dual_params = stack_staff_params(dec["upper"], dec["lower"])
    enc_proj2 = jnp.stack([enc_proj_up, enc_proj_low])
    if decode_dtype is not None:
        cast = lambda t: jax.tree.map(  # noqa: E731
            lambda a: a.astype(decode_dtype)
            if a.dtype == jnp.float32 else a, t)
        dual_params = cast(dual_params)
        enc_proj2 = enc_proj2.astype(decode_dtype)
        enc_dec = enc.astype(decode_dtype)
    else:
        enc_dec = enc

    # SOS bootstrap token (reference: models.py:141-162): staff summary of
    # [<sos>, <eos>] duplicated for both staves + SOS time/key embeddings.
    sos_pair = jnp.tile(jnp.array([[cfg.sos, cfg.eos]], jnp.int32), (B, 1))
    staff0 = _staff_summary(dec, sos_pair, jnp.full((B,), 2, jnp.int32))
    time0 = L.embed(dec["time_sig_emb"],
                    jnp.full((B,), cfg.num_time_sig, jnp.int32))
    key0 = L.embed(dec["key_emb"], jnp.full((B,), cfg.num_keys, jnp.int32))
    token0 = jnp.concatenate([staff0, staff0, time0, key0], axis=-1)

    if has_gt:
        ts_gt, key_gt, up_gt, up_len_gt, low_gt, low_len_gt = [
            jnp.asarray(g) for g in ground_truth]
        xs_gt = (jnp.swapaxes(ts_gt, 0, 1), jnp.swapaxes(key_gt, 0, 1),
                 jnp.swapaxes(up_gt, 0, 1), jnp.swapaxes(up_len_gt, 0, 1),
                 jnp.swapaxes(low_gt, 0, 1), jnp.swapaxes(low_len_gt, 0, 1))
    else:
        bars = cfg.max_bars
        xs_gt = (jnp.zeros((bars, B), jnp.int32),) * 2 + (
            jnp.zeros((bars, B, cfg.max_length[0]), jnp.int32),
            jnp.zeros((bars, B), jnp.int32),
            jnp.zeros((bars, B, cfg.max_length[1]), jnp.int32),
            jnp.zeros((bars, B), jnp.int32))

    bar_keys = jax.random.split(rng, cfg.max_bars)
    bar_idx = jnp.arange(cfg.max_bars, dtype=jnp.float32)
    use_ga = ga_sigma > 0 and has_gt and train

    def bar_body(carry, xs):
        hidden, token = carry
        key, j, (ts_t, key_t, up_t, up_len_t, low_t, low_len_t) = xs
        k_drop, k_coin, k_up, k_low = jax.random.split(key, 4)

        token = L.dropout(k_drop, token, 0.1, train)
        context, _ = A.attention_step(dec["attn"], enc_proj_bar, enc, hidden)
        rnn_in = jnp.concatenate([token, context], axis=-1)
        bar_summary = G.gru_step(dec["gru"], rnn_in, hidden)
        hidden = bar_summary  # single-layer GRU: output == new hidden

        bar_h0 = bar_summary.astype(enc_dec.dtype)
        if has_gt:
            ga_frac = ((j / cfg.max_bars, 1.0 / cfg.max_bars)
                       if use_ga else None)
            ((up_logp, up_tok, up_len),
             (low_logp, low_tok, low_len), ga_num) = note_decoder_dual_scan(
                dual_params, cfg, enc_dec, enc_proj2, bar_h0,
                up_t, low_t, tf_ratio, train, k_up, emit_full=emit_full,
                ga_frac=ga_frac, ga_sigma=ga_sigma,
                ga_dur_frac=(ga_dur_frac if use_ga else None),
                ga_content=(ga_content if use_ga else None),
                ga_map=ga_map)
        else:
            ((up_logp, up_tok, up_len),
             (low_logp, low_tok, low_len)) = note_decoder_dual_infer(
                dual_params, cfg, enc_dec, enc_proj2, bar_h0)
            ga_num = None
        if ga_num is None:
            ga_num = jnp.zeros((2, enc.shape[0]), jnp.float32)
        del k_low

        head_in = jnp.concatenate([bar_summary, context], axis=-1)
        ts_logp = _mlp_head(dec["time_head"], head_in)
        key_logp = _mlp_head(dec["key_head"], head_in)

        # Next-bar conditioning token (reference: models.py:288-311): one
        # teacher-forcing coin PER BAR shared across the batch. All of
        # this bar's staff summaries — predicted upper/lower and (in
        # training) ground-truth upper/lower — run in ONE fused scan.
        T_s = max(up_tok.shape[1], low_tok.shape[1])
        pad_t = lambda a: jnp.pad(  # noqa: E731
            a, ((0, 0), (0, T_s - a.shape[1])), constant_values=cfg.pad)
        if has_gt:
            sums = _staff_summaries_fused(
                dec,
                jnp.stack([pad_t(up_tok), pad_t(low_tok),
                           pad_t(up_t.astype(jnp.int32)),
                           pad_t(low_t.astype(jnp.int32))]),
                jnp.stack([up_len, low_len,
                           up_len_t.astype(jnp.int32),
                           low_len_t.astype(jnp.int32)]))
        else:
            sums = _staff_summaries_fused(
                dec, jnp.stack([pad_t(up_tok), pad_t(low_tok)]),
                jnp.stack([up_len, low_len]))
        ts_pred = jnp.argmax(ts_logp, axis=-1).astype(jnp.int32)
        key_pred = jnp.argmax(key_logp, axis=-1).astype(jnp.int32)
        token_pred = jnp.concatenate([
            sums[0], sums[1],
            L.embed(dec["time_sig_emb"], ts_pred),
            L.embed(dec["key_emb"], key_pred)], axis=-1)

        if has_gt:
            token_gt = jnp.concatenate([
                sums[2], sums[3],
                L.embed(dec["time_sig_emb"], ts_t.astype(jnp.int32)),
                L.embed(dec["key_emb"], key_t.astype(jnp.int32))], axis=-1)
            teacher_force = jax.random.uniform(k_coin) < tf_ratio
            token = jnp.where(teacher_force, token_gt, token_pred)
        else:
            token = token_pred

        return ((hidden, token),
                (ts_logp, key_logp, up_logp, low_logp,
                 up_tok, low_tok, up_len, low_len, ga_num))

    (_, _), outs = jax.lax.scan(bar_body, (hidden, token0),
                                (bar_keys, bar_idx, xs_gt))
    (ts_logp, key_logp, up_logp, low_logp, up_tok, low_tok, up_len,
     low_len, ga_num) = outs
    # (bars, B, ...) -> (B, bars, ...)
    swap = lambda a: jnp.swapaxes(a, 0, 1)  # noqa: E731
    aux = {"upper_tokens": swap(up_tok), "lower_tokens": swap(low_tok),
           "upper_lengths": swap(up_len), "lower_lengths": swap(low_len)}
    if use_ga:
        # (bars, 2, B) -> (B, bars, 2): per-clip/bar/staff penalty sums.
        aux["ga_num"] = jnp.transpose(ga_num, (2, 0, 1))
    return (swap(ts_logp), swap(key_logp), swap(up_logp), swap(low_logp),
            aux)


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------

def pick_decode_chunk(decode_chunk, batch: int, decode_dtype=None):
    """Resolve a decode_chunk setting to a concrete divisor of `batch`
    (or None for unchunked). "auto" picks the largest chunk whose decode
    loop invariants (enc + both staves' attention projections + stacked
    decoder weights, ~5.8 MB/clip f32) fit VMEM so XLA keeps them
    chip-resident across the ~2000 sequential steps: 16 for f32, 32 for
    bf16 (measured crossover, docs/DESIGN.md §2)."""
    if decode_chunk in (None, 0, False):
        return None
    if decode_chunk == "auto":
        decode_chunk = 32 if decode_dtype == jnp.bfloat16 else 16
    chunk = int(decode_chunk)
    if batch <= chunk:
        return None
    while batch % chunk:
        chunk -= 1
    return chunk if chunk > 1 else None


def forward(params, state, spectrogram: jnp.ndarray, rng,
            cfg: ModelConfig = ModelConfig(), train: bool = False,
            ground_truth=None, tf_ratio=0.0, decode_dtype=None,
            emit_full: bool = True, conv_dtype=None, decode_chunk=None,
            sample_weight=None, ga_sigma: float = 0.0, ga_dur_frac=None,
            ga_content=None, ga_map: str = "auto"):
    """Full model forward.

    spectrogram: (B, 1, T, F). Returns ((time_sig_logp (B,bars,7),
    key_logp (B,bars,14), upper_logp (B,bars,Tu,V), lower_logp (B,bars,Tl,V),
    aux dict), new_state). decode_dtype=jnp.bfloat16 enables the
    reduced-precision decode loop; emit_full=False (training only) returns
    gt-picked log-probs (B,bars,T) in place of the upper/lower
    distributions — see hierarchical_decoder_apply. conv_dtype (train
    path; e.g. jnp.bfloat16) enables mixed-precision conv-stack TRAINING
    — see conv_stack_apply's compute_dtype.

    decode_chunk (int or "auto"; inference only): run the decoder over
    batch chunks of this size via lax.map while conv/encoder stay
    full-batch. This keeps each chunk's decode-loop invariants small
    enough for XLA to hold in VMEM across the ~2000 sequential steps
    instead of re-streaming ~330 MB/step from HBM (measured at B=64
    f32: 602 -> 310 ms full-length; docs/DESIGN.md §2). Semantics: the
    per-step math is per-clip, but the decoder's early-exit/length
    bookkeeping is batch-coupled (a staff steps until EVERY item in the
    loop emitted EOS, and lengths record the LAST EOS — the reference's
    own semantics, models.py:411-419), so chunking changes the coupling
    groups. On EOS-confident (trained) models results are
    token-identical (tests/test_decode_chunk.py); on weak/untrained
    models outputs can differ from unchunked — the same class of
    variation as changing the batch composition itself. Ignored when
    the batch is already <= chunk. Do not combine with a batch-sharded
    mesh under plain jit (the chunk reshape would cross shard
    boundaries) — wrap the forward in shard_map so the chunk applies to
    each device's local shard instead (infer.Transcriber does).
    """
    k_conv, k_dec = jax.random.split(rng)
    conv_x = spectrogram
    compute_dtype = None
    if decode_dtype is not None and not train:
        # Reduced-precision serving also runs the conv frontend in
        # decode_dtype: XLA already converts conv INPUTS to bf16 on the MXU
        # (f32 "convs" multiply in bf16 under allow_excess_precision), so
        # storing the ~GB conv activations in bf16 halves their HBM traffic
        # and layout-copy cost without changing the multiply precision.
        # Full f32 resumes at the encoder input.
        conv_x = spectrogram.astype(decode_dtype)
    elif conv_dtype is not None and train:
        compute_dtype = conv_dtype
    feats, new_conv_state = conv_stack_apply(
        params["convstack"], state["convstack"], conv_x, train, k_conv,
        compute_dtype=compute_dtype,
        sample_weight=sample_weight if train else None)
    # bf16 frontend output promotes back to f32 for the encoder; f32/f64
    # pass through unchanged (x64 parity runs stay f64).
    feats = feats.astype(jnp.promote_types(feats.dtype, jnp.float32))
    enc, hidden = encoder_apply(params["encoder"], feats)
    chunk = (pick_decode_chunk(decode_chunk, enc.shape[0], decode_dtype)
             if not train and ground_truth is None else None)
    if chunk:
        k = enc.shape[0] // chunk

        def dec_chunk(args):
            enc_c, hid_c = args
            return hierarchical_decoder_apply(
                params, cfg, enc_c, hid_c, None, tf_ratio, False, k_dec,
                decode_dtype=decode_dtype, emit_full=emit_full)

        outs = jax.lax.map(dec_chunk,
                           (enc.reshape(k, chunk, *enc.shape[1:]),
                            hidden.reshape(k, chunk, hidden.shape[-1])))
        ts, key, up, low, aux = jax.tree.map(
            lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]),
            outs)
    else:
        ts, key, up, low, aux = hierarchical_decoder_apply(
            params, cfg, enc, hidden, ground_truth, tf_ratio, train, k_dec,
            decode_dtype=decode_dtype, emit_full=emit_full,
            ga_sigma=ga_sigma, ga_dur_frac=ga_dur_frac,
            ga_content=ga_content, ga_map=ga_map)
    return (ts, key, up, low, aux), {"convstack": new_conv_state}


def forward_infer(params, state, spectrogram: jnp.ndarray,
                  cfg: ModelConfig = ModelConfig()):
    """Inference forward (deterministic; dropout off, greedy decode)."""
    rng = jax.random.PRNGKey(0)  # never consumed on the eval path
    (ts, key, up, low, aux), _ = forward(params, state, spectrogram, rng,
                                         cfg=cfg, train=False)
    return ts, key, up, low, aux
