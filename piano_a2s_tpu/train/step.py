"""Jitted train / eval steps.

One XLA program per step (forward + backward + Adadelta update), with
SpeechBrain-Brain-equivalent safeguards (reference: pretrain.py:121-129):
gradient global-norm clipping at 5.0 (sb default max_grad_norm) and
skip-update on non-finite loss/gradients.

The learning rate is injected as an optimizer hyperparameter so NewBob
annealing between epochs does not recompile the step.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.score_transcription import ModelConfig, forward
from .losses import (component_totals, fused_component_sums,
                     transcription_loss, transcription_loss_fused)

MAX_GRAD_NORM = 5.0


def make_optimizer(lr: float = 1.0, rho: float = 0.95,
                   eps: float = 1e-8) -> optax.GradientTransformation:
    """Adadelta, torch-compatible (reference: hparams/pretrain.yaml:44-47),
    with an injectable learning rate."""
    return optax.inject_hyperparams(optax.adadelta)(
        learning_rate=lr, rho=rho, eps=eps)


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place on the optimizer state."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=opt_state.hyperparams["learning_rate"].dtype)
    return opt_state


def _ground_truth(batch: Dict[str, jnp.ndarray]):
    return (batch["time_sig"], batch["key"], batch["upper"],
            batch["upper_lengths"], batch["lower"], batch["lower_lengths"])


def _promote_staged(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Undo reduced-precision batch staging on device.

    The harness may upload the spectrogram as float16 or uint8 purely to
    shrink the host->device transfer (train/harness.py `upload_dtype` —
    transfers do not overlap compute on the tunnel-attached platform);
    compute wants >=f32. uint8 staging exploits the log-VQT contract: the
    spectrogram is db/80+1 with ref=max/top_db=80 (ops/vqt.log_compress),
    hence exactly in [0, 1] — round(x*255) quantizes the log magnitude to
    0.31 dB steps. A no-op for f32/f64 batches (parity paths unchanged)."""
    spec = batch["spectrogram"]
    if spec.dtype == jnp.float16:
        batch = dict(batch)
        batch["spectrogram"] = spec.astype(jnp.float32)
    elif spec.dtype == jnp.uint8:
        batch = dict(batch)
        batch["spectrogram"] = spec.astype(jnp.float32) * (1.0 / 255.0)
    return batch


def make_audio_frontend(vqt_cfg=None, max_frame_num: int = 1201):
    """Batch prep for training FROM RAW AUDIO: the batch carries "audio"
    (B, samples) instead of "spectrogram", and the log-VQT frontend runs
    on device inside the same XLA program as the step — the TPU-native
    counterpart of the reference's offline `librosa.vqt` + .npy cache
    (reference: utilities.py:240-254, render.py:491-512). Same fused
    frontend contract as serving (infer.Transcriber's infer_audio):
    int16 PCM converts with read_wav's exact /32768 scale, frames are
    trimmed/zero-padded to max_frame_num. The spectrogram is an input,
    not a parameter — stop_gradient keeps autodiff from tracking the
    frontend. Host->device traffic: 0.38 MB/clip int16 audio vs 2.3 MB
    f32 (0.58 MB uint8) spectrograms."""
    from ..ops.vqt import VQTConfig, build_kernels, get_vqt
    from ..utils.audio import PCM16_SCALE

    vqt_cfg = vqt_cfg or VQTConfig()
    kernels = tuple(map(jnp.asarray, build_kernels(vqt_cfg)))

    def prep(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        batch = dict(batch)
        audio = batch.pop("audio")
        if audio.dtype == jnp.int16:
            audio = audio.astype(jnp.float32) / PCM16_SCALE
        # Content fraction: what part of the (zero-padded-to-max) frame
        # window the clip actually occupies. Rendered clips are 10.2-11.8s
        # in the 12.5s window, so guided attention's expected centers must
        # compress by this per-clip factor (docs/DESIGN.md §11).
        L = audio.shape[-1]
        active = jnp.abs(audio) > 1e-4
        last = L - jnp.argmax(active[:, ::-1], axis=-1)  # 1-based index
        n_samples = jnp.where(jnp.any(active, axis=-1), last, L)
        content = (n_samples / vqt_cfg.hop_length) / max_frame_num
        batch["ga_content"] = jnp.clip(
            content, 0.05, 1.0).astype(jnp.float32)
        spec = get_vqt(audio, kernels, vqt_cfg)  # (B, T, bins)
        t = spec.shape[1]
        if t >= max_frame_num:
            spec = spec[:, :max_frame_num]
        else:
            spec = jnp.pad(spec, ((0, 0), (0, max_frame_num - t), (0, 0)))
        batch["spectrogram"] = jax.lax.stop_gradient(spec[:, None])
        return batch

    return prep


class StepOutput(NamedTuple):
    loss: jnp.ndarray
    components: Dict[str, jnp.ndarray]


def train_step(params, opt_state, state, batch, rng, tf_ratio,
               optimizer: optax.GradientTransformation,
               cfg: ModelConfig, conv_dtype=None, prep=_promote_staged,
               ga_weight: float = 0.0, ga_sigma: float = 0.15,
               ga_dur_frac=None, ga_map: str = "auto"):
    """Pure train step: returns (params, opt_state, state, StepOutput).

    Uses the fused-loss forward (emit_full=False): the per-step gt-picked
    log-probs feed the NLL directly, so the (B, bars, T, V) staff
    distributions (22 GB at B=16) are never materialized.
    conv_dtype=jnp.bfloat16 runs the conv stack in mixed precision
    (matmuls + saved activations bf16, BN stats f32). `prep` maps the
    uploaded batch to the model's input contract (staged-dtype promotion
    by default; the on-device VQT frontend for audio batches)."""
    # A zero-width guide is no guide: without this gate, ga_weight > 0
    # with ga_sigma == 0 would make the loss index an aux key the forward
    # never produced (KeyError at trace time).
    ga_weight = ga_weight if ga_sigma > 0 else 0.0
    batch = prep(batch)

    def loss_fn(p):
        outs, new_state = forward(
            p, state, batch["spectrogram"], rng, cfg=cfg, train=True,
            ground_truth=_ground_truth(batch), tf_ratio=tf_ratio,
            emit_full=False, conv_dtype=conv_dtype,
            sample_weight=batch.get("sample_weight"),
            ga_sigma=(ga_sigma if ga_weight else 0.0),
            ga_dur_frac=ga_dur_frac,
            ga_content=batch.get("ga_content"), ga_map=ga_map)
        loss, comps = transcription_loss_fused(
            outs, batch, cfg.pad,
            sample_weight=batch.get("sample_weight"), ga_weight=ga_weight)
        return loss, (comps, new_state)

    (loss, (comps, new_state)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)

    gnorm = optax.global_norm(grads)
    finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)
    scale = jnp.where(gnorm > MAX_GRAD_NORM, MAX_GRAD_NORM / gnorm, 1.0)
    grads = jax.tree.map(lambda g: g * scale, grads)

    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    # Skip the update entirely on non-finite loss/grads (sb check_gradients).
    pick = lambda new, old: jax.tree.map(  # noqa: E731
        lambda a, b: jnp.where(finite, a, b), new, old)
    new_params = pick(new_params, params)
    new_opt_state = pick(new_opt_state, opt_state)
    new_state = pick(new_state, state)
    return new_params, new_opt_state, new_state, StepOutput(loss, comps)


def train_step_accum(params, opt_state, state, batch, rng, tf_ratio,
                     optimizer: optax.GradientTransformation,
                     cfg: ModelConfig, accum_steps: int, conv_dtype=None,
                     prep=_promote_staged, ga_weight: float = 0.0,
                     ga_sigma: float = 0.15, ga_dur_frac=None,
                     ga_map: str = "auto"):
    """Gradient-accumulation train step: the batch is split into
    `accum_steps` microbatches scanned sequentially, so the compiled
    program's activation footprint (and the XLA program the remote
    compile helper must chew) is that of ONE microbatch while the
    optimizer update uses the full effective batch.

    Exact decomposition: every component loss is a masked mean whose
    denominator depends only on the targets, so microbatch NUMERATOR
    gradients sum to the full-batch gradient once divided by the global
    totals (see losses.component_totals). The only semantic difference
    from a monolithic step is BatchNorm: train-mode normalization uses
    per-microbatch batch statistics, and the RUNNING stats get exactly
    one momentum update per optimizer step, taken from the first
    microbatch — matching the reference's effective behavior (torch DDP
    defaults to broadcast_buffers=True, so rank 0's per-replica stats win
    with one momentum update per step). Train-mode BN never reads the
    running stats (ops/layers.batch_norm), so microbatches 1..k-1 see no
    difference from the discarded updates.
    """
    ga_weight = ga_weight if ga_sigma > 0 else 0.0  # see train_step
    # prep (staged-dtype promotion / on-device VQT) runs INSIDE the
    # microbatch body: only one microbatch's f32 spectrogram is ever live
    # (totals depend only on the targets, which prep never touches).
    sw = batch.get("sample_weight")
    totals = component_totals(batch, cfg.pad, sample_weight=sw,
                              ga=bool(ga_weight))

    def split(x):
        return x.reshape((accum_steps, x.shape[0] // accum_steps)
                         + x.shape[1:])

    micro = {k: split(v) for k, v in batch.items()}
    rngs = jax.random.split(rng, accum_steps)

    def micro_loss(p, mb, key):
        mb = prep(mb)
        outs, new_st = forward(
            p, state, mb["spectrogram"], key, cfg=cfg, train=True,
            ground_truth=_ground_truth(mb), tf_ratio=tf_ratio,
            emit_full=False, conv_dtype=conv_dtype,
            sample_weight=mb.get("sample_weight"),
            ga_sigma=(ga_sigma if ga_weight else 0.0),
            ga_dur_frac=ga_dur_frac,
            ga_content=mb.get("ga_content"), ga_map=ga_map)
        nums = fused_component_sums(outs, mb, cfg.pad,
                                    sample_weight=mb.get("sample_weight"),
                                    ga_weight=ga_weight)
        loss_mb = sum(nums[k] / totals[k] for k in sorted(nums))
        return loss_mb, (nums, new_st)

    def body(carry, xs):
        grads_acc, nums_acc = carry
        mb, key = xs
        (_, (nums, new_st)), grads = jax.value_and_grad(
            micro_loss, has_aux=True)(params, mb, key)
        grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
        nums_acc = jax.tree.map(jnp.add, nums_acc, nums)
        return (grads_acc, nums_acc), new_st

    zeros_grads = jax.tree.map(jnp.zeros_like, params)
    # Numerator dtype follows the compute dtype (f64 under jax x64) — a
    # hard-coded f32 carry would fail scan's carry-type check there.
    inp = batch.get("spectrogram", batch.get("audio"))
    num_dt = jnp.result_type(inp.dtype,
                             jax.tree.leaves(params)[0].dtype, jnp.float32)
    zeros_nums = {k: jnp.zeros((), num_dt)
                  for k in ("time_loss", "key_loss", "upper_loss",
                            "lower_loss")
                  + (("ga_loss",) if ga_weight else ())}
    (grads, nums), stacked_states = jax.lax.scan(
        body, (zeros_grads, zeros_nums), (micro, rngs))
    # One running-stat momentum update per optimizer step (microbatch 0).
    new_state = jax.tree.map(lambda s: s[0], stacked_states)

    comps = {k: nums[k] / totals[k] for k in nums}
    loss = sum(comps.values())

    gnorm = optax.global_norm(grads)
    finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)
    scale = jnp.where(gnorm > MAX_GRAD_NORM, MAX_GRAD_NORM / gnorm, 1.0)
    grads = jax.tree.map(lambda g: g * scale, grads)

    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    pick = lambda new, old: jax.tree.map(  # noqa: E731
        lambda a, b: jnp.where(finite, a, b), new, old)
    new_params = pick(new_params, params)
    new_opt_state = pick(new_opt_state, opt_state)
    new_state = pick(new_state, state)
    return new_params, new_opt_state, new_state, StepOutput(loss, comps)


def eval_step(params, state, batch, cfg: ModelConfig,
              prep=_promote_staged, decode_chunk=None):
    """Free-running inference + loss of inference outputs vs targets
    (reference: pretrain.py:131-136 — eval loss is computed on the
    free-running decode). Returns (StepOutput, predictions dict).
    decode_chunk: see models.forward — VMEM-resident chunked decode for
    large eval batches. Off by default: the decode's early-exit/length
    bookkeeping is batch-coupled, so chunking changes weak-model eval
    outputs vs the reference-parity full-batch behavior."""
    batch = prep(batch)
    outs, _ = forward(params, state, batch["spectrogram"],
                      jax.random.PRNGKey(0), cfg=cfg, train=False,
                      ground_truth=None, tf_ratio=0.0,
                      decode_chunk=decode_chunk)
    ts_logp, key_logp, up_logp, low_logp, aux = outs
    loss, comps = transcription_loss(
        outs, batch, cfg.pad, sample_weight=batch.get("sample_weight"))
    preds = {
        "time_sig": jnp.argmax(ts_logp, axis=-1),
        "key": jnp.argmax(key_logp, axis=-1),
        "upper_tokens": aux["upper_tokens"],
        "lower_tokens": aux["lower_tokens"],
        "upper_lengths": aux["upper_lengths"],
        "lower_lengths": aux["lower_lengths"],
    }
    return StepOutput(loss, comps), preds


def make_jitted_steps(optimizer: optax.GradientTransformation,
                      cfg: ModelConfig, mesh=None, accum_steps: int = 1,
                      conv_dtype=None, from_audio: bool = False,
                      vqt_cfg=None, max_frame_num: int = 1201,
                      eval_decode_chunk=None, ga_weight: float = 0.0,
                      ga_sigma: float = 0.15, ga_dur_frac=None,
                      ga_map: str = "auto"):
    """Compile the steps. With a mesh, batches are sharded along the leading
    (batch) axis of the `data` mesh axis and params/opt/state are replicated;
    XLA inserts the gradient all-reduce (psum over ICI) automatically.
    accum_steps>1 scans over that many microbatches per update
    (train_step_accum) — the batch's leading axis must be divisible by it.
    conv_dtype=jnp.bfloat16 enables mixed-precision conv-stack training
    (eval steps are unaffected — eval precision is decode_dtype's domain).
    from_audio=True makes both steps take "audio" batches and run the
    log-VQT frontend on device (make_audio_frontend).

    The eval step stays UNCHUNKED by default (eval_decode_chunk=None):
    the decoder's early-exit/length bookkeeping is batch-coupled
    (exactly like the reference's, models.py:411-419), so chunking a
    weak mid-training model's eval batch would change WER and the
    keep-best/NewBob decisions relative to the reference-parity
    behavior at the same batch size. Serving (infer.Transcriber), where
    models are trained and EOS-confident, chunks by default instead.
    Pass eval_decode_chunk="auto" (extras `eval_decode_chunk` in the
    config) to OPT IN for faster free-running validation at eval
    batches above 16 — accepting those altered coupling groups.
    Ignored under a mesh (the chunk reshape would cross shard
    boundaries; wrap in shard_map to combine, as the Transcriber does).
    """
    prep = (make_audio_frontend(vqt_cfg, max_frame_num) if from_audio
            else _promote_staged)
    if accum_steps > 1:
        t_step = partial(train_step_accum, optimizer=optimizer, cfg=cfg,
                         accum_steps=accum_steps, conv_dtype=conv_dtype,
                         prep=prep, ga_weight=ga_weight, ga_sigma=ga_sigma,
                         ga_dur_frac=ga_dur_frac, ga_map=ga_map)
    else:
        t_step = partial(train_step, optimizer=optimizer, cfg=cfg,
                         conv_dtype=conv_dtype, prep=prep,
                         ga_weight=ga_weight, ga_sigma=ga_sigma,
                         ga_dur_frac=ga_dur_frac, ga_map=ga_map)
    e_step = partial(eval_step, cfg=cfg, prep=prep,
                     decode_chunk=(None if mesh is not None
                                   else eval_decode_chunk))
    if mesh is None:
        return (jax.jit(t_step, donate_argnums=(0, 1, 2)),
                jax.jit(e_step))
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    t_jit = jax.jit(
        t_step, donate_argnums=(0, 1, 2),
        in_shardings=(repl, repl, repl, data, repl, repl),
        out_shardings=(repl, repl, repl, repl))
    # Eval predictions come back replicated: multi-host device_get on a
    # data-sharded output would fail (non-addressable shards).
    e_jit = jax.jit(e_step, in_shardings=(repl, repl, data),
                    out_shardings=(repl, repl))
    return t_jit, e_jit
