"""Training/evaluation harness — the reference's SpeechBrain ``ASR(sb.Brain)``
re-implemented natively (reference: pretrain.py:31-214, finetune.py).

Responsibilities: epoch loop with teacher-forcing decay, jitted train steps,
free-running validation with WER / macro-F1, NewBob LR annealing on WER,
keep-best-WER checkpointing with auto-resume, per-clip result JSONs, and the
plain-text train log. All device work happens in two compiled XLA programs
(train_step / eval_step); everything here is host orchestration.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np

import jax

from ..config import ExperimentConfig
from ..models import init_params, init_state
from ..parallel import make_mesh, put_batch, put_replicated
from ..utils.profiling import StepTimer, trace
from .checkpoint import Checkpointer
from .logger import FileTrainLogger
from .metrics import calculate_f1, calculate_wer, unpad
from .schedulers import NewBobScheduler, teacher_forcing_ratio
from .step import make_jitted_steps, make_optimizer, set_learning_rate


def _stage_cast(dtype, key: str = "spectrogram"):
    """Loader-thread staging cast for upload_dtype (see Trainer.fit).

    uint8 staging quantizes the [0,1] log-VQT to 1/255 steps (0.31 dB on
    the 80 dB scale); the clip guards degenerate inputs — real
    spectrograms are in-range by construction (ops/vqt.log_compress).
    int16 staging (audio batches) uses the PCM16 scale the device
    conversion inverts exactly (train/step.make_audio_frontend) — the
    fidelity a 16-bit WAV source had anyway."""
    def transform(batch):
        batch = dict(batch)
        a = batch[key]
        if dtype == np.uint8:
            a = np.round(np.clip(a, 0.0, 1.0) * 255.0).astype(np.uint8)
        elif dtype == np.int16:
            if a.dtype != np.int16:
                from ..utils.audio import to_pcm16
                a = to_pcm16(a)
        else:
            a = np.asarray(a, dtype)
        batch[key] = a
        return batch
    return transform


class Trainer:
    def __init__(self, exp: ExperimentConfig, use_mesh: bool = False,
                 n_devices: Optional[int] = None):
        self.exp = exp
        self.cfg = exp.model_config()
        self.mesh = make_mesh(n_devices) if use_mesh else None

        seed_key = jax.random.PRNGKey(exp.seed)
        k_init, self.rng = jax.random.split(seed_key)
        self.params = init_params(k_init, self.cfg)
        self.state = init_state(self.cfg)
        self.optimizer = make_optimizer(
            lr=exp.lr, rho=float(exp.extras.get("rho", 0.95)),
            eps=float(exp.extras.get("eps", 1e-8)))
        self.opt_state = self.optimizer.init(self.params)
        # Gradient accumulation: microbatch the train step so its activation
        # footprint stays bounded — a monolithic full-size backward OOMs HBM
        # beyond B=8 (ConvStack activations are ~1.9 GB per batch element;
        # docs/DESIGN.md §7). accum_steps must divide batch_size.
        self.accum_steps = int(exp.extras.get("accum_steps", 1))
        if exp.batch_size % max(self.accum_steps, 1):
            raise ValueError(
                f"accum_steps={self.accum_steps} must divide "
                f"batch_size={exp.batch_size}")
        # Mixed-precision conv-stack training (extras: train_dtype:
        # bfloat16). f32 decoder/losses/params; see step.py / DESIGN §2b.
        self.conv_dtype = None
        train_dtype = exp.extras.get("train_dtype")
        if train_dtype not in (None, "", "float32", "f32"):
            import jax.numpy as jnp
            try:
                self.conv_dtype = {"bfloat16": jnp.bfloat16,
                                   "bf16": jnp.bfloat16}[str(train_dtype)]
            except KeyError:
                raise ValueError(
                    f"train_dtype={train_dtype!r}: supported values are "
                    f"'bfloat16' (or 'float32' for the default)") from None
        # Reduced-precision batch staging (measured on the tunnel-attached
        # v5e: the per-step host->device spectrogram upload does NOT
        # overlap device compute — transfers and compute serialize — and
        # costs ~100 ms per 18 MB microbatch, ~40% of the step). When the
        # conv stack already computes in bf16, the spectrogram upload can
        # shrink: float16 halves it (quantization 2^-11, below bf16's own
        # rounding 2^-8); uint8 — the default — quarters it, exploiting
        # the log-VQT's exact [0,1] range (0.31 dB quantization steps on
        # the 80 dB log scale; measured interleaved at the recommended
        # config: u8 51-54 vs f16 33-43 clips/s). The train step converts
        # back to f32 on device (train/step._promote_staged). f32 training
        # keeps f32 uploads (parity). Select with extras `upload_dtype:
        # uint8|float16|float32` (legacy `upload_f16: true/false` maps to
        # float16/float32).
        # Training from raw audio (extras `input_features: audio`): the
        # log-VQT frontend runs on device inside the train/eval steps
        # (train/step.make_audio_frontend); datasets must be built with
        # the same input_features so batches carry "audio".
        feats = str(exp.extras.get("input_features", "spectrogram"))
        if feats not in ("spectrogram", "audio"):
            raise ValueError(f"input_features={feats!r}: "
                             f"'spectrogram' or 'audio'")
        self.from_audio = feats == "audio"
        self.feature_key = feats
        self.upload_dtype = None
        if self.from_audio:
            # Audio batches default to int16 staging (the serving
            # contract: exact for 16-bit PCM sources, half the bytes).
            choice = exp.extras.get("upload_dtype", "int16")
            try:
                self.upload_dtype = {
                    "float32": None, "f32": None,
                    "int16": np.int16, "i16": np.int16}[str(choice)]
            except KeyError:
                raise ValueError(
                    f"upload_dtype={choice!r}: audio batches support "
                    f"'int16' or 'float32'") from None
        else:
            # Spectrogram batches: bf16 training defaults to uint8
            # staging; f32 training defaults to f32 uploads (parity) but
            # an EXPLICIT upload_dtype is honored — and validated — in
            # both modes (a typo'd or ignored knob must never pass
            # silently while the user believes staging is active).
            choice = exp.extras.get("upload_dtype")
            if choice is None:
                legacy = exp.extras.get("upload_f16")
                if legacy is not None:
                    choice = "float16" if legacy else "float32"
                elif self.conv_dtype is not None:
                    choice = "uint8"
            if choice is not None:
                try:
                    self.upload_dtype = {
                        "float32": None, "f32": None,
                        "float16": np.float16, "f16": np.float16,
                        "uint8": np.uint8, "u8": np.uint8}[str(choice)]
                except KeyError:
                    raise ValueError(
                        f"upload_dtype={choice!r}: supported values are "
                        f"'uint8', 'float16', 'float32'") from None
        # Opt-in faster free-running validation (extras
        # `eval_decode_chunk: auto` or an int): VMEM-resident chunked
        # decode for eval batches above the chunk — OFF by default
        # because the decode's batch-coupled early exit then differs
        # from the reference's full-batch behavior (step.py docstring).
        edc = exp.extras.get("eval_decode_chunk")
        if edc is not None and edc != "auto":
            edc = int(edc)
        # Guided attention (extras `guided_attention: <weight>`): opt-in
        # diagonal attention prior on the note decoders for synthetic
        # pretraining — content-based attention otherwise spends many
        # thousands of steps diffuse before aligning (docs/DESIGN.md §11).
        # OFF by default: the reference has no such term; validation/WER,
        # parity and eval paths are untouched either way.
        self.ga_weight = float(exp.extras.get("guided_attention", 0.0))
        self.ga_sigma = float(exp.extras.get("guided_attention_sigma",
                                             0.15))
        if self.ga_weight > 0 and self.ga_sigma <= 0:
            raise ValueError(
                "extras guided_attention > 0 requires "
                "guided_attention_sigma > 0 (a zero-width guide is no "
                f"guide); got sigma={self.ga_sigma}")
        # (vocab,) whole-note fraction per DURATION token id (0 for
        # pitch/separator/control ids): lets the guide place each step's
        # expected attention center at its token's CUMULATIVE bar-time
        # fraction — exact for proportional-to-duration renderings —
        # instead of the linear token-index approximation.
        self.ga_dur_frac = (_duration_fraction_table(self.cfg.vocab_size)
                            if self.ga_weight else None)
        # Which within-bar time map the guide uses (extras
        # `guided_attention_map`): 'auto' per-row dispatch for mixed
        # batches; 'events' for real-pipeline/chordal targets (auto
        # cannot tell a single-chord bar from a legacy '<b>'-joined
        # stream — models.ga_within_bar_map); 'tokens' for the legacy
        # chord-free synth streams.
        self.ga_map = str(exp.extras.get("guided_attention_map", "auto"))
        if self.ga_map not in ("auto", "events", "tokens"):
            raise ValueError(
                "extras guided_attention_map must be auto|events|tokens; "
                f"got {self.ga_map!r}")
        self.train_step, self.eval_step = make_jitted_steps(
            self.optimizer, self.cfg, mesh=self.mesh,
            accum_steps=self.accum_steps, conv_dtype=self.conv_dtype,
            from_audio=self.from_audio, vqt_cfg=exp.vqt_config(),
            max_frame_num=exp.max_frame_num, eval_decode_chunk=edc,
            ga_weight=self.ga_weight, ga_sigma=self.ga_sigma,
            ga_dur_frac=self.ga_dur_frac, ga_map=self.ga_map)
        # Length-bucketed train steps: the decode scan length is static, so
        # batches whose longest target is far below the 398/189 caps run a
        # shorter compiled variant (loss/gradient-exact: positions past the
        # batch max are all <pad>). 0 disables bucketing.
        self.bucket_tokens = int(exp.extras.get("bucket_tokens", 64))
        self._bucket_steps = {}
        # Profiling (SURVEY §5): per-step wall-clock timing + an XLA trace
        # of the first few steps, enabled with --profile / extras.profile.
        self.profile = bool(exp.extras.get("profile", False))
        self.profile_trace_steps = int(
            exp.extras.get("profile_trace_steps", 3))
        self.step_timer = StepTimer() if self.profile else None

        self.scheduler = NewBobScheduler(
            initial_value=exp.lr, annealing_factor=exp.annealing_factor,
            improvement_threshold=exp.improvement_threshold,
            patient=exp.patient)
        # Multi-host: only process 0 writes checkpoints/results/logs
        # (shared-filesystem safety; all hosts compute identically).
        self.is_main_process = jax.process_index() == 0
        # Multi-host correctness rests on every host constructing the SAME
        # global batch (device_put with a global sharding takes each host's
        # local shards from ITS copy of the array) — same DataLoader seed,
        # same dataset listing order. Verified cross-host on the first batch
        # rather than assumed (SURVEY §2.4).
        self._batch_contract_ok = jax.process_count() == 1
        self.checkpointer = Checkpointer(exp.save_folder)
        self.logger = FileTrainLogger(exp.train_log)
        self.start_epoch = 1
        self.global_step = 0
        self.train_stats: Dict[str, Any] = {"loss": -1}

        if self.mesh is not None:
            self._replicate()

    # ------------------------------------------------------------------ util

    def _replicate(self):
        self.params = put_replicated(self.params, self.mesh)
        self.state = put_replicated(self.state, self.mesh)
        self.opt_state = put_replicated(self.opt_state, self.mesh)

    def _device_batch(self, batch: Dict[str, Any],
                      train: bool = False) -> Dict[str, Any]:
        dev = {k: v for k, v in batch.items()
               if k not in ("names", "versions", "n_real", "local_rows")}
        if train and self.upload_dtype is not None:
            # Shrink the host->device bytes for the dominant batch array;
            # the train step converts back to f32 at entry (train/step.py).
            # Eval batches stay as loaded: validation WER is a parity
            # surface. No-op when the loader's transform already cast it.
            k = self.feature_key
            if dev[k].dtype != self.upload_dtype:
                dev[k] = _stage_cast(self.upload_dtype, k)({k: dev[k]})[k]
        # Zero-weight the final batch's padding duplicates so they add
        # nothing to losses/gradients (shapes stay static & mesh-divisible)
        # and are masked out of train-mode BatchNorm batch statistics
        # (ops/layers.batch_norm weighted stats).
        b = len(batch["names"])
        n_real = int(batch.get("n_real", b))
        weights = np.zeros(b, np.float32)
        weights[:n_real] = 1.0
        dev["sample_weight"] = weights
        local_rows = batch.get("local_rows")
        if not self._batch_contract_ok:
            if local_rows is None:
                self._assert_hosts_agree(dev)
            else:
                # Per-host sharded loading: the heavy feature arrays
                # (spectrogram/audio) differ by design; the cross-host
                # contract is the GLOBAL surface — targets, weights, and
                # the batch plan (names/versions).
                meta = {k: v for k, v in dev.items()
                        if k not in ("spectrogram", "audio")}
                meta["names"] = np.frombuffer(
                    "\x00".join(map(str, batch["names"])).encode(),
                    np.uint8)
                meta["versions"] = np.frombuffer(
                    "\x00".join(map(str, batch["versions"])).encode(),
                    np.uint8)
                self._assert_hosts_agree(meta)
            self._batch_contract_ok = True
        if local_rows is not None:
            if self.mesh is None:
                raise ValueError("per-host sharded batches require a mesh "
                                 "(use_mesh=True)")
            from ..parallel import put_batch_process_local
            dev = put_batch_process_local(dev, self.mesh, local_rows)
        elif self.mesh is not None:
            dev = put_batch(dev, self.mesh)
        return dev

    @staticmethod
    def barrier(tag: str) -> None:
        """Cross-process rendezvous (no-op single-process). Used wherever
        non-main processes must not read checkpoint state that process 0
        may still be writing/deleting."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(tag)

    @staticmethod
    def _assert_hosts_agree(host_batch: Dict[str, Any]) -> None:
        """Cross-host collective check that all processes built an identical
        batch; fails loudly instead of silently training on garbage shards."""
        import hashlib

        from jax.experimental import multihost_utils

        digest = {}
        for k in sorted(host_batch):
            v = np.ascontiguousarray(np.asarray(host_batch[k]))
            h = hashlib.sha256(v.tobytes()).digest()
            # uint32 pairs: multihost_utils' broadcast reinterprets wider
            # dtypes on the CPU (gloo) backend, corrupting the comparison.
            digest[k] = np.frombuffer(h[:8], np.uint32)
        multihost_utils.assert_equal(
            digest,
            "multi-host batch mismatch: every host must construct the same "
            "global batch (identical DataLoader seed and dataset listing "
            "order)")

    # ------------------------------------------------------------ checkpoint

    def _trees(self):
        return {"params": self.params, "state": self.state,
                "opt_state": self.opt_state}

    def _host_state(self, epoch: int):
        return {"scheduler": self.scheduler.state_dict(), "epoch": epoch,
                "global_step": self.global_step}

    def save_checkpoint(self, epoch: int, meta: Dict[str, Any]):
        if not self.is_main_process:
            return
        self.checkpointer.save_and_keep_only(
            self._trees(), meta, self._host_state(epoch), min_keys=("WER",))

    def restore(self, path: str):
        trees, host_state, meta = self.checkpointer.load(path, self._trees())
        self.params = trees["params"]
        self.state = trees["state"]
        if host_state.get("fresh_optimizer"):
            # Warm-start import (Checkpointer.import_from): the reference
            # excludes the optimizer from its recoverables, so finetune's
            # first epoch runs a fresh Adadelta at the config lr rather
            # than the pretrain run's annealed accumulators. Intra-run
            # resumes (checkpoints saved by THIS harness) restore the
            # full optimizer state — a deliberate improvement over the
            # reference's fresh-optimizer-on-resume (docs/DESIGN.md §5).
            self.opt_state = self.optimizer.init(self.params)
        else:
            self.opt_state = trees["opt_state"]
        if host_state.get("scheduler"):
            self.scheduler.load_state_dict(host_state["scheduler"])
        self.start_epoch = int(host_state.get("epoch", 0)) + 1
        self.global_step = int(host_state.get("global_step", 0))
        if self.mesh is not None:
            self._replicate()
        return meta

    def try_resume(self) -> bool:
        path = self.checkpointer.latest_path()
        if path is None:
            return False
        self.restore(path)
        return True

    # ------------------------------------------------------------ bucketing

    def _bucketed(self, batch):
        """Pick a compiled train step whose decode-scan length covers this
        batch's longest target (rounded up to bucket_tokens), and slice the
        target arrays accordingly. Exact: sliced-away positions are <pad>."""
        if self.bucket_tokens <= 0:
            return batch, self.train_step
        q = self.bucket_tokens
        t_up, t_low = self.cfg.max_length

        def bucket(lengths, cap):
            need = int(np.max(lengths)) + 1  # + EOS position
            return min(-(-need // q) * q, cap)

        bu = bucket(batch["upper_lengths"], t_up)
        bl = bucket(batch["lower_lengths"], t_low)
        if (bu, bl) == (t_up, t_low):
            return batch, self.train_step
        key = (bu, bl)
        if key not in self._bucket_steps:
            import dataclasses
            cfg_b = dataclasses.replace(self.cfg, max_length=(bu, bl))
            self._bucket_steps[key] = make_jitted_steps(
                self.optimizer, cfg_b, mesh=self.mesh,
                accum_steps=self.accum_steps,
                conv_dtype=self.conv_dtype,
                from_audio=self.from_audio,
                vqt_cfg=self.exp.vqt_config(),
                max_frame_num=self.exp.max_frame_num,
                ga_weight=self.ga_weight, ga_sigma=self.ga_sigma,
                ga_dur_frac=self.ga_dur_frac, ga_map=self.ga_map)[0]
        batch = dict(batch)
        batch["upper"] = batch["upper"][:, :, :bu]
        batch["lower"] = batch["lower"][:, :, :bl]
        return batch, self._bucket_steps[key]

    # ------------------------------------------------------------------ fit

    def fit(self, train_loader, valid_loader,
            epochs: Optional[int] = None) -> None:
        epochs = epochs or self.exp.number_of_epochs
        if (self.upload_dtype is not None
                and getattr(train_loader, "transform", "absent") is None):
            # Do the staging cast where batches are built (the loader's
            # prefetch thread) so the ~tens-of-ms host cast/quantization
            # of each batch overlaps device compute; _device_batch's
            # fallback cast then no-ops.
            train_loader.transform = _stage_cast(self.upload_dtype,
                                                 self.feature_key)
        self.try_resume()
        for epoch in range(self.start_epoch, epochs + 1):
            tf = teacher_forcing_ratio(self.exp.teacher_forcing_ratio,
                                       self.exp.teacher_forcing_decay, epoch)
            t0 = time.time()
            losses, comps_hist = [], []
            epoch_mark = (self.step_timer.mark()
                          if self.step_timer is not None else None)

            def one_step(batch):
                self.rng, step_key = jax.random.split(self.rng)
                batch, step = self._bucketed(batch)
                dev = self._device_batch(batch, train=True)
                if self.step_timer is None:
                    self.params, self.opt_state, self.state, out = \
                        step(self.params, self.opt_state, self.state,
                             dev, step_key, tf)
                else:
                    # Timing requires a device sync per step; only pay it
                    # when profiling is on.
                    with self.step_timer.time("train_step") as c:
                        self.params, self.opt_state, self.state, out = \
                            step(self.params, self.opt_state, self.state,
                                 dev, step_key, tf)
                        c["loss"] = out.loss
                self.global_step += 1
                # Keep loss/components ON DEVICE during the epoch: a
                # per-step device_get would block the host on every step
                # and forfeit async dispatch (the prefetching loader's
                # whole point). One transfer at epoch end instead.
                losses.append(out.loss)
                comps_hist.append(out.components)

            batches = iter(train_loader)
            if (self.profile and epoch == self.start_epoch
                    and self.profile_trace_steps > 0
                    and self.is_main_process):
                import itertools
                trace_dir = os.path.join(self.exp.output_folder, "profile")
                with trace(trace_dir):
                    for batch in itertools.islice(
                            batches, self.profile_trace_steps):
                        one_step(batch)
            for batch in batches:
                one_step(batch)
            losses = [float(x) for x in jax.device_get(losses)]
            comps_hist = jax.device_get(comps_hist)
            self.train_stats = {
                "loss": float(np.mean(losses)) if losses else -1.0,
                **{k: float(np.mean([c[k] for c in comps_hist]))
                   for k in (comps_hist[0] if comps_hist else {})},
                "teacher_forcing_ratio": tf,
            }

            stage_stats = self._eval_stage(valid_loader, "valid", epoch)
            old_lr, new_lr = self.scheduler(stage_stats["WER"])
            self.opt_state = set_learning_rate(self.opt_state, new_lr)
            if self.is_main_process:
                stats_meta = {"epoch": epoch, "lr": old_lr,
                              "epoch_time": round(time.time() - t0, 1)}
                if self.step_timer is not None:
                    # THIS epoch's mean only — a cumulative mean would
                    # stay contaminated by epoch 1's compiles forever.
                    summ = self.step_timer.summary(
                        since=epoch_mark).get("train_step")
                    if summ:
                        stats_meta["step_ms"] = round(
                            summ["mean_s"] * 1e3, 2)
                self.logger.log_stats(
                    stats_meta=stats_meta,
                    train_stats=self.train_stats, valid_stats=stage_stats)
            self.save_checkpoint(epoch, {"loss": stage_stats["loss"],
                                         "WER": stage_stats["WER"]})
        if self.step_timer is not None and self.is_main_process:
            prof_dir = os.path.join(self.exp.output_folder, "profile")
            os.makedirs(prof_dir, exist_ok=True)
            with open(os.path.join(prof_dir, "step_times.json"), "w") as f:
                json.dump(self.step_timer.summary(), f, indent=2)

    # ------------------------------------------------------------- evaluate

    def evaluate(self, test_loader, min_key: str = "WER"):
        # Multi-host: wait for process 0's final save_and_keep_only (write
        # + delete of non-best checkpoints) before any host reads
        # best_path — otherwise hosts can restore different (or vanishing)
        # checkpoints into one global mesh.
        self.barrier("evaluate:before-restore")
        path = self.checkpointer.best_path(min_key)
        if path is not None:
            self.restore(path)
        stage_stats = self._eval_stage(test_loader, "test", epoch=None)
        if self.is_main_process:
            self.logger.log_stats(stats_meta={"stage": "test"},
                                  test_stats=stage_stats)
        return stage_stats

    # ------------------------------------------------------------ eval core

    def _eval_stage(self, loader, split: str, epoch):
        """Free-running decode over the loader; WER/F1; result JSONs
        (reference: pretrain.py:95-214). Returns the stage stats dict."""
        upper_pred, upper_tgt = {}, {}
        lower_pred, lower_tgt = {}, {}
        key_pred, key_tgt = {}, {}
        ts_pred, ts_tgt = {}, {}
        losses, comps_hist = [], []
        time_sig_list = _load_time_sig_list()

        for batch in loader:
            dev = self._device_batch(batch)
            out, preds = self.eval_step(self.params, self.state, dev)
            # Predictions are needed on host per batch anyway; fetch loss,
            # components, and predictions in ONE transfer.
            out, preds = jax.device_get((out, preds))
            losses.append(float(out.loss))
            comps_hist.append({k: float(v)
                               for k, v in out.components.items()})
            n_real = batch.get("n_real", len(batch["names"]))
            for b in range(n_real):
                id_ = f"{batch['versions'][b]}~{batch['names'][b]}"
                upper_pred[id_] = [unpad(p).tolist()
                                   for p in preds["upper_tokens"][b]]
                upper_tgt[id_] = [unpad(t).tolist()
                                  for t in batch["upper"][b]]
                lower_pred[id_] = [unpad(p).tolist()
                                   for p in preds["lower_tokens"][b]]
                lower_tgt[id_] = [unpad(t).tolist()
                                  for t in batch["lower"][b]]
                key_pred[id_] = preds["key"][b].tolist()
                key_tgt[id_] = np.asarray(batch["key"][b]).tolist()
                ts_pred[id_] = preds["time_sig"][b].tolist()
                ts_tgt[id_] = np.asarray(batch["time_sig"][b]).tolist()

        wer_upper, wer_upper_d = calculate_wer(upper_pred, upper_tgt)
        wer_lower, wer_lower_d = calculate_wer(lower_pred, lower_tgt)
        key_f1, key_f1_d = calculate_f1(key_pred, key_tgt)
        time_f1, time_f1_d = calculate_f1(ts_pred, ts_tgt)
        stage_stats = {
            "loss": float(np.mean(losses)) if losses else -1.0,
            **{k: float(np.mean([c[k] for c in comps_hist]))
               for k in (comps_hist[0] if comps_hist else {})},
            "key_f1": key_f1, "time_f1": time_f1,
            "WER_upper": wer_upper, "WER_lower": wer_lower,
            "WER": (wer_upper + wer_lower) / 2,
        }

        # Per-clip result JSONs (reference: pretrain.py:189-214).
        if not self.is_main_process:
            return stage_stats
        results_dir = os.path.join(self.exp.output_folder, "results", split)
        os.makedirs(results_dir, exist_ok=True)
        for id_ in upper_pred:
            pred = []
            for i in range(len(upper_pred[id_])):
                pred.append([key_pred[id_][i] - 6,
                             time_sig_list[ts_pred[id_][i]],
                             lower_pred[id_][i], upper_pred[id_][i]])
            parts = id_.split("~")
            version = parts[0]
            chunk_name = parts[1] if len(parts) > 1 else id_
            soundfont = parts[2] if len(parts) > 2 else ""
            style = "classical" if chunk_name[:1].islower() else "pop"
            # ASAP features have no version subdirectory, and finetune's
            # valid split IS the test split (reference: finetune.py:261-263;
            # its records point at nonexistent 'asap~'-prefixed targets — a
            # bug we fix rather than reproduce).
            if version == "asap":
                version_dir, feat_split = "", "test"
            else:
                version_dir, feat_split = str(version), split
            info_path = os.path.join(self.exp.feature_folder, feat_split,
                                     version_dir, "info",
                                     f"{chunk_name}.json")
            composer = "unknown"
            if os.path.exists(info_path):
                with open(info_path) as f:
                    composer = json.load(f).get("composer", "unknown")
            target_path = os.path.join(self.exp.feature_folder, feat_split,
                                       version_dir, "target",
                                       f"{chunk_name}.pkl")
            result = {"style": style, "soundfont": soundfont,
                      "composer": composer, "target_path": target_path,
                      "pred": pred,
                      "wer_upper": wer_upper_d[id_],
                      "wer_lower": wer_lower_d[id_],
                      "key_f1": key_f1_d[id_],
                      "time_f1": time_f1_d[id_]}
            with open(os.path.join(results_dir, f"{id_}.json"), "w") as f:
                json.dump(result, f, indent=2)
        return stage_stats


def _duration_fraction_table(vocab_size: int):
    """(vocab,) float32: whole-note fraction per duration token id
    ("4" -> 1/4, "8." -> 1.5/8, tuplet values like "12" -> 1/12), zero
    for pitch/separator/control ids — the guided-attention guide's
    bar-time map (models.note_decoder_dual_scan ga_dur_frac)."""
    import re

    from ..symbolic.vocab import LabelsMultiple

    table = np.zeros(vocab_size, np.float32)
    for tok, idx in LabelsMultiple(extended=True).labels_map.items():
        m = re.fullmatch(r"(\d+)(\.*)", tok)
        if m and idx < vocab_size:
            frac = 1.0 / max(int(m.group(1)), 1)
            table[idx] = frac * (2.0 - 0.5 ** len(m.group(2)))
    return table


def _load_time_sig_list():
    from ..data.datasets import load_time_signatures
    return load_time_signatures()
