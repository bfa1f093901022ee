"""End-to-end inference: audio -> VQT -> model -> per-bar score structure.

The complete audio-to-score slice (SURVEY.md §7 minimum slice): a 12 s clip
becomes the reference's target structure ``[[key, time_sig, lower_tokens,
upper_tokens], ...]`` ready for Kern/MusicXML/MIDI export.

Serving path: ``transcribe_stream`` keeps several batches in flight on the
device (async dispatch pipelining), fusing the VQT frontend and the model
into one XLA program per batch — host upload, device compute, and host
postprocessing of different batches overlap. This is the configuration
bench.py measures; ``transcribe``/``transcribe_batch`` are the simple
blocking calls.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .data.datasets import load_time_signatures
from .utils.audio import PCM16_SCALE
from .models import ModelConfig
from .models.score_transcription import forward
from .ops.vqt import VQTConfig, build_kernels, get_vqt
from .train.metrics import unpad


class Transcriber:
    """Holds compiled inference state for repeated transcription calls."""

    def __init__(self, params, state, cfg: ModelConfig = ModelConfig(),
                 vqt_cfg: VQTConfig = VQTConfig(),
                 max_frame_num: int = 1201, decode_dtype=None,
                 use_mesh: bool = False, decode_chunk="auto"):
        """use_mesh=True shards inference batches over all devices (data
        parallelism for serving); params are replicated.

        decode_chunk (default "auto"): decode the batch in chunks whose
        attention operands stay VMEM-resident across the sequential
        decode steps — ~2x full-length f32 decode at batch 64.
        Token-identical on trained (EOS-confident) models; on weak
        models the decoder's batch-coupled early-exit bookkeeping makes
        chunked output differ from unchunked in the same way batch
        composition itself does (see models.forward). Under use_mesh
        the forward runs per-device via shard_map and the chunk is
        picked against each device's LOCAL shard. Pass None to disable
        explicitly."""
        self.cfg = cfg
        self.vqt_cfg = vqt_cfg
        self.max_frame_num = max_frame_num
        self.kernels = tuple(map(jnp.asarray, build_kernels(vqt_cfg)))
        self.time_sig_list = load_time_signatures()
        self.mesh = None
        self._batch_sharding = None
        if use_mesh:
            from .parallel import make_mesh, put_replicated, shard_batch
            self.mesh = make_mesh()
            params = put_replicated(params, self.mesh)
            state = put_replicated(state, self.mesh)
            self._batch_sharding = shard_batch(self.mesh)
        self.params = params
        self.state = state

        def infer(params, state, spec_batch):
            (ts, key, up, low, aux), _ = forward(
                params, state, spec_batch, jax.random.PRNGKey(0), cfg=cfg,
                train=False, decode_dtype=decode_dtype,
                decode_chunk=decode_chunk)
            # Compact device->host payload: token ids < 173 and class ids
            # < 14 fit in uint8, lengths <= 398 in int16 — 4x fewer token
            # download bytes (7.5 -> 1.9 MB per 64-batch). Transfers do
            # not overlap compute on this platform (docs/DESIGN.md §2a),
            # so download bytes sit directly on the serving critical path.
            return (jnp.argmax(ts, -1).astype(jnp.uint8),
                    jnp.argmax(key, -1).astype(jnp.uint8),
                    aux["upper_tokens"].astype(jnp.uint8),
                    aux["lower_tokens"].astype(jnp.uint8),
                    aux["upper_lengths"].astype(jnp.int16),
                    aux["lower_lengths"].astype(jnp.int16))

        if self.mesh is not None:
            # Multi-device serving: shard_map the WHOLE forward — every
            # clip's math is device-local (eval-mode BN reads running
            # stats; attention/decode are per-clip), so each device runs
            # the full per-shard program with no collectives, and the
            # chunked decode picks its chunk against the LOCAL shard
            # (the reason a plain jit couldn't chunk: the global chunk
            # reshape would cross shard boundaries).
            from jax.sharding import PartitionSpec as P

            def wrap(f):
                return jax.jit(jax.shard_map(
                    f, mesh=self.mesh,
                    in_specs=(P(), P(), P("data")), out_specs=P("data"),
                    check_vma=False))
        else:
            wrap = jax.jit
        self._infer = wrap(infer)

        def infer_audio(params, state, audio_batch):
            # Fused frontend+model: the VQT rides in the same XLA program
            # as the forward pass, so per-batch host traffic is raw audio
            # (0.77 MB/clip) instead of a spectrogram (2.3 MB/clip).
            # int16 PCM input halves that again: converted on device with
            # read_wav's exact /32768 scale, so a 16-bit WAV transcribes
            # bit-identically to its float32 decoding.
            if audio_batch.dtype == jnp.int16:
                audio_batch = (audio_batch.astype(jnp.float32)
                               / PCM16_SCALE)
            spec = get_vqt(audio_batch, self.kernels, self.vqt_cfg)
            t = spec.shape[1]
            if t >= max_frame_num:
                spec = spec[:, :max_frame_num]
            else:
                spec = jnp.pad(spec, ((0, 0), (0, max_frame_num - t),
                                      (0, 0)))
            return infer(params, state, spec[:, None, :, :])

        self._infer_audio = wrap(infer_audio)

    # -- frontend -----------------------------------------------------------

    @property
    def max_samples(self) -> int:
        return (self.max_frame_num - 1) * self.vqt_cfg.hop_length

    def _prep_audio(self, audio: np.ndarray) -> np.ndarray:
        """Mono audio -> fixed-length (max_samples,) float32 — or int16,
        preserved so the stream path uploads half the bytes and converts
        on device (see infer_audio). Shared contract with the dataset
        audio mode (utils.audio.trim_pad_audio)."""
        from .utils.audio import trim_pad_audio
        return trim_pad_audio(audio, self.max_samples)

    @staticmethod
    def _to_float(audio: np.ndarray) -> np.ndarray:
        """int16 PCM -> float32 with read_wav's exact scale; float passes
        through (utils.audio.pcm16_to_float)."""
        from .utils.audio import pcm16_to_float
        return pcm16_to_float(audio)

    def spectrogram(self, audio: np.ndarray) -> np.ndarray:
        """12 s-max mono audio @ model sample rate -> (1, T, bins).

        Utility for inspecting the model's input (e.g. notebooks,
        spectrogram caches); the inference paths no longer call it —
        they feed raw audio to the fused VQT+model program instead."""
        spec = np.asarray(get_vqt(self._to_float(self._prep_audio(audio)),
                                  self.kernels, self.vqt_cfg))
        out = np.zeros((self.max_frame_num, spec.shape[-1]), np.float32)
        out[: spec.shape[0]] = spec[: self.max_frame_num]
        return out[None]

    # -- inference ----------------------------------------------------------

    def transcribe_batch(self, audio_batch: Sequence[np.ndarray],
                         timings: Optional[dict] = None
                         ) -> List[List[list]]:
        """List of mono clips -> list of per-clip target structures.

        One fused VQT+model device call for the whole batch (the same
        program the stream uses; clips upload as audio — int16 preserved
        — and the frontend runs on device). The pre-round-3 version
        computed spectrograms host-side one clip at a time: a device
        round-trip PER CLIP (~50-70 ms each under the tunnel) that
        capped the HTTP server's dynamic batches at ~6 clips/s.

        Batches are padded to the next power of two so repeated calls with
        varying batch sizes reuse a handful of compiled programs.

        `timings` (optional dict) accumulates per-phase seconds under
        keys "host_prep_s" (stack/pad/resample), "device_s" (dispatch +
        upload + compute + download under the tunnel — these serialize,
        docs/DESIGN.md §2a) and "postprocess_s" (token -> target
        structures) — the serving profiler's hook (serve.py /stats).

        The two halves are public on their own: `prepare_batch` (the
        host-side work, safe to run on a DIFFERENT thread) +
        `transcribe_prepared` (the device call) let the HTTP server
        double-buffer — prepare batch N+1 while N runs on the chip
        (serve.py's prefetch thread; measured +~10% at batch ~26)."""
        t0 = time.monotonic()
        specs, n = self.prepare_batch(audio_batch)
        if timings is not None:
            timings["host_prep_s"] = (timings.get("host_prep_s", 0.0)
                                      + time.monotonic() - t0)
        return self.transcribe_prepared(specs, n, timings=timings)

    def prepare_batch(self, audio_batch: Sequence[np.ndarray]):
        """Host-side half of transcribe_batch: stack/trim/pad clips and
        pad the batch to the program's size classes. Returns (specs, n);
        thread-safe (touches no device state), so a server can run it
        concurrently with a device call on another batch."""
        from .utils.audio import stack_audio_batch
        specs = stack_audio_batch([self._prep_audio(a)
                                   for a in audio_batch])
        n = len(audio_batch)
        padded = max(1, 1 << (n - 1).bit_length())
        if self.mesh is not None:
            # The batch must DIVIDE by the mesh (shard_map hard-errors
            # otherwise) — round up to a multiple of the device count,
            # which also covers non-power-of-two meshes (e.g. 6 devices).
            n_dev = self.mesh.devices.size
            padded = -(-max(padded, n_dev) // n_dev) * n_dev
        if padded != n:
            specs = np.concatenate(
                [specs, np.repeat(specs[-1:], padded - n, axis=0)])
        return specs, n

    def transcribe_prepared(self, specs, n: int,
                            timings: Optional[dict] = None
                            ) -> List[List[list]]:
        """Device half of transcribe_batch: one fused VQT+model call on a
        prepare_batch output, then token decode."""
        if self._batch_sharding is not None:
            specs = jax.device_put(specs, self._batch_sharding)
        t1 = time.monotonic()
        arrays = jax.device_get(self._infer_audio(self.params, self.state,
                                                  specs))
        t2 = time.monotonic()
        out = self._postprocess(arrays, n)
        if timings is not None:
            t3 = time.monotonic()
            for k, v in (("device_s", t2 - t1), ("postprocess_s", t3 - t2)):
                timings[k] = timings.get(k, 0.0) + v
        return out

    def _postprocess(self, arrays, n: int) -> List[List[list]]:
        """Device outputs -> first n clips' per-bar target structures."""
        ts, key, up, low, _, _ = arrays
        out = []
        for b in range(n):
            bars = []
            for m in range(self.cfg.max_bars):
                bars.append([
                    int(key[b, m]) - 6,
                    self.time_sig_list[int(ts[b, m])],
                    unpad(low[b, m]).tolist(),
                    unpad(up[b, m]).tolist(),
                ])
            out.append(bars)
        return out

    def transcribe(self, audio: np.ndarray) -> List[list]:
        return self.transcribe_batch([audio])[0]

    def transcribe_stream(self, clips: Iterable[np.ndarray],
                          batch_size: int = 16,
                          depth: int = 3) -> Iterator[List[list]]:
        """Pipelined serving: yields each clip's target structure in input
        order while keeping up to `depth` batches in flight on the device.

        Async dispatch overlaps the host work (audio prep, upload, token
        postprocessing) of one batch with device compute of the others —
        measured both slightly faster than blocking calls and far more
        robust to transfer-latency hiccups (docs/DESIGN.md §7: the tunnel
        study behind bench.py's depth-3 loop, now shipped here). All
        batches run at `batch_size` (the final one padded by repeating its
        last clip) so one compiled program serves the whole stream.

        Clips may be float arrays or raw int16 PCM (e.g. from
        utils.audio.read_wav_pcm16): int16 batches upload half the bytes
        and are converted on device with read_wav's exact /32768 scale,
        so 16-bit WAV sources transcribe bit-identically either way.
        """
        # Validate at CALL time (this wrapper is not a generator), so a
        # misconfiguration raises where it happens, not at the consumer's
        # first next().
        if batch_size <= 0 or depth < 0:
            raise ValueError("batch_size must be >0 and depth >=0")
        if self.mesh is not None and batch_size % self.mesh.devices.size:
            raise ValueError(
                f"batch_size={batch_size} must divide the "
                f"{self.mesh.devices.size}-device mesh")
        return self._stream(clips, batch_size, depth)

    def _stream(self, clips, batch_size: int,
                depth: int) -> Iterator[List[list]]:
        inflight: deque = deque()

        def batches():
            buf: List[np.ndarray] = []
            for clip in clips:
                buf.append(self._prep_audio(clip))
                if len(buf) == batch_size:
                    yield buf, batch_size
                    buf = []
            if buf:
                n = len(buf)
                yield buf + [buf[-1]] * (batch_size - n), n

        from .utils.audio import stack_audio_batch
        for buf, n in batches():
            # Mixed int16/float clips normalize to float32 host-side
            # (np.stack would promote raw int16 VALUES — wrong by 32768x).
            audio = stack_audio_batch(buf)
            if self._batch_sharding is not None:
                audio = jax.device_put(audio, self._batch_sharding)
            inflight.append(
                (n, self._infer_audio(self.params, self.state, audio)))
            if len(inflight) > depth:
                n0, arrs = inflight.popleft()
                yield from self._postprocess(jax.device_get(arrs), n0)
        while inflight:
            n0, arrs = inflight.popleft()
            yield from self._postprocess(jax.device_get(arrs), n0)


def load_transcriber(checkpoint: Optional[str] = None,
                     cfg: ModelConfig = ModelConfig(),
                     vqt_cfg: VQTConfig = VQTConfig(),
                     seed: int = 0, decode_dtype=None,
                     max_frame_num: int = 1201) -> Transcriber:
    """Build a Transcriber from an orbax save dir, a torch checkpoint file,
    or (checkpoint=None) random init."""
    from .models import init_params, init_state
    params = init_params(jax.random.PRNGKey(seed), cfg)
    state = init_state(cfg)
    if checkpoint:
        if checkpoint.endswith((".ckpt", ".pt", ".pth")):
            from .models.convert import load_torch_checkpoint
            params, state = load_torch_checkpoint(checkpoint, cfg)
        else:
            from .train.checkpoint import Checkpointer
            import os
            ckpt_dir = checkpoint
            ckptr = Checkpointer(os.path.dirname(ckpt_dir)
                                 if ckpt_dir.rstrip("/").split("/")[-1]
                                 .startswith("CKPT") else ckpt_dir)
            path = ckpt_dir if os.path.basename(
                ckpt_dir.rstrip("/")).startswith("CKPT") \
                else ckptr.best_path()
            if path is None:
                raise FileNotFoundError(f"no checkpoint under {checkpoint}")
            trees, _, _ = ckptr.load(path, {"params": params,
                                            "state": state})
            params, state = trees["params"], trees["state"]
    return Transcriber(params, state, cfg, vqt_cfg,
                       max_frame_num=max_frame_num,
                       decode_dtype=decode_dtype)


def result_to_files(target: List[list], out_prefix: str,
                    write_kern: bool = True, write_xml: bool = True,
                    write_mid: bool = True) -> Dict[str, str]:
    """Write {prefix}.krn/.xml/.mid from a target structure."""
    from .symbolic.export import export_target, tokens_to_kern
    paths = {}
    if write_kern:
        kern_upper = tokens_to_kern([m[3] for m in target])
        kern_lower = tokens_to_kern([m[2] for m in target])
        paths["kern"] = f"{out_prefix}.krn"
        with open(paths["kern"], "w") as f:
            f.write("!! upper staff\n" + kern_upper
                    + "\n!! lower staff\n" + kern_lower + "\n")
    xml_path = f"{out_prefix}.xml" if write_xml else None
    mid_path = f"{out_prefix}.mid" if write_mid else None
    export_target(target, xml_path, mid_path)
    if xml_path:
        paths["musicxml"] = xml_path
    if mid_path:
        paths["midi"] = mid_path
    return paths
