"""Transcribe piano audio to score files (Kern / MusicXML / MIDI).

Usage:
    python transcribe.py input.wav [more.wav ...] \
        [--checkpoint SAVE_DIR_OR_TORCH_CKPT] [--out-dir DIR]

Each input becomes {out-dir}/{stem}.krn/.xml/.mid. Clips longer than 12 s
are truncated (the model's capability envelope; reference README limitation).
"""

import argparse
import os
import sys

import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("inputs", nargs="+",
                        help="WAV files, or .npy mono float arrays at the "
                             "model sample rate (e.g. the synthetic "
                             "corpus generator's audio/ files)")
    parser.add_argument("--checkpoint", default=None,
                        help="orbax save dir or torch .ckpt (default: "
                             "random weights — smoke mode)")
    parser.add_argument("--out-dir", default=".")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 decode loop (~2x faster, tiny "
                             "numeric deviation from f32)")
    parser.add_argument("--batch-size", type=int, default=16,
                        help="serving batch size for many-file jobs "
                             "(>4 inputs stream through the pipelined "
                             "serving loop at this batch size)")
    parser.add_argument("--config", default=None,
                        help="experiment YAML for model dims (default: "
                             "the full-size production model)")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. 'cpu'; the TPU "
                             "plugin ignores the JAX_PLATFORMS env var)")
    args = parser.parse_args(argv)

    from piano_a2s_tpu.infer import load_transcriber, result_to_files
    from piano_a2s_tpu.utils.audio import read_wav, read_wav_pcm16, resample
    from piano_a2s_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    decode_dtype = None
    if args.bf16:
        import jax.numpy as jnp
        decode_dtype = jnp.bfloat16
    if args.config:
        from piano_a2s_tpu.config import load_experiment
        exp = load_experiment(args.config)
        tr = load_transcriber(args.checkpoint, cfg=exp.model_config(),
                              vqt_cfg=exp.vqt_config(),
                              max_frame_num=exp.max_frame_num,
                              decode_dtype=decode_dtype)
    else:
        tr = load_transcriber(args.checkpoint, decode_dtype=decode_dtype)
    os.makedirs(args.out_dir, exist_ok=True)

    def clip_gen():
        for path in args.inputs:
            if path.endswith(".npy"):
                import numpy as np
                audio = np.asarray(np.load(path))
                if audio.ndim != 1 or not (
                        np.issubdtype(audio.dtype, np.floating)
                        or audio.dtype == np.int16):
                    sys.exit(f"{path}: expected a 1-D float or int16 PCM "
                             f"audio array at {tr.vqt_cfg.sample_rate} Hz, "
                             f"got {audio.dtype}{audio.shape} (is this a "
                             "spectrogram or stereo file?)")
                # int16 passes through raw (the Transcriber converts on
                # device with read_wav's scale); floats normalize to f32.
                yield (audio if audio.dtype == np.int16
                       else audio.astype(np.float32))
                continue
            # 16-bit mono WAVs already at the model rate stay int16: half
            # the host->device bytes, converted on device with read_wav's
            # exact /32768 scale (bit-identical result; infer.py).
            pcm = read_wav_pcm16(path, expect_sr=tr.vqt_cfg.sample_rate)
            if pcm is not None:
                yield pcm[0]
                continue
            audio, sr = read_wav(path)
            yield resample(audio, sr, tr.vqt_cfg.sample_rate)

    t0 = time.time()
    if len(args.inputs) <= 4:
        # Small jobs: one blocking padded batch (single compile).
        results = iter(tr.transcribe_batch(list(clip_gen())))
    else:
        # Many files: the pipelined serving stream — audio is read
        # lazily, several batches stay in flight on the device, and
        # results arrive incrementally in input order. Cap the batch at
        # the next power of two >= #inputs so e.g. 5 files pad to 8
        # decoded clips, not to the full default batch of 16.
        pow2 = 1 << (len(args.inputs) - 1).bit_length()
        results = tr.transcribe_stream(clip_gen(),
                                       batch_size=min(args.batch_size,
                                                      pow2),
                                       depth=3)
    used = set()
    n = 0
    for path, target in zip(args.inputs, results):
        stem = os.path.splitext(os.path.basename(path))[0]
        unique, k = stem, 1
        while unique in used:  # same basename from different directories
            unique = f"{stem}.{k}"
            k += 1
        used.add(unique)
        prefix = os.path.join(args.out_dir, unique)
        paths = result_to_files(target, prefix)
        n += 1
        print(f"{path} -> {', '.join(sorted(paths.values()))}")
    dt = time.time() - t0
    print(f"transcribed {n} clip(s) in {dt:.2f}s "
          f"({n / dt:.2f} clips/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
