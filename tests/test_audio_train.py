"""Training from raw audio with the on-device VQT frontend
(train/step.make_audio_frontend; extras `input_features: audio`):
exactness vs spectrogram-input training, int16 staging, dataset/loader
audio mode, and the harness end-to-end."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.ops.vqt import VQTConfig, build_kernels, get_vqt
from piano_a2s_tpu.train.step import make_jitted_steps, make_optimizer

# 16 freq bins = 4 octaves x 4 bins; 20 frames = (20-1)*160+... samples.
VCFG = VQTConfig(bins_per_octave=4, n_octaves=4)
T_ENC = 20
N_SAMPLES = (T_ENC - 1) * VCFG.hop_length
CFG = ModelConfig(freq_bins=16, conv_feature_size=24, hidden_size=16,
                  max_bars=2, max_length=(8, 6), note_emb_size=8,
                  staff_emb_size=8)
B = 4


def _targets(b=B, seed=0):
    rng = np.random.RandomState(seed)
    batch = {
        "time_sig": rng.randint(0, 7, (b, CFG.max_bars)),
        "key": rng.randint(0, 14, (b, CFG.max_bars)),
        "upper": rng.randint(0, 140, (b, CFG.max_bars, CFG.max_length[0])),
        "upper_lengths": rng.randint(2, CFG.max_length[0],
                                     (b, CFG.max_bars)),
        "lower": rng.randint(0, 140, (b, CFG.max_bars, CFG.max_length[1])),
        "lower_lengths": rng.randint(2, CFG.max_length[1],
                                     (b, CFG.max_bars)),
    }
    for staff, cap in (("upper", CFG.max_length[0]),
                       ("lower", CFG.max_length[1])):
        toks, lens = batch[staff], batch[f"{staff}_lengths"]
        pos = np.arange(cap)
        toks[pos[None, None, :] >= lens[..., None]] = CFG.pad
    return batch


def _audio(b=B, seed=1):
    rng = np.random.RandomState(seed)
    # tone mixture + noise, peak-normalized like real ingest
    t = np.arange(N_SAMPLES) / VCFG.sample_rate
    out = np.stack([
        np.sin(2 * np.pi * rng.uniform(50, 400) * t)
        + 0.3 * np.sin(2 * np.pi * rng.uniform(400, 2000) * t)
        + 0.05 * rng.randn(N_SAMPLES)
        for _ in range(b)])
    return (0.7 * out / np.abs(out).max()).astype(np.float32)


def _fresh():
    params = init_params(jax.random.PRNGKey(0), CFG)
    opt = make_optimizer(lr=1.0)
    return params, opt, opt.init(params), init_state(CFG)


def _device_spec(audio_f32):
    """The spectrogram the audio frontend computes, as a host array."""
    kernels = tuple(map(jnp.asarray, build_kernels(VCFG)))
    spec = np.asarray(get_vqt(audio_f32, kernels, VCFG))
    assert spec.shape[1] == T_ENC
    return spec[:, None, :, :]


def test_audio_step_matches_spectrogram_step():
    """A from_audio train step == the spectrogram train step fed the SAME
    on-device-computed spectrogram (identical math, loss and params)."""
    audio = _audio()
    targets = _targets()
    spec = _device_spec(audio)

    params, opt, opt_state, state = _fresh()
    t_spec, _ = make_jitted_steps(opt, CFG)
    p1, o1, s1, out1 = t_spec(params, opt_state, state,
                              dict(targets, spectrogram=spec),
                              jax.random.PRNGKey(1), 1.0)

    params, opt, opt_state, state = _fresh()
    t_audio, e_audio = make_jitted_steps(opt, CFG, from_audio=True,
                                         vqt_cfg=VCFG,
                                         max_frame_num=T_ENC)
    p2, o2, s2, out2 = t_audio(params, opt_state, state,
                               dict(targets, audio=audio),
                               jax.random.PRNGKey(1), 1.0)
    np.testing.assert_allclose(float(out2.loss), float(out1.loss),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # eval step runs from audio too (free-running decode is finite)
    out_e, preds = e_audio(p2, s2, dict(targets, audio=audio))
    assert np.isfinite(float(out_e.loss))
    assert preds["upper_tokens"].shape[0] == B


def test_audio_int16_matches_f32():
    """int16 audio batches == float32 batches of int16/32768 exactly —
    the PCM16 round-trip contract shared with serving."""
    audio = _audio()
    pcm = np.clip(np.round(audio * 32768.0), -32768, 32767).astype(np.int16)
    targets = _targets()
    outs = {}
    for tag, a in (("i16", pcm),
                   ("f32", pcm.astype(np.float32) / 32768.0)):
        params, opt, opt_state, state = _fresh()
        t_audio, _ = make_jitted_steps(opt, CFG, from_audio=True,
                                       vqt_cfg=VCFG, max_frame_num=T_ENC)
        _, _, _, out = t_audio(params, opt_state, state,
                               dict(targets, audio=a),
                               jax.random.PRNGKey(1), 1.0)
        outs[tag] = float(out.loss)
    np.testing.assert_allclose(outs["i16"], outs["f32"], rtol=1e-6)


def test_audio_composes_with_accum_and_bf16():
    audio = _audio()
    targets = _targets()
    params, opt, opt_state, state = _fresh()
    t_acc, _ = make_jitted_steps(opt, CFG, accum_steps=2,
                                 conv_dtype=jnp.bfloat16, from_audio=True,
                                 vqt_cfg=VCFG, max_frame_num=T_ENC)
    losses = []
    p, o, s = params, opt_state, state
    for i in range(4):
        p, o, s, out = t_acc(p, o, s, dict(targets, audio=audio),
                             jax.random.PRNGKey(5 + i), 1.0)
        losses.append(float(out.loss))
    assert np.isfinite(losses).all() if hasattr(np, "isfinite") else True
    assert losses[-1] < losses[0]


def _write_audio_corpus(root, split, version, n_songs=4, seed=0,
                        n_samples=N_SAMPLES - 37):
    """Fixture corpus with audio/ (no spectrogram/) + targets."""
    rng = np.random.RandomState(seed)
    base = os.path.join(root, split, str(version))
    for sub in ("audio", "target", "info"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    for s in range(n_songs):
        name = f"song{s}~v{version}~Synth"
        np.save(os.path.join(base, "audio", f"{name}.npy"),
                (0.5 * rng.randn(n_samples)).clip(-1, 1)
                .astype(np.float32))
        target = [[int(rng.randint(-6, 8)), "4/4",
                   rng.randint(0, 140, rng.randint(2, 6)).tolist(),
                   rng.randint(0, 140, rng.randint(2, 8)).tolist()]
                  for _ in range(CFG.max_bars)]
        with open(os.path.join(base, "target", f"song{s}.pkl"), "wb") as f:
            pickle.dump(target, f)


def test_dataset_audio_mode(tmp_path):
    from piano_a2s_tpu.data import DataLoader, SyntheticTrainDataset

    root = str(tmp_path)
    _write_audio_corpus(root, "train", 0)
    ds = SyntheticTrainDataset(
        root, "train", versions=[0], max_frame_num=T_ENC,
        max_length=CFG.max_length, input_features="audio",
        max_samples=N_SAMPLES, rng=np.random.RandomState(0))
    item = ds[0]
    assert "audio" in item and "spectrogram" not in item
    assert item["audio"].shape == (N_SAMPLES,)  # zero-padded to fixed len
    assert item["audio"].dtype == np.float32

    loader = DataLoader(ds, 2)
    batch = next(iter(loader))
    assert batch["audio"].shape == (2, N_SAMPLES)
    assert batch["upper"].shape == (2, CFG.max_bars, CFG.max_length[0])

    # per-host sharded loading carries the audio under the feature key
    sharded = DataLoader(ds, 4, shard=(0, 2))
    sb = next(iter(sharded))
    assert sb["audio"].shape == (2, N_SAMPLES)
    assert sb["local_rows"] == (0, 2)
    assert len(sb["names"]) == 4  # global batch plan

    with pytest.raises(ValueError):
        SyntheticTrainDataset(root, "train", versions=[0],
                              input_features="video")

    # spectrogram-only layouts get a diagnosis, not a bare listdir error
    spec_root = str(tmp_path / "spec_only")
    base = os.path.join(spec_root, "train", "0")
    for sub in ("spectrogram", "target"):
        os.makedirs(os.path.join(base, sub))
    with pytest.raises(FileNotFoundError, match="audio mode|audio/"):
        SyntheticTrainDataset(spec_root, "train", versions=[0],
                              input_features="audio")


def test_collate_mixed_dtype_audio_normalizes():
    """A batch mixing int16 and f32 audio rows (e.g. a corpus whose
    versions were written by synth.py [f32] and the prepare_data int16
    backfill) must NOT np.stack raw int16 VALUES into a float batch
    (wrong by 32768x): mixed batches normalize to f32 via the PCM16
    scale; uniform batches keep their dtype."""
    from piano_a2s_tpu.data.datasets import collate

    i16 = {"audio": np.full(64, 16384, np.int16), "name": "a",
           "version": 0}
    f32 = {"audio": np.full(64, 0.25, np.float32), "name": "b",
           "version": 1}
    mixed = collate([i16, f32])
    assert mixed["audio"].dtype == np.float32
    np.testing.assert_allclose(mixed["audio"][0], 0.5)   # 16384/32768
    np.testing.assert_allclose(mixed["audio"][1], 0.25)
    assert collate([i16, dict(i16, name="c")])["audio"].dtype == np.int16
    assert collate([f32, f32])["audio"].dtype == np.float32


def test_harness_audio_mode_end_to_end(tmp_path):
    """Trainer.fit + evaluate with extras input_features=audio: int16
    staging installed in the loader, finite losses, learning happens."""
    from piano_a2s_tpu.config import ExperimentConfig
    from piano_a2s_tpu.data import (DataLoader, SyntheticTestDataset,
                                    SyntheticTrainDataset)
    from piano_a2s_tpu.train.harness import Trainer

    root = str(tmp_path / "features")
    _write_audio_corpus(root, "train", 0, n_songs=4)
    _write_audio_corpus(root, "valid", 0, n_songs=2, seed=1)
    out = str(tmp_path / "out")
    exp = ExperimentConfig(
        seed=7, workspace=str(tmp_path), output_folder=out,
        feature_folder=root, save_folder=f"{out}/save",
        train_log=f"{out}/train_log.txt",
        max_length=CFG.max_length, max_bars=CFG.max_bars,
        max_duration=1, frames_per_second=100,
        bins_per_octave=4, n_octaves=4,
        number_of_epochs=2, batch_size=2, conv_feature_size=24,
        hidden_size=16, note_emb_size=8, staff_emb_size=8)
    # tiny clip: frames = T_ENC
    exp.max_frame_num = T_ENC
    exp.extras.update(input_features="audio", accum_steps=2)
    trainer = Trainer(exp)
    assert trainer.from_audio
    assert trainer.upload_dtype == np.int16

    ds_kw = dict(max_frame_num=T_ENC, max_length=exp.max_length,
                 input_features="audio", max_samples=N_SAMPLES)
    train_ds = SyntheticTrainDataset(root, "train", versions=[0],
                                     rng=np.random.RandomState(0), **ds_kw)
    valid_ds = SyntheticTestDataset(root, "valid", versions=[0], **ds_kw)
    train_loader = DataLoader(train_ds, 2, shuffle=True, seed=0)
    trainer.fit(train_loader, DataLoader(valid_ds, 2))
    assert np.isfinite(trainer.train_stats["loss"])
    # loader-thread staging produced int16 audio batches
    assert next(iter(train_loader))["audio"].dtype == np.int16
    stats = trainer.evaluate(DataLoader(valid_ds, 2))
    assert np.isfinite(stats["loss"])

    # f32 upload opt-down accepted; junk rejected
    exp.extras["upload_dtype"] = "float32"
    assert Trainer(exp).upload_dtype is None
    exp.extras["upload_dtype"] = "uint8"
    with pytest.raises(ValueError):
        Trainer(exp)
