"""Mixed-precision (bf16 conv stack) training: numerics stay close to
f32, params/BN state stay f32, learning still works, and the option
composes with accumulation and the harness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.train.step import make_jitted_steps, make_optimizer

CFG = ModelConfig(freq_bins=16, conv_feature_size=24, hidden_size=16,
                  max_bars=2, max_length=(8, 6), note_emb_size=8,
                  staff_emb_size=8)
B, T_ENC = 4, 20


def _batch(b=B, seed=0):
    rng = np.random.RandomState(seed)
    batch = {
        "spectrogram": rng.randn(b, 1, T_ENC, CFG.freq_bins)
        .astype(np.float32),
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


def _fresh():
    params = init_params(jax.random.PRNGKey(0), CFG)
    opt = make_optimizer(lr=1.0)
    return params, opt, opt.init(params), init_state(CFG)


def test_bf16_step_close_to_f32_and_dtypes_preserved():
    batch = _batch()
    # NOTE: the steps donate params/opt/state — every call needs fresh
    # trees, and the init snapshot must be host copies.
    params0 = jax.tree.map(np.array, init_params(jax.random.PRNGKey(0),
                                                 CFG))
    params, opt, opt_state, state = _fresh()
    t32, _ = make_jitted_steps(opt, CFG)
    p32, o32, s32, out32 = t32(params, opt_state, state, batch,
                               jax.random.PRNGKey(1), 1.0)

    params, opt, opt_state, state = _fresh()
    tbf, _ = make_jitted_steps(opt, CFG, conv_dtype=jnp.bfloat16)
    pbf, obf, sbf, outbf = tbf(params, opt_state, state, batch,
                               jax.random.PRNGKey(1), 1.0)
    params = params0

    # same objective at bf16 tolerance (conv matmuls in bf16)
    np.testing.assert_allclose(float(outbf.loss), float(out32.loss),
                               rtol=3e-2)
    # master params, optimizer state, and BN running stats remain f32
    for leaf in (jax.tree.leaves(pbf) + jax.tree.leaves(sbf)
                 + jax.tree.leaves(obf)):
        dt = np.asarray(leaf).dtype
        assert dt == np.float32 or np.issubdtype(dt, np.integer), dt
    # the update moved params comparably (not zeroed/NaN by the cast)
    d32 = np.concatenate([np.ravel(a - b) for a, b in
                          zip(jax.tree.leaves(p32),
                              jax.tree.leaves(params))])
    dbf = np.concatenate([np.ravel(a - b) for a, b in
                          zip(jax.tree.leaves(pbf),
                              jax.tree.leaves(params))])
    assert np.isfinite(dbf).all()
    assert np.linalg.norm(dbf) == pytest.approx(np.linalg.norm(d32),
                                                rel=0.2)


def test_bf16_composes_with_accumulation():
    batch = _batch(b=4)
    params, opt, opt_state, state = _fresh()
    t_acc, _ = make_jitted_steps(opt, CFG, accum_steps=2,
                                 conv_dtype=jnp.bfloat16)
    p, o, s, out = t_acc(params, opt_state, state, batch,
                         jax.random.PRNGKey(2), 0.7)
    assert np.isfinite(float(out.loss))
    for leaf in jax.tree.leaves(s):
        assert np.asarray(leaf).dtype == np.float32


def test_bf16_loss_decreases_over_steps():
    batch = _batch()
    params, opt, opt_state, state = _fresh()
    t_step, _ = make_jitted_steps(opt, CFG, conv_dtype=jnp.bfloat16)
    losses = []
    p, o, s = params, opt_state, state
    for i in range(6):
        p, o, s, out = t_step(p, o, s, batch, jax.random.PRNGKey(10), 1.0)
        losses.append(float(out.loss))
    assert losses[-1] < losses[0]


def test_f16_staged_batch_matches_f32_upload():
    """upload_f16 staging: a float16-staged spectrogram is promoted back
    to f32 on device (train/step._promote_staged) — the loss matches the
    f32-uploaded loss at f16-quantization tolerance, and params/opt/state
    dtypes are untouched."""
    batch32 = _batch()
    batch16 = dict(batch32)
    batch16["spectrogram"] = batch32["spectrogram"].astype(np.float16)

    outs = {}
    for tag, batch in (("f32", batch32), ("f16", batch16)):
        params, opt, opt_state, state = _fresh()
        t_step, _ = make_jitted_steps(opt, CFG, conv_dtype=jnp.bfloat16)
        p, o, s, out = t_step(params, opt_state, state, batch,
                              jax.random.PRNGKey(1), 1.0)
        outs[tag] = (float(out.loss), p, s)
    np.testing.assert_allclose(outs["f16"][0], outs["f32"][0], rtol=1e-2)
    for leaf in (jax.tree.leaves(outs["f16"][1])
                 + jax.tree.leaves(outs["f16"][2])):
        dt = np.asarray(leaf).dtype
        assert dt == np.float32 or np.issubdtype(dt, np.integer), dt

    # composes with accumulation too
    params, opt, opt_state, state = _fresh()
    t_acc, _ = make_jitted_steps(opt, CFG, accum_steps=2,
                                 conv_dtype=jnp.bfloat16)
    p, o, s, out = t_acc(params, opt_state, state, batch16,
                         jax.random.PRNGKey(2), 0.7)
    assert np.isfinite(float(out.loss))


def test_harness_stages_f16_only_for_bf16_training(tmp_path):
    """upload_f16 defaults on under train_dtype=bfloat16 (train batches
    staged f16, eval batches stay f32), can be opted out, and never
    applies to f32-parity training."""
    from piano_a2s_tpu.config import ExperimentConfig
    from piano_a2s_tpu.train.harness import Trainer

    def mk(extras):
        out = str(tmp_path / "out")
        exp = ExperimentConfig(
            seed=7, workspace=str(tmp_path), output_folder=out,
            feature_folder=str(tmp_path), save_folder=f"{out}/save",
            train_log=f"{out}/train_log.txt",
            max_length=(8, 6), max_bars=2, max_duration=1,
            frames_per_second=23, bins_per_octave=4, n_octaves=4,
            number_of_epochs=1, batch_size=2, conv_feature_size=16,
            hidden_size=16, note_emb_size=8, staff_emb_size=8)
        exp.extras.update(extras)
        return Trainer(exp)

    batch = _batch(b=2)
    batch["names"] = ["a", "b"]
    batch["versions"] = [0, 0]

    tr = mk({"train_dtype": "bfloat16"})
    assert tr.upload_f16
    assert tr._device_batch(batch, train=True)["spectrogram"].dtype \
        == np.float16
    assert tr._device_batch(batch)["spectrogram"].dtype == np.float32

    tr = mk({"train_dtype": "bfloat16", "upload_f16": False})
    assert not tr.upload_f16
    assert tr._device_batch(batch, train=True)["spectrogram"].dtype \
        == np.float32

    tr = mk({})
    assert not tr.upload_f16
    assert tr._device_batch(batch, train=True)["spectrogram"].dtype \
        == np.float32


def test_harness_train_dtype_extras(tmp_path):
    from test_harness_e2e import _make_fixture
    from piano_a2s_tpu.config import ExperimentConfig
    from piano_a2s_tpu.data import (DataLoader, SyntheticTestDataset,
                                    SyntheticTrainDataset)
    from piano_a2s_tpu.train.harness import Trainer

    root = str(tmp_path / "features")
    _make_fixture(root, "train", 0)
    _make_fixture(root, "valid", 0, n_songs=2, seed=1)
    out = str(tmp_path / "out")
    exp = ExperimentConfig(
        seed=7, workspace=str(tmp_path), output_folder=out,
        feature_folder=root, save_folder=f"{out}/save",
        train_log=f"{out}/train_log.txt",
        max_length=(8, 6), max_bars=2, max_duration=1, frames_per_second=23,
        bins_per_octave=4, n_octaves=4, number_of_epochs=1, batch_size=2,
        conv_feature_size=16, hidden_size=16, note_emb_size=8,
        staff_emb_size=8)
    exp.extras["train_dtype"] = "bfloat16"
    trainer = Trainer(exp)
    assert trainer.conv_dtype == jnp.bfloat16
    train_ds = SyntheticTrainDataset(
        root, "train", versions=[0], max_frame_num=exp.max_frame_num,
        max_length=exp.max_length, rng=np.random.RandomState(0))
    valid_ds = SyntheticTestDataset(
        root, "valid", versions=[0], max_frame_num=exp.max_frame_num,
        max_length=exp.max_length)
    train_loader = DataLoader(train_ds, 2, shuffle=True, seed=0)
    trainer.fit(train_loader, DataLoader(valid_ds, 2))
    assert np.isfinite(trainer.train_stats["loss"])
    # fit installed the f16 staging cast in the loader (prefetch thread),
    # and batches coming out of it carry float16 spectrograms.
    assert train_loader.transform is not None
    assert next(iter(train_loader))["spectrogram"].dtype == np.float16

    exp.extras["train_dtype"] = "int8"
    with pytest.raises(ValueError):
        Trainer(exp)
