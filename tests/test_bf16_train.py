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


def test_u8_staged_batch_matches_f32_upload():
    """uint8 staging: a [0,1] spectrogram quantized to 1/255 steps is
    dequantized on device (train/step._promote_staged) — the loss equals
    the f32 upload of the SAME quantized values (exact path check) and
    stays close to the unquantized loss (quantization is 0.31 dB on the
    80 dB log scale, below the conv stack's bf16 rounding)."""
    batch32 = _batch()
    # Real spectrograms are log-VQT in [0,1] (ops/vqt.log_compress).
    rng = np.random.RandomState(3)
    spec = rng.rand(*batch32["spectrogram"].shape).astype(np.float32)
    batch32 = dict(batch32, spectrogram=spec)
    q = np.round(spec * 255.0).astype(np.uint8)
    batch_u8 = dict(batch32, spectrogram=q)
    batch_deq = dict(batch32,
                     spectrogram=(q.astype(np.float32) / 255.0))

    outs = {}
    for tag, batch in (("f32", batch32), ("u8", batch_u8),
                       ("deq", batch_deq)):
        params, opt, opt_state, state = _fresh()
        t_step, _ = make_jitted_steps(opt, CFG, conv_dtype=jnp.bfloat16)
        p, o, s, out = t_step(params, opt_state, state, batch,
                              jax.random.PRNGKey(1), 1.0)
        outs[tag] = (float(out.loss), p, s)
    # u8 upload == f32 upload of the dequantized values (same math).
    np.testing.assert_allclose(outs["u8"][0], outs["deq"][0], rtol=1e-6)
    # and the quantization itself is within bf16-level noise of f32.
    np.testing.assert_allclose(outs["u8"][0], outs["f32"][0], rtol=1e-2)
    for leaf in (jax.tree.leaves(outs["u8"][1])
                 + jax.tree.leaves(outs["u8"][2])):
        dt = np.asarray(leaf).dtype
        assert dt == np.float32 or np.issubdtype(dt, np.integer), dt


def test_u8_loss_decreases_over_steps():
    """Learning works end-to-end through the u8-staged path."""
    batch = _batch()
    rng = np.random.RandomState(4)
    spec = rng.rand(*batch["spectrogram"].shape).astype(np.float32)
    batch["spectrogram"] = np.round(spec * 255.0).astype(np.uint8)
    params, opt, opt_state, state = _fresh()
    t_step, _ = make_jitted_steps(opt, CFG, conv_dtype=jnp.bfloat16)
    losses = []
    p, o, s = params, opt_state, state
    for i in range(6):
        p, o, s, out = t_step(p, o, s, batch, jax.random.PRNGKey(10), 1.0)
        losses.append(float(out.loss))
    assert losses[-1] < losses[0]


def test_harness_staging_dtype_selection(tmp_path):
    """upload_dtype defaults to uint8 under train_dtype=bfloat16 (train
    batches staged u8, eval batches stay f32), honors explicit choices
    and the legacy upload_f16 flag, and never applies to f32-parity
    training."""
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
    assert tr.upload_dtype == np.uint8
    assert tr._device_batch(batch, train=True)["spectrogram"].dtype \
        == np.uint8
    assert tr._device_batch(batch)["spectrogram"].dtype == np.float32

    tr = mk({"train_dtype": "bfloat16", "upload_dtype": "float16"})
    assert tr.upload_dtype == np.float16
    assert tr._device_batch(batch, train=True)["spectrogram"].dtype \
        == np.float16

    # legacy flag: upload_f16 true/false -> float16/float32 staging
    tr = mk({"train_dtype": "bfloat16", "upload_f16": True})
    assert tr.upload_dtype == np.float16
    tr = mk({"train_dtype": "bfloat16", "upload_f16": False})
    assert tr.upload_dtype is None
    assert tr._device_batch(batch, train=True)["spectrogram"].dtype \
        == np.float32

    tr = mk({})
    assert tr.upload_dtype is None
    assert tr._device_batch(batch, train=True)["spectrogram"].dtype \
        == np.float32

    with pytest.raises(ValueError):
        mk({"train_dtype": "bfloat16", "upload_dtype": "int4"})


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
    # fit installed the staging cast in the loader (prefetch thread),
    # and batches coming out of it carry uint8 spectrograms (the bf16
    # default staging dtype).
    assert train_loader.transform is not None
    assert next(iter(train_loader))["spectrogram"].dtype == np.uint8

    exp.extras["train_dtype"] = "int8"
    with pytest.raises(ValueError):
        Trainer(exp)
