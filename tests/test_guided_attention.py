"""Guided-attention penalty (opt-in training aid).

docs/DESIGN.md §11: content-based Bahdanau attention spends thousands of
steps diffuse before aligning (measured on the r4 scale run: note-level
attention entropy 6.1-6.9 vs uniform 7.09 after 3750 steps, pitch at
chance while rhythm/key learned). The opt-in `guided_attention` extra
adds a diagonal prior on the note decoders: bar j of max_bars attends
around frames [j, j+1]/max_bars, linearly in the token index. These
tests pin (1) OFF-by-default parity (no aux key, identical loss),
(2) the penalty's geometry (a synthetic run where the guide center is
known), (3) exact monolithic == accumulated decomposition with the
penalty on, and (4) that the penalty actually produces gradients."""

import numpy as np

import jax
import jax.numpy as jnp

from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.models.score_transcription import forward
from piano_a2s_tpu.train.losses import transcription_loss_fused
from piano_a2s_tpu.train.step import (make_jitted_steps, make_optimizer,
                                      train_step, train_step_accum)

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
        toks = batch[staff]
        lens = batch[f"{staff}_lengths"]
        pos = np.arange(cap)
        toks[pos[None, None, :] >= lens[..., None]] = CFG.pad
    return batch


def _gt(batch):
    return (batch["time_sig"], batch["key"], batch["upper"],
            batch["upper_lengths"], batch["lower"],
            batch["lower_lengths"])


def _forward(batch, ga_sigma):
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_state(CFG)
    return forward(params, state, batch["spectrogram"],
                   jax.random.PRNGKey(1), cfg=CFG, train=True,
                   ground_truth=_gt(batch), tf_ratio=1.0, emit_full=False,
                   ga_sigma=ga_sigma)[0]


def test_off_by_default_no_aux_and_identical_loss():
    batch = _batch()
    outs_off = _forward(batch, ga_sigma=0.0)
    assert "ga_num" not in outs_off[4]
    outs_on = _forward(batch, ga_sigma=0.15)
    assert "ga_num" in outs_on[4]
    # the NLL surfaces are bit-identical with/without the penalty
    for a, b in zip(outs_off[:4], outs_on[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    loss_off, comps_off = transcription_loss_fused(outs_off, batch, CFG.pad)
    loss_on_w0, comps_on_w0 = transcription_loss_fused(
        outs_on, batch, CFG.pad, ga_weight=0.0)
    assert float(loss_off) == float(loss_on_w0)
    assert "ga_loss" not in comps_on_w0 and "ga_loss" not in comps_off


def test_penalty_shape_and_range():
    batch = _batch()
    outs = _forward(batch, ga_sigma=0.15)
    ga = np.asarray(outs[4]["ga_num"])
    assert ga.shape == (B, CFG.max_bars, 2)
    # each per-step penalty is attention mass scaled by (1 - gaussian)
    # in [0, 1]; the sum over a bar's steps is bounded by max_length
    assert (ga >= 0).all()
    assert (ga <= max(CFG.max_length)).all()
    _, comps = transcription_loss_fused(outs, batch, CFG.pad,
                                        ga_weight=0.5)
    assert 0.0 <= float(comps["ga_loss"]) <= 0.5


def test_wider_sigma_penalizes_less():
    """The same attention weights incur a smaller penalty under a wider
    guide — pins the sign of the sigma knob."""
    batch = _batch()
    narrow = transcription_loss_fused(
        _forward(batch, ga_sigma=0.05), batch, CFG.pad, ga_weight=1.0,
    )[1]["ga_loss"]
    wide = transcription_loss_fused(
        _forward(batch, ga_sigma=0.60), batch, CFG.pad, ga_weight=1.0,
    )[1]["ga_loss"]
    assert float(wide) < float(narrow)


def test_monolithic_equals_accumulated_with_ga():
    """The guided numerator/denominator decompose exactly over
    microbatches, like every other component."""
    batch = _batch()
    opt = make_optimizer(lr=1.0)
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_state(CFG)
    opt_state = opt.init(params)
    kw = dict(optimizer=opt, cfg=CFG, ga_weight=0.4, ga_sigma=0.2)
    p1, _, _, out1 = train_step(params, opt_state, state, batch,
                                jax.random.PRNGKey(7), 1.0, **kw)
    p2, _, _, out2 = train_step_accum(params, opt_state, state, batch,
                                      jax.random.PRNGKey(7), 1.0,
                                      accum_steps=2, **kw)
    # tf_ratio=1.0 makes the decode deterministic, so the only
    # monolithic-vs-accum differences are BN microbatch statistics;
    # losses and ga components must agree to BN-stat tolerance.
    assert "ga_loss" in out1.components and "ga_loss" in out2.components
    np.testing.assert_allclose(float(out1.components["ga_loss"]),
                               float(out2.components["ga_loss"]),
                               rtol=0.2)
    assert np.isfinite(float(out2.loss))


def test_ga_produces_gradients_on_attention_params():
    batch = _batch()
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_state(CFG)

    def loss_with(p, w):
        outs, _ = forward(p, state, batch["spectrogram"],
                          jax.random.PRNGKey(1), cfg=CFG, train=True,
                          ground_truth=_gt(batch), tf_ratio=1.0,
                          emit_full=False, ga_sigma=0.15)
        loss, _ = transcription_loss_fused(outs, batch, CFG.pad,
                                           ga_weight=w)
        return loss

    g0 = jax.grad(loss_with)(params, 0.0)
    g1 = jax.grad(loss_with)(params, 1.0)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
    # attention params of both staves must receive a different gradient
    assert d["decoder"]["upper"]["attn"]["v"] > 0
    assert d["decoder"]["lower"]["attn"]["v"] > 0


def test_jitted_steps_carry_ga():
    batch = _batch()
    opt = make_optimizer(lr=1.0)
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_state(CFG)
    opt_state = opt.init(params)
    t_step, _ = make_jitted_steps(opt, CFG, ga_weight=0.3)
    _, _, _, out = t_step(params, opt_state, state, batch,
                          jax.random.PRNGKey(3), 0.7)
    assert "ga_loss" in out.components
    assert np.isfinite(float(out.loss))


def test_duration_table_and_content_compression():
    """The precise guide: expected centers follow CUMULATIVE gt duration
    (not linear index), and ga_content compresses them toward frame 0.
    Checked via the penalty of a fixed forward: a guide whose centers are
    computed from the duration table must differ from the linear-index
    one whenever durations are non-uniform, and content < 1 must change
    the penalty (the centers move)."""
    from piano_a2s_tpu.train.harness import _duration_fraction_table

    table = _duration_fraction_table(CFG.vocab_size)
    # duration ids resolve to fractions; pitch ids to 0
    assert table[4] == 0.25 and table[7] == 1.5 / 8
    assert table[21] == 0.0

    batch = _batch()
    params = init_params(jax.random.PRNGKey(0), CFG)
    state = init_state(CFG)

    def pen(ga_dur_frac=None, ga_content=None):
        outs, _ = forward(params, state, batch["spectrogram"],
                          jax.random.PRNGKey(1), cfg=CFG, train=True,
                          ground_truth=_gt(batch), tf_ratio=1.0,
                          emit_full=False, ga_sigma=0.15,
                          ga_dur_frac=ga_dur_frac, ga_content=ga_content)
        return float(np.sum(np.asarray(outs[4]["ga_num"])))

    base = pen()
    with_durs = pen(ga_dur_frac=table)
    compressed = pen(ga_content=jnp.full((B,), 0.6, jnp.float32))
    assert with_durs != base      # centers moved off the linear grid
    assert compressed != base     # centers compressed toward frame 0
    assert all(np.isfinite(v) for v in (base, with_durs, compressed))


def test_audio_frontend_emits_content_fraction():
    """make_audio_frontend computes the per-clip occupied fraction of
    the frame window from the zero-padded audio."""
    from piano_a2s_tpu.ops.vqt import VQTConfig
    from piano_a2s_tpu.train.step import make_audio_frontend

    vqt_cfg = VQTConfig(sample_rate=16000)
    max_frames = 100
    prep = make_audio_frontend(vqt_cfg, max_frame_num=max_frames)
    L = max_frames * vqt_cfg.hop_length
    audio = np.zeros((2, L), np.float32)
    audio[0, : L // 2] = 0.1          # half-full clip
    audio[1, : (4 * L) // 5] = 0.1    # 80%-full clip
    out = prep({"audio": jnp.asarray(audio)})
    frac = np.asarray(out["ga_content"])
    np.testing.assert_allclose(frac, [0.5, 0.8], atol=0.02)
    assert out["spectrogram"].shape[2] == max_frames


def test_ga_within_bar_note_midpoints():
    """Exact semantics of the duration->center map on a hand-built bar:
    tokens '2 c sep 4 d sep 4 e sep eos' (half + quarter + quarter).
    Note midpoints in bar time: 0.25, 0.5+0.125=0.625, 0.875 — and every
    token of a note (duration, pitch, separator) shares its midpoint."""
    from piano_a2s_tpu.models.score_transcription import ga_within_bar
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
    from piano_a2s_tpu.train.harness import _duration_fraction_table

    labels = LabelsMultiple(extended=True)
    full = ModelConfig()  # real vocab ids
    table = _duration_fraction_table(full.vocab_size)
    ids = labels.encode("2c 4d 4e") + [full.eos, full.pad, full.pad]
    gt = jnp.asarray([ids], jnp.int32)
    within = np.asarray(ga_within_bar(gt, table, full.pad))[0]
    # token layout: [2, c, sep, 4, d, sep, 4, e, eos?, ...]
    text = labels.decode(ids[: len(labels.encode("2c 4d 4e"))])
    # locate the three duration tokens and check their (and their
    # followers') centers
    expected = {0: 0.25, 1: 0.25, 2: 0.25,   # half note c
                3: 0.625, 4: 0.625, 5: 0.625,  # quarter d
                6: 0.875, 7: 0.875}            # quarter e
    for t, want in expected.items():
        np.testing.assert_allclose(within[t], want, atol=1e-6,
                                   err_msg=f"token {t} ({text})")
    # eos + pads inherit the last note's midpoint / stay clipped
    assert abs(within[8] - 0.875) < 1e-6


def test_ga_within_bar_events_chord_midpoints():
    """Chord-aware event map on a hand-built chordal bar:
    '2c 2e\\n4d\\n4e' = a half-note CHORD event, then two quarter events.
    Event midpoints in bar time: 0.25, 0.625, 0.875 — the chord's two
    duration tokens advance time ONCE (the per-duration token map would
    count the chord twice: total 1.5 whole notes instead of 1.0)."""
    from piano_a2s_tpu.models.score_transcription import (
        ga_within_bar, ga_within_bar_events)
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
    from piano_a2s_tpu.train.harness import _duration_fraction_table

    labels = LabelsMultiple(extended=True)
    full = ModelConfig()
    table = _duration_fraction_table(full.vocab_size)
    ids = labels.encode("2c 2e\n4d\n4e") + [full.eos, full.pad, full.pad]
    gt = jnp.asarray([ids], jnp.int32)
    ev = np.asarray(ga_within_bar_events(gt, table, full.pad,
                                         full.newline))[0]
    # tokens: [2 c <b> 2 e \n | 4 d \n | 4 e eos pad pad]
    want = [0.25] * 6 + [0.625] * 3 + [0.875] * 5
    np.testing.assert_allclose(ev, want, atol=1e-6)
    # and the legacy token map WOULD double-count the chord (regression
    # guard for why the event map exists)
    tok = np.asarray(ga_within_bar(gt, table, full.pad))[0]
    assert abs(tok[0] - 0.25) > 0.05


def test_ga_within_bar_auto_dispatch():
    """Rows WITH the event separator get the event map; separator-free
    rows (legacy chord-free synth streams) keep the token map — in one
    compiled program over a mixed batch."""
    from piano_a2s_tpu.models.score_transcription import (
        ga_within_bar, ga_within_bar_auto, ga_within_bar_events)
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
    from piano_a2s_tpu.train.harness import _duration_fraction_table

    labels = LabelsMultiple(extended=True)
    full = ModelConfig()
    table = _duration_fraction_table(full.vocab_size)
    chordal = labels.encode("2c 2e\n4d\n4e") + [full.eos, full.pad,
                                                full.pad]
    legacy = labels.encode("2c 4d 4e") + [full.eos] + [full.pad] * 5
    T = max(len(chordal), len(legacy))
    rows = [r + [full.pad] * (T - len(r)) for r in (chordal, legacy)]
    gt = jnp.asarray(rows, jnp.int32)
    auto = np.asarray(ga_within_bar_auto(gt, table, full.pad,
                                         full.newline))
    ev = np.asarray(ga_within_bar_events(gt, table, full.pad,
                                         full.newline))
    tok = np.asarray(ga_within_bar(gt, table, full.pad))
    np.testing.assert_allclose(auto[0], ev[0])
    np.testing.assert_allclose(auto[1], tok[1])


def test_ga_event_map_ties_and_rests():
    """Ties and rests advance event time like any duration: '[2c' then
    '2c]' in the next position chain two half-note events; a rest event
    occupies its slot. Centers follow the event grid exactly."""
    from piano_a2s_tpu.models.score_transcription import (
        ga_within_bar_events)
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
    from piano_a2s_tpu.train.harness import _duration_fraction_table

    labels = LabelsMultiple(extended=True)
    full = ModelConfig()
    table = _duration_fraction_table(full.vocab_size)
    # [2c | 4r | 4c] : tie-open half, quarter rest, tied quarter close
    ids = labels.encode("[2c\n4r\n4c]") + [full.eos, full.pad]
    gt = jnp.asarray([ids], jnp.int32)
    ev = np.asarray(ga_within_bar_events(gt, table, full.pad,
                                         full.newline))[0]
    # tokens: [ [ 2 c \n | 4 r \n | 4 c ] eos pad ]
    want = [0.25] * 4 + [0.625] * 3 + [0.875] * 5
    np.testing.assert_allclose(ev, want, atol=1e-6)


def test_ga_map_pinning_fixes_single_event_chord_bar():
    """A bar holding ONE chord event ('1c 1e 1g', no separator) is
    token-indistinguishable from a legacy '<b>'-joined stream, so 'auto'
    routes it to the per-duration map and the chord double-counts
    (review finding). Pinning ga_map='events' (extras
    guided_attention_map) gives every token the single event's midpoint."""
    from piano_a2s_tpu.models.score_transcription import (
        ga_within_bar_auto, ga_within_bar_map)
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
    from piano_a2s_tpu.train.harness import _duration_fraction_table

    labels = LabelsMultiple(extended=True)
    full = ModelConfig()
    table = _duration_fraction_table(full.vocab_size)
    ids = labels.encode("1c 1e 1g") + [full.eos, full.pad]
    gt = jnp.asarray([ids], jnp.int32)
    ev = np.asarray(ga_within_bar_map(gt, table, full.pad, full.newline,
                                      "events"))[0]
    np.testing.assert_allclose(ev, [0.5] * len(ids), atol=1e-6)
    # The documented 'auto' limitation: no separator -> token map ->
    # spread centers (1/6, 1/2, 5/6 over a tripled total).
    auto = np.asarray(ga_within_bar_auto(gt, table, full.pad,
                                         full.newline))[0]
    assert abs(auto[0] - 1 / 6) < 1e-6 and abs(auto[-1] - 5 / 6) < 1e-6
    # 'tokens'/'auto' agree here; unknown modes error.
    tok = np.asarray(ga_within_bar_map(gt, table, full.pad, full.newline,
                                       "tokens"))[0]
    np.testing.assert_allclose(auto, tok)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ga_within_bar_map(gt, table, full.pad, full.newline, "nope")


def test_ga_map_threads_through_jitted_steps():
    """extras guided_attention_map='events' reaches the compiled train
    step: on a single-event chordal batch the GA penalty differs from the
    'auto' routing, with identical data/params otherwise."""
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
    from piano_a2s_tpu.train.harness import _duration_fraction_table

    labels = LabelsMultiple(extended=True)
    cfg = CFG
    table = _duration_fraction_table(cfg.vocab_size)
    optimizer = make_optimizer()
    batch = _batch()
    # One chord event per bar, no separator (the ambiguous shape).
    ids = labels.encode("1c 1e 1g")
    T = batch["upper"].shape[-1]
    row = (ids + [cfg.eos] + [cfg.pad] * T)[:T]
    batch["upper"] = np.tile(np.asarray(row, np.int32),
                             batch["upper"].shape[:2] + (1,))
    batch["upper_lengths"] = np.full(batch["upper_lengths"].shape,
                                     len(ids), np.int32)

    outs = {}
    for mode in ("auto", "events"):
        # Fresh trees per mode: the jitted step donates its buffers.
        params = init_params(jax.random.PRNGKey(0), cfg)
        state = init_state(cfg)
        opt_state = optimizer.init(params)
        t_step, _ = make_jitted_steps(optimizer, cfg, ga_weight=2.0,
                                      ga_sigma=0.1, ga_dur_frac=table,
                                      ga_map=mode)
        _, _, _, out = t_step(params, opt_state, state,
                              {k: jnp.asarray(v) for k, v in batch.items()},
                              jax.random.PRNGKey(1), 1.0)
        outs[mode] = float(jax.device_get(out.components["ga_loss"]))
    assert outs["auto"] != outs["events"]
