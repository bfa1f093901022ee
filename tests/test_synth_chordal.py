"""Chordal synthetic-corpus generator (the real pipeline's target shape).

The reference's pretrain corpus is chordal kern with ties, rests and a
7-meter mix (reference: data_processing/render.py:204-230 targets,
data_processing/humdrum.py:99-127 '<b>'/newline encoding). These tests pin
the chordal generator to exactly those semantics: newline-separated
events, '<b>'-joined chords with per-note durations, cross-bar tie
syntax '[2c ... 2c]', exact bar tiling per meter, token caps, and the
corpus layout the dataset layer reads."""

import os

import numpy as np
import pytest

from piano_a2s_tpu.data.synth import (_METERS, draw_song_chordal,
                                      synthesize_chordal_audio,
                                      write_corpus)
from piano_a2s_tpu.symbolic.vocab import LabelsMultiple

LABELS = LabelsMultiple(extended=True)


def test_targets_roundtrip_and_caps():
    """decode(encode(text)) re-encodes identically, and every bar stays
    inside the reference's (398, 189) per-bar token caps."""
    for s in range(60):
        target, _ = draw_song_chordal(np.random.RandomState(s))
        for key, ts, low, up in target:
            assert len(up) < 398 and len(low) < 189
            for toks in (low, up):
                text = "".join(LABELS.decode(toks))
                assert LABELS.encode(text) == list(toks)


def test_meter_mix_and_exact_bar_tiling():
    """All 7 reference meters appear over enough draws, and every bar's
    event durations sum EXACTLY to the meter's bar length (Fraction
    arithmetic — the proportional audio layout and the GA event map both
    assume exact tiling)."""
    seen = set()
    for s in range(120):
        target, bars = draw_song_chordal(np.random.RandomState(s))
        ts = target[0][1]
        seen.add(ts)
        bar_len = dict(_METERS)[ts]
        for up, low in bars:
            assert sum(e.frac for e in up) == bar_len
            assert sum(e.frac for e in low) == bar_len
        # one meter and one key per song (reference chunks behave so)
        assert {m[1] for m in target} == {ts}
    assert seen == {m[0] for m in _METERS}


def test_event_semantics_chords_ties_rests():
    """The serialized text uses the real pipeline's separators: events on
    their own lines ('\\n' token), chord notes space-joined ('<b>' token)
    each with its OWN duration token, ties as '[dur pitch' / 'dur pitch]'
    pairs on the same pitch, rests as 'Nr'."""
    nl, b = LABELS.labels_map["\n"], LABELS.labels_map["<b>"]
    saw_chord = saw_tie = saw_rest = False
    for s in range(80):
        target, bars = draw_song_chordal(np.random.RandomState(s))
        for bar_i, (up, low) in enumerate(bars):
            for staff_events, toks in ((up, target[bar_i][3]),
                                       (low, target[bar_i][2])):
                n_events = len(staff_events)
                assert toks.count(nl) == n_events - 1
                for e in staff_events:
                    if len(e.notes) > 1:
                        saw_chord = True
                        # every chord note carries its own duration token
                        assert e.text().count(e.dur_tok) >= len(e.notes)
                    if e.is_rest:
                        saw_rest = True
                        assert e.text().endswith("r")
        for bi in range(len(bars) - 1):
            for s2 in range(2):
                last, first = bars[bi][s2][-1], bars[bi + 1][s2][0]
                if last.tie_open:
                    saw_tie = True
                    assert first.tie_close
                    assert first.notes == last.notes  # same pitch sustains
                    assert last.text().startswith("[")
                    assert first.text().endswith("]")
    assert saw_chord and saw_tie and saw_rest


def test_audio_renders_and_ties_do_not_reattack():
    """Audio is non-silent and normalized; a tied pair renders as ONE
    continuous note: the tie-close onset has no fresh attack transient
    (compare against the same song with the tie broken)."""
    rng = np.random.RandomState(3)
    found = None
    for s in range(200):
        target, bars = draw_song_chordal(np.random.RandomState(s))
        for bi in range(len(bars) - 1):
            if bars[bi][0][-1].tie_open:
                found = (s, bi)
                break
        if found:
            break
    assert found, "no tie drawn in 200 songs?"
    s, bi = found
    _, bars = draw_song_chordal(np.random.RandomState(s))
    tied = synthesize_chordal_audio(bars, clip_seconds=10.0)
    assert tied.dtype == np.float32 and np.abs(tied).max() > 0.1
    # break the tie: the close event re-attacks at the barline
    _, bars2 = draw_song_chordal(np.random.RandomState(s))
    bars2[bi][0][-1].tie_open = False
    bars2[bi + 1][0][0].tie_close = False
    broken = synthesize_chordal_audio(bars2, clip_seconds=10.0)
    sr, bar_s = 16000, 10.0 / len(bars)
    t_close = (bi + 1) * bar_s
    w0, w1 = int((t_close - 0.002) * sr), int((t_close + 0.02) * sr)
    # the signals must differ around the tied barline (no re-attack vs
    # re-attack) and agree before the tied note starts
    assert not np.allclose(tied[w0:w1], broken[w0:w1], atol=1e-4)


def test_write_corpus_chordal_layout(tmp_path):
    """chordal=True writes the same on-disk layout the datasets read, with
    multi-version rendering of IDENTICAL targets."""
    import pickle

    root = str(tmp_path)
    n = write_corpus(root, "train", 3, seed=5, frontend="none",
                     save_audio=True, versions=[0, 1], chordal=True)
    assert n == 3
    targets = {}
    for v in (0, 1):
        base = os.path.join(root, "train", str(v))
        pkls = sorted(os.listdir(os.path.join(base, "target")))
        assert len(pkls) == 3
        for p in pkls:
            with open(os.path.join(base, "target", p), "rb") as f:
                t = pickle.load(f)
            assert len(t) == 5 and len(t[0]) == 4
            targets.setdefault(p, []).append(t)
    for p, (t0, t1) in targets.items():
        assert t0 == t1  # same symbolic content across versions


@pytest.mark.parametrize("staff", [0, 1])
def test_ga_event_map_matches_rendered_layout(staff):
    """End-to-end consistency: the GA event map's centers on a chordal
    target match the audio's actual proportional layout (event onsets /
    bar length as rendered by synthesize_chordal_audio)."""
    import jax.numpy as jnp

    from piano_a2s_tpu.models import ModelConfig
    from piano_a2s_tpu.models.score_transcription import (
        ga_within_bar_events)
    from piano_a2s_tpu.train.harness import _duration_fraction_table

    cfg = ModelConfig()
    table = _duration_fraction_table(cfg.vocab_size)
    target, bars = draw_song_chordal(np.random.RandomState(11))
    bar_i = 2
    events = bars[bar_i][staff]
    toks = target[bar_i][3 if staff == 0 else 2]
    gt = jnp.asarray([toks], jnp.int32)
    within = np.asarray(
        ga_within_bar_events(gt, table, cfg.pad, cfg.newline))[0]
    # expected midpoint of each event from the exact Fraction layout
    bar_len = sum(e.frac for e in events)
    t, starts = 0, []
    for e in events:
        starts.append(float((t + e.frac / 2) / bar_len))
        t += e.frac
    # walk the token stream event by event (newline-delimited)
    nl = cfg.newline
    ev_i, pos = 0, 0
    for tok in toks:
        np.testing.assert_allclose(within[pos], starts[ev_i], atol=1e-5)
        if tok == nl:
            ev_i += 1
        pos += 1
