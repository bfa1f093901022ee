"""Native MV2H scorer tests (train/mv2h.py).

The real Java tool is absent from this image, so the scorer is pinned
three ways: (a) algebraic cases derived from the published algorithm
(McLeod & Steedman, ISMIR 2018 — the metric the reference's
evaluate_midi_mv2h.sh:8-10 invokes), (b) interop with the intermediate
text format recorded from the tool in the fake-java contract tests, and
(c) round-trips through our real MIDI exporter so midi_to_score is
exercised on the bytes the offline evaluator feeds the metric.
"""

import math

import pytest

from piano_a2s_tpu.symbolic.midi_io import MidiEvent, MidiFile, \
    write_midi_file
from piano_a2s_tpu.train.mv2h import (Hierarchy, MV2HScore, Note,
                                      evaluate_mv2h, midi_to_score,
                                      parse_score, run_native_mv2h_pair)

TPQ = 480


def _delta_track(abs_events):
    """[(tick, status, data)] -> MidiEvent list with delta times."""
    out, prev = [], 0
    for tick, status, data in sorted(abs_events, key=lambda e: e[0]):
        out.append(MidiEvent(tick - prev, status, data))
        prev = tick
    out.append(MidiEvent(0, 0xFF, b"\x2f"))
    return out


def write_test_midi(path, notes_by_voice, tempo_us=500000, timesig=(4, 2),
                    keysig=(0, 0)):
    """notes_by_voice: [[(onset_ticks, dur_ticks, pitch), ...], ...].
    timesig = (numerator, denominator_power); keysig = (sf, mi)."""
    conductor = _delta_track([
        (0, 0xFF, b"\x51" + tempo_us.to_bytes(3, "big")),
        (0, 0xFF, b"\x58" + bytes([timesig[0], timesig[1], 24, 8])),
        (0, 0xFF, b"\x59" + bytes([keysig[0] % 256, keysig[1]])),
    ])
    tracks = [conductor]
    for notes in notes_by_voice:
        evs = []
        for on, dur, pitch in notes:
            evs.append((on, 0x90, bytes([pitch, 80])))
            evs.append((on + dur, 0x80, bytes([pitch, 0])))
        tracks.append(_delta_track(evs))
    write_midi_file(MidiFile(TPQ, tracks), str(path))


def quarters(n):
    """n quarter notes in ticks."""
    return int(n * TPQ)


def simple_score():
    """Two voices, 2 bars of 4/4 at 120 BPM (quarter = 500 ms)."""
    upper = [(quarters(i), quarters(1), 60 + i) for i in range(8)]
    lower = [(quarters(2 * i), quarters(2), 48 + i) for i in range(4)]
    return [upper, lower]


# ---------------------------------------------------------------------------
# midi_to_score (the Converter twin)
# ---------------------------------------------------------------------------

def test_midi_to_score_notes_and_timing(tmp_path):
    p = tmp_path / "a.mid"
    write_test_midi(p, simple_score())
    s = midi_to_score(str(p))
    assert len(s.notes) == 12
    ups = sorted((n for n in s.notes if n.voice == 0),
                 key=lambda n: n.on)
    # 120 BPM: quarter note = 500 ms
    assert [n.on for n in ups] == [500 * i for i in range(8)]
    assert all(n.dur == 500 for n in ups)
    assert all(n.val_on == n.on for n in s.notes)
    lows = [n for n in s.notes if n.voice == 1]
    assert len(lows) == 4 and all(n.dur == 1000 for n in lows)


def test_midi_to_score_tatums_and_hierarchy(tmp_path):
    p = tmp_path / "a.mid"
    write_test_midi(p, simple_score())  # 4/4
    s = midi_to_score(str(p))
    # simple meter: sub-beat = eighth note = 250 ms, through the last
    # offset (4000 ms) inclusive
    assert s.tatums[:4] == [0, 250, 500, 750]
    assert s.tatums[-1] == 4000
    h = s.hierarchy
    assert (h.beats_per_bar, h.sub_beats_per_beat) == (4, 2)


def test_midi_to_score_compound_meter(tmp_path):
    p = tmp_path / "a.mid"
    # 6/8: denominator power 3; sub-beat = one eighth = 240 ticks = 250 ms
    write_test_midi(p, [[(0, quarters(3), 60)]], timesig=(6, 3))
    s = midi_to_score(str(p))
    h = s.hierarchy
    assert (h.beats_per_bar, h.sub_beats_per_beat) == (2, 3)
    assert s.tatums[:3] == [0, 250, 500]


def test_midi_to_score_keys(tmp_path):
    p = tmp_path / "a.mid"
    write_test_midi(p, [[(0, quarters(1), 60)]], keysig=(2, 0))  # D major
    s = midi_to_score(str(p))
    assert s.keys == [(2, True, 0)]
    write_test_midi(p, [[(0, quarters(1), 60)]], keysig=(0, 1))  # A minor
    s = midi_to_score(str(p))
    assert s.keys == [(9, False, 0)]
    write_test_midi(p, [[(0, quarters(1), 60)]], keysig=(-1 % 256, 0))  # F
    s = midi_to_score(str(p))
    assert s.keys == [(5, True, 0)]


def test_midi_to_score_tempo_change(tmp_path):
    p = tmp_path / "a.mid"
    tracks = [
        _delta_track([
            (0, 0xFF, b"\x51" + (500000).to_bytes(3, "big")),
            (quarters(2), 0xFF, b"\x51" + (250000).to_bytes(3, "big")),
        ]),
        _delta_track([(0, 0x90, bytes([60, 80])),
                      (quarters(4), 0x80, bytes([60, 0]))]),
    ]
    write_midi_file(MidiFile(TPQ, tracks), str(tmp_path / "t.mid"))
    s = midi_to_score(str(tmp_path / "t.mid"))
    # 2 quarters at 120 BPM (1000 ms) + 2 at 240 BPM (500 ms)
    assert s.notes[0].on == 0 and s.notes[0].val_off == 1500


# ---------------------------------------------------------------------------
# Intermediate-format interop (the recorded Converter contract)
# ---------------------------------------------------------------------------

RECORDED_CONVERTER_STDOUT = """\
Note 60 0 0 500 0
Note 64 500 500 1000 0
Tatum 0
Tatum 250
Hierarchy 4,2 2 a=4 anacrusis=0
Key 0 Maj 0
CHECKSUM deadbeef
"""


def test_parse_recorded_converter_format():
    s = parse_score(RECORDED_CONVERTER_STDOUT)
    assert len(s.notes) == 2
    assert s.notes[0] == Note(60, 0, 0, 500, 0)
    assert s.tatums == [0, 250]
    assert s.hierarchy.beats_per_bar == 4
    assert s.hierarchy.sub_beats_per_beat == 2
    assert s.hierarchy.tatums_per_sub_beat == 2
    assert s.hierarchy.anacrusis == 4
    assert s.keys == [(0, True, 0)]


def test_to_text_parse_round_trip(tmp_path):
    p = tmp_path / "a.mid"
    write_test_midi(p, simple_score(), keysig=(1, 1))
    s = midi_to_score(str(p))
    s2 = parse_score(s.to_text())
    assert s2.tatums == s.tatums
    assert s2.keys == s.keys
    assert s2.hierarchy == s.hierarchy
    assert sorted((n.pitch, n.on, n.val_on, n.val_off, n.voice)
                  for n in s2.notes) == \
        sorted((n.pitch, n.on, n.val_on, n.val_off, n.voice)
               for n in s.notes)


# ---------------------------------------------------------------------------
# evaluate_mv2h: component semantics
# ---------------------------------------------------------------------------

def _eval_midi(tmp_path, gt_notes, tr_notes, align=True, **kw):
    g, t = tmp_path / "gt.mid", tmp_path / "tr.mid"
    write_test_midi(g, gt_notes, **kw)
    write_test_midi(t, tr_notes, **kw)
    return evaluate_mv2h(midi_to_score(str(g)), midi_to_score(str(t)),
                         align=align)


def test_identity_scores_all_one(tmp_path):
    r = _eval_midi(tmp_path, simple_score(), simple_score())
    for k in ["Multi-pitch", "Voice", "Meter", "Value", "Harmony", "MV2H"]:
        assert r[k] == pytest.approx(1.0), (k, r)


def test_multipitch_missing_note(tmp_path):
    gt = simple_score()
    tr = [gt[0][:-1], gt[1]]  # drop one of 12 notes
    r = _eval_midi(tmp_path, gt, tr)
    # tp=11, fp=0, fn=1 -> F1 = 22/23
    assert r["Multi-pitch"] == pytest.approx(22 / 23)


def test_multipitch_wrong_pitch(tmp_path):
    gt = [[(0, quarters(1), 60), (quarters(1), quarters(1), 62)]]
    tr = [[(0, quarters(1), 60), (quarters(1), quarters(1), 63)]]
    r = _eval_midi(tmp_path, gt, tr, align=False)
    # tp=1, fp=1, fn=1
    assert r["Multi-pitch"] == pytest.approx(0.5)


def test_onset_tolerance_window():
    gt = MV2HScore(notes=[Note(60, 1000, 1000, 1500, 0)],
                   tatums=[0, 500, 1000, 1500])
    near = MV2HScore(notes=[Note(60, 1040, 1040, 1540, 0)],
                     tatums=[0, 500, 1000, 1500])
    far = MV2HScore(notes=[Note(60, 1060, 1060, 1560, 0)],
                    tatums=[0, 500, 1000, 1500])
    assert evaluate_mv2h(gt, near, align=False)["Multi-pitch"] == 1.0
    assert evaluate_mv2h(gt, far, align=False)["Multi-pitch"] == 0.0


def test_voice_split_penalized(tmp_path):
    gt = [[(quarters(i), quarters(1), 60 + i) for i in range(4)]]
    # same notes, split across two voices
    tr = [[(quarters(i), quarters(1), 60 + i) for i in (0, 2)],
          [(quarters(i), quarters(1), 60 + i) for i in (1, 3)]]
    r = _eval_midi(tmp_path, gt, tr)
    assert r["Multi-pitch"] == pytest.approx(1.0)
    # gt links: 3 consecutive pairs; tr links: (0,2) and (1,3) - neither
    # is a gt link -> tp=0
    assert r["Voice"] == 0.0


def test_value_truncated_duration(tmp_path):
    gt = [[(0, quarters(2), 60)]]
    tr = [[(0, quarters(1), 60)]]  # offset 500 ms early, dur 1000 ms
    r = _eval_midi(tmp_path, gt, tr)
    assert r["Value"] == pytest.approx(0.5)


def test_meter_wrong_time_signature(tmp_path):
    gt_notes = [[(quarters(i), quarters(1), 60) for i in range(12)]]
    g, t = tmp_path / "g.mid", tmp_path / "t.mid"
    write_test_midi(g, gt_notes, timesig=(4, 2))
    write_test_midi(t, gt_notes, timesig=(3, 2))
    r = evaluate_mv2h(midi_to_score(str(g)), midi_to_score(str(t)))
    assert r["Multi-pitch"] == pytest.approx(1.0)
    # sub-beat and beat levels agree, bars don't
    assert 0.0 < r["Meter"] < 1.0


def test_harmony_key_partial_credit():
    def k(tonic, major, notes):
        return MV2HScore(notes=notes, tatums=[0, 500, 1000],
                         keys=[(tonic, major, 0)])
    notes = [Note(60, 0, 0, 1000, 0)]
    gt = k(0, True, notes)
    assert evaluate_mv2h(gt, k(0, True, notes))["Harmony"] == 1.0
    assert evaluate_mv2h(gt, k(7, True, notes))["Harmony"] == 0.5
    assert evaluate_mv2h(gt, k(9, False, notes))["Harmony"] == \
        pytest.approx(0.3)
    assert evaluate_mv2h(gt, k(0, False, notes))["Harmony"] == \
        pytest.approx(0.2)
    assert evaluate_mv2h(gt, k(2, True, notes))["Harmony"] == 0.0


def test_alignment_absorbs_constant_offset(tmp_path):
    gt = simple_score()
    shifted = [[(on + quarters(1), d, p) for on, d, p in voice]
               for voice in gt]
    r = _eval_midi(tmp_path, gt, shifted, align=True)
    assert r["Multi-pitch"] == pytest.approx(1.0)
    assert r["Voice"] == pytest.approx(1.0)
    assert r["Value"] == pytest.approx(1.0)
    r0 = _eval_midi(tmp_path, gt, shifted, align=False)
    assert r0["Multi-pitch"] == 0.0


def test_mv2h_is_mean_of_components(tmp_path):
    gt = simple_score()
    tr = [gt[0][:-2], gt[1]]
    r = _eval_midi(tmp_path, gt, tr)
    expect = (r["Multi-pitch"] + r["Voice"] + r["Meter"] + r["Value"]
              + r["Harmony"]) / 5
    assert r["MV2H"] == pytest.approx(expect)
    assert all(0.0 <= r[k] <= 1.0 for k in r)


def test_empty_vs_empty_and_empty_vs_notes():
    empty = MV2HScore(tatums=[0, 500, 1000])
    full = MV2HScore(notes=[Note(60, 0, 0, 500, 0)],
                     tatums=[0, 500, 1000])
    same = evaluate_mv2h(empty, empty)
    assert same["Multi-pitch"] == 1.0
    r = evaluate_mv2h(full, empty)
    assert r["Multi-pitch"] == 0.0


# ---------------------------------------------------------------------------
# run_native_mv2h_pair (the run_mv2h_pair twin)
# ---------------------------------------------------------------------------

def test_run_native_pair_contract(tmp_path):
    g, t = tmp_path / "g.mid", tmp_path / "t.mid"
    write_test_midi(g, simple_score())
    write_test_midi(t, simple_score())
    r = run_native_mv2h_pair(str(g), str(t))
    assert set(r) == {"Multi-pitch", "Voice", "Meter", "Value", "Harmony",
                      "MV2H"}
    assert r["MV2H"] == pytest.approx(1.0)


def test_run_native_pair_unreadable_returns_none(tmp_path):
    bad = tmp_path / "bad.mid"
    bad.write_bytes(b"not a midi file")
    good = tmp_path / "g.mid"
    write_test_midi(good, simple_score())
    assert run_native_mv2h_pair(str(bad), str(good)) is None
    assert run_native_mv2h_pair(str(good), str(tmp_path / "no.mid")) is None


def test_tatum_grid_reanchors_at_time_signature_change(tmp_path):
    """4/4 -> 2/2 at tick 1920 (tpq 480): the 2/2 grid must land on
    1920, 2400, 2880... — not inherit the 4/4 segment's 240-tick
    sub-beat overshoot (review finding: the phase shift exceeded the
    50 ms onset tolerance and collapsed Meter for the whole tail)."""
    from piano_a2s_tpu.symbolic.midi_io import MidiEvent, MidiFile, \
        write_midi_file
    from piano_a2s_tpu.train.mv2h import midi_to_score

    tempo = MidiEvent(0, 0xFF, b"\x51" + (500000).to_bytes(3, "big"))
    ts1 = MidiEvent(0, 0xFF, bytes([0x58, 4, 2, 24, 8]))   # 4/4 at 0
    ts2 = MidiEvent(0, 0xFF, bytes([0x58, 2, 1, 24, 8]))  # 2/2 at 1920
    track = [tempo, ts1,
             MidiEvent(0, 0x90, bytes([60, 64])),
             MidiEvent(1920, 0x80, bytes([60, 64])),  # -> tick 1920
             ts2,                                     # change AT 1920
             MidiEvent(0, 0x90, bytes([62, 64])),
             MidiEvent(1920, 0x80, bytes([62, 64]))]  # -> tick 3840
    path = str(tmp_path / "ts_change.mid")
    write_midi_file(MidiFile(480, [track]), path)

    score = midi_to_score(path)
    # 500000 us/qn -> 1 tick = 1000/480 ms. 2/2 sub-beat (2 per half-note
    # beat) = quarter note = 480 ticks = 500 ms anchored AT 1920: the
    # tail grid is 2000, 2500, 3000... (the pre-fix overshoot carry gave
    # 2000, 2250, 2500 — the 4/4 eighth grid continuing).
    tail = [t for t in score.tatums if t >= 1999]
    assert tail[:4] == [2000, 2500, 3000, 3500], score.tatums
