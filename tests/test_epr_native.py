"""Native expressive-performance renderer (data/epr_native.py).

Pins the rule system's observable behavior: determinism, phrase-arch
tempo + final ritardando, metrical/pitch velocity shaping, tie merging,
melody lead, composer conditioning, and the epr_generate contract into
the synthesis pipeline (MIDIProcess consumes the output like a
virtuosoNet render; reference contract: data_processing/render.py:395-455).
"""

import os

import numpy as np
import pytest

from piano_a2s_tpu.data.epr_native import (make_native_epr_generator,
                                           render_performance)
from piano_a2s_tpu.symbolic.export import export_target
from piano_a2s_tpu.symbolic.midi_io import MIDIProcess, read_midi
from piano_a2s_tpu.symbolic.vocab import LabelsMultiple

L = LabelsMultiple(extended=True)


def _target(upper_texts, lower_texts, keys=None, time_sigs=None):
    n = len(upper_texts)
    keys = keys or [0] * n
    time_sigs = time_sigs or ["4/4"] * n
    return [[keys[i], time_sigs[i], L.encode(lower_texts[i]),
             L.encode(upper_texts[i])] for i in range(n)]


def _xml(tmp_path, target, tag=""):
    path = os.path.join(str(tmp_path), f"score{tag}.xml")
    export_target(target, path)
    return path


def _steady_quarters(bars=4):
    """bars x 4/4 of steady quarter notes, melody up, bass down."""
    up = ["4c\n4d\n4e\n4f"] * bars
    low = ["4C\n4E\n4G\n4E"] * bars
    return _target(up, low)


def test_deterministic(tmp_path):
    xml = _xml(tmp_path, _steady_quarters())
    a = render_performance(xml, "Chopin",
                           os.path.join(str(tmp_path), "a.mid"))
    b = render_performance(xml, "Chopin",
                           os.path.join(str(tmp_path), "b.mid"))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()


def test_phrase_arch_and_final_rit(tmp_path):
    """Steady notated quarters must come out slower at the edges than in
    the middle, with the last inter-onset interval the longest."""
    xml = _xml(tmp_path, _steady_quarters(bars=4))
    mid = render_performance(xml, "Chopin",
                             os.path.join(str(tmp_path), "p.mid"))
    notes = read_midi(mid).notes()
    # Upper melody only (c4=60 ladder): one onset per quarter.
    ons = sorted(on for (on, _off, p, _v) in notes if p >= 60)
    iois = np.diff(ons)
    assert len(iois) >= 14
    mid_ioi = np.median(iois[4:-4])
    assert iois[0] > mid_ioi          # slow start (arch edge)
    assert iois[-1] > mid_ioi * 1.1   # final ritardando
    assert iois[-1] > iois[len(iois) // 2]


def test_downbeat_accent_and_pitch_height(tmp_path):
    xml = _xml(tmp_path, _steady_quarters(bars=4))
    mid = render_performance(xml, "DEFAULT",
                             os.path.join(str(tmp_path), "v.mid"))
    notes = sorted(read_midi(mid).notes())
    upper = [(on, p, v) for (on, _off, p, v) in notes if p >= 60]
    # Melody is c,d,e,f per bar: the bar-starting c carries the downbeat
    # accent, so despite being the LOWEST pitch of the bar it must beat
    # the immediately following d.
    for bar in range(4):
        c_vel = upper[4 * bar][2]
        d_vel = upper[4 * bar + 1][2]
        assert c_vel > d_vel
    # Pitch height: f (65) louder than d (62) within the same bar (both
    # unaccented; arch variation across one bar is small).
    mid_bar = 1
    d_vel = upper[4 * mid_bar + 1][2]
    f_vel = upper[4 * mid_bar + 3][2]
    assert f_vel >= d_vel


def test_ties_merge_to_one_sounding_note(tmp_path):
    """A whole note tied across the barline sounds ONCE, for the combined
    duration."""
    up = ["[1g", "1g]"]
    low = ["1C", "1C"]
    tied = _target(up, low)
    xml = _xml(tmp_path, tied, tag="tied")
    mid = render_performance(xml, "DEFAULT",
                             os.path.join(str(tmp_path), "t.mid"))
    g_notes = [(on, off) for (on, off, p, _v) in read_midi(mid).notes()
               if p == 67]
    assert len(g_notes) == 1
    on, off = g_notes[0]
    c_notes = sorted((on2, off2) for (on2, off2, p, _v)
                     in read_midi(mid).notes() if p == 48)
    assert len(c_notes) == 2  # untied twin stays two notes
    # The tied note spans both bars: it outlasts the first bass C by far.
    assert off - on > 1.5 * (c_notes[0][1] - c_notes[0][0])


def test_melody_lead(tmp_path):
    """Upper-staff notes sharing an attack with the bass lead it."""
    xml = _xml(tmp_path, _steady_quarters(bars=2))
    mid = render_performance(xml, "Chopin",
                             os.path.join(str(tmp_path), "l.mid"))
    notes = read_midi(mid).notes()
    melody = sorted(on for (on, _o, p, _v) in notes if p >= 60)
    bass = sorted(on for (on, _o, p, _v) in notes if p < 60)
    assert len(melody) == len(bass)
    # Skip the first pair (onsets clamp at 0); every later shared attack
    # has the melody strictly earlier.
    leads = [b - m for m, b in zip(melody[1:], bass[1:])]
    assert all(lead > 0.005 for lead in leads), leads
    assert np.mean(leads) == pytest.approx(0.022, abs=0.012)


def test_composer_conditioning(tmp_path):
    """Bach: detached articulation, flatter arch. Chopin: legato, slower
    base tempo -> longer total, longer sounding fractions."""
    xml = _xml(tmp_path, _steady_quarters(bars=2))
    bach = read_midi(render_performance(
        xml, "Bach", os.path.join(str(tmp_path), "bach.mid")))
    chopin = read_midi(render_performance(
        xml, "Chopin", os.path.join(str(tmp_path), "chopin.mid")))

    def sounding_fraction(mf):
        notes = sorted((on, off) for (on, off, p, _v) in mf.notes()
                       if p >= 60)
        fracs = [(off - on) / (n_on - on)
                 for (on, off), (n_on, _) in zip(notes, notes[1:])
                 if n_on > on]
        return np.median(fracs)

    assert sounding_fraction(bach) < 0.92
    assert sounding_fraction(chopin) > 0.97
    assert chopin.length_seconds() > bach.length_seconds()


def test_generator_contract_and_pipeline(tmp_path):
    """make_native_epr_generator feeds MIDIProcess exactly like a
    virtuosoNet render: single staging slot, processed output with
    scaling/length metadata."""
    xml = _xml(tmp_path, _steady_quarters(bars=4))
    gen = make_native_epr_generator(str(tmp_path / "slot"))
    p1 = gen(xml, "Beethoven")
    p2 = gen(xml, "Beethoven")
    assert p1 == p2 and os.path.isfile(p1)  # one overwritten slot

    rng = np.random.RandomState(0)
    out = os.path.join(str(tmp_path), "processed.mid")
    scaling, original = MIDIProcess(p1, "train", rng=rng).process(out)
    assert scaling is not None
    assert 4.0 <= original * scaling <= 12.0 + 1e-6
    assert os.path.isfile(out)
    # Processed file still parses and keeps all the notes.
    assert len(read_midi(out).notes()) == len(read_midi(p1).notes())


def test_unknown_composer_falls_back_to_default(tmp_path):
    xml = _xml(tmp_path, _steady_quarters(bars=2))
    a = render_performance(xml, "NotAComposer",
                           os.path.join(str(tmp_path), "x.mid"))
    b = render_performance(xml, "DEFAULT",
                           os.path.join(str(tmp_path), "y.mid"))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()


def test_mixed_meter_bar_geometry(tmp_path):
    """A 4/4 -> 3/4 chunk: downbeat accents land on TRUE barline onsets
    and the final ritardando is confined to the real last bar."""
    up = ["4c\n4d\n4e\n4f", "4g\n4a\n4b", "4c\n4d\n4e", "4f\n4g\n4a"]
    low = ["4C\n4D\n4E\n4F", "4G\n4A\n4B", "4C\n4D\n4E", "4F\n4G\n4A"]
    tgt = _target(up, low, time_sigs=["4/4", "3/4", "3/4", "3/4"])
    xml = _xml(tmp_path, tgt, tag="mm")
    mid = render_performance(xml, "DEFAULT",
                             os.path.join(str(tmp_path), "mm.mid"))
    notes = sorted(read_midi(mid).notes())
    upper = [(on, p, v) for (on, _off, p, v) in notes if p >= 60]
    assert len(upper) == 13
    # Bar-start indices in the upper melody: 0 (4/4), then 4, 7, 10.
    bar_starts = {0, 4, 7, 10}
    for i in range(13):
        if i in bar_starts and i + 1 not in bar_starts:
            assert upper[i][2] > upper[i + 1][2], i  # downbeat accent
    # Final rit: last IOI (inside the true last 3/4 bar) largest.
    ons = [on for (on, _p, _v) in upper]
    iois = [b - a for a, b in zip(ons, ons[1:])]
    assert iois[-1] == max(iois)
    # Penultimate-bar IOIs are NOT rit-inflated: strictly below the last.
    assert max(iois[6:9]) < iois[-1]


def test_score_composer_is_deadpan(tmp_path):
    """'score' renders exact notated proportions: flat velocity, no
    melody lead, no micro-timing, uniform IOIs."""
    xml = _xml(tmp_path, _steady_quarters(bars=2))
    mid = render_performance(xml, "score",
                             os.path.join(str(tmp_path), "sc.mid"))
    notes = sorted(read_midi(mid).notes())
    melody = [(on, v) for (on, _off, p, v) in notes if p >= 60]
    bass = [(on, v) for (on, _off, p, v) in notes if p < 60]
    # No melody lead: simultaneous attacks stay simultaneous.
    for (m, _), (b, _) in zip(melody, bass):
        assert m == pytest.approx(b, abs=1e-9)
    # Uniform IOIs at qpm 120: exactly 0.5 s.
    ons = [on for on, _ in melody]
    for a, b in zip(ons, ons[1:]):
        assert (b - a) == pytest.approx(0.5, abs=1e-3)
    # Constant velocity, like score MIDI.
    vels = {v for _, v in melody} | {v for _, v in bass}
    assert len(vels) == 1


def test_xml_to_midi_score_chunks_survive_without_verovio(tmp_path,
                                                          monkeypatch):
    """midi_syn=epr + native engine + NO verovio: the composer=='score'
    draws (all of test/valid v=0) render through the deadpan style
    instead of being silently dropped (review finding)."""
    import json
    import pickle

    from piano_a2s_tpu.data import render as R

    # Empty PATH so have_tool('verovio') is False regardless of host.
    monkeypatch.setenv("PATH", str(tmp_path / "emptybin"))
    os.makedirs(tmp_path / "emptybin", exist_ok=True)
    assert not R.have_tool("verovio")

    base = tmp_path / "features" / "test" / "0"
    for d in ("xml", "target", "info"):
        os.makedirs(base / d)
    tgt = _steady_quarters(bars=4)
    export_target(tgt, str(base / "xml" / "song.xml"))
    with open(base / "target" / "song.pkl", "wb") as f:
        pickle.dump(tgt, f)
    with open(base / "info" / "song.json", "w") as f:
        json.dump({}, f)

    gen = make_native_epr_generator(str(tmp_path / "slot"))
    R.xml_to_midi([0], str(tmp_path / "features"), midi_syn="epr",
                  seed=0, epr_generate=gen)
    # TEST_COMPOSERS[0] == 'score' -> rendered via the deadpan fallback.
    assert os.path.isfile(base / "midi" / "song.mid")
    info = json.load(open(base / "info" / "song.json"))
    assert info["composer"] == "score"
