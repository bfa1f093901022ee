"""Regression tests for symbolic-layer review findings."""

from fractions import Fraction

from piano_a2s_tpu.symbolic.export import get_score_from_target
from piano_a2s_tpu.symbolic.midi import _events_for_part
from piano_a2s_tpu.symbolic.native import tiefix_kern, transpose_kern, \
    _py_tiefix, _py_transpose
from piano_a2s_tpu.symbolic.score import (parse_staff_kern, repair_ties,
                                          timed_notes)
from piano_a2s_tpu.symbolic.vocab import LabelsMultiple

LM = LabelsMultiple(extended=True)


def test_empty_measures_preserved():
    """An empty model-output bar must still occupy a measure slot."""
    target = [
        [0, "4/4", LM.encode("2C"), LM.encode("4c")],
        [1, "3/4", [], []],                       # empty bar
        [2, "2/4", LM.encode("2G"), LM.encode("4g")],
    ]
    score = get_score_from_target(target)
    for part in score.parts:
        assert len(part.measures) == 3
        assert [m.key_fifths for m in part.measures] == [0, 1, 2]
        assert [m.time_sig for m in part.measures] == [(4, 4), (3, 4),
                                                       (2, 4)]
        assert part.measures[1].voices == [[]]


def test_dangling_continue_becomes_close():
    data = "**kern\n[4c\n4c_\n*-\n"
    for fn in (tiefix_kern, _py_tiefix):
        out = fn(data)
        lines = out.splitlines()
        assert lines[1] == "[4c", fn.__name__
        assert lines[2] == "4c]", fn.__name__  # '_' ended, not stripped


def test_tie_across_voice_count_change():
    # Measure 1: two voices, tie opened in column 2; measure 2: merged to
    # one voice closing the tie. The chain must survive the re-indexing.
    kern = "4d\t[2c\n4e\t2c_\n=\n2c]\n"
    part = parse_staff_kern(kern, [0, 0], ["2/4", "2/4"])
    repair_ties(part)
    events = _events_for_part(part)
    c_events = [e for e in events if e[2] == 60]
    assert len(c_events) == 1  # one sustained C across the merge
    onset, dur, _ = c_events[0]
    assert dur == 480 * 6  # three tied half notes = 6 quarters


def test_cross_voice_same_pitch_not_merged():
    # Voice 1 ties c4->c4; voice 2 sounds its own c4 mid-way: the voice-2
    # note is NOT temporally adjacent to the open tie, so it stays separate.
    kern = "[2c\t4r\n.\t4c\n2c]\t2r\n"
    part = parse_staff_kern(kern, [0], ["4/4"])
    repair_ties(part)
    events = _events_for_part(part)
    c_events = sorted(e for e in events if e[2] == 60)
    assert len(c_events) == 2
    assert c_events[0][1] == 480 * 4  # the tied whole (2+2 quarters)
    assert c_events[1][1] == 480     # voice 2's quarter


def test_tonality_case_preserved_in_transpose():
    data = "**kern\n*B:\n4B\n*-\n"
    for fn in (transpose_kern, _py_transpose):
        out = fn(data, "M2")
        assert "*C#:" in out, fn.__name__  # stays MAJOR (uppercase)
    data = "**kern\n*c:\n4c\n*-\n"
    for fn in (transpose_kern, _py_transpose):
        out = fn(data, "-m2")
        assert "*b:" in out, fn.__name__  # stays MINOR (lowercase)


def test_timed_notes_measure_advance():
    part = parse_staff_kern("4c\n=\n4d", [0, 0], ["4/4", "4/4"])
    notes = timed_notes(part)
    assert notes[0][0] == Fraction(0)
    assert notes[1][0] == Fraction(1)  # second measure starts at 1 whole


def test_midi_velocity_from_note_on(tmp_path):
    from piano_a2s_tpu.symbolic.midi import write_midi
    from piano_a2s_tpu.symbolic.midi_io import read_midi
    from piano_a2s_tpu.symbolic.score import Score
    part = parse_staff_kern("4c\n4d", [0], ["4/4"])
    path = str(tmp_path / "v.mid")
    write_midi(Score(parts=[part]), path)
    notes = read_midi(path).notes()
    assert all(v == 80 for *_, v in notes)


def test_mid_measure_voice_split_timing():
    """A voice created by a MID-measure *^ split enters at the primary
    voice's elapsed time, not the measure start (regression: voice-2
    onsets were all shifted to the measure start, corrupting MIDI/
    MusicXML timing and tie adjacency for split-carrying chunks)."""
    from fractions import Fraction

    from piano_a2s_tpu.symbolic.score import parse_staff_kern, timed_notes

    kern = "4c\n*^\n4d\t4e\n4e\t4f\n4f\t4g\n=\n"
    part = parse_staff_kern(kern, [0], ["4/4"])
    assert part.measures[0].voice_offsets[1] == Fraction(1, 4)
    v1_onsets = sorted(on for on, _, v, _ in timed_notes(part) if v == 1)
    assert v1_onsets == [Fraction(1, 4), Fraction(1, 2), Fraction(3, 4)]

    # a split carried over FROM a previous measure starts at offset 0
    kern2 = "*^\n4c\t4e\n=\n4d\t4f\n=\n"
    part2 = parse_staff_kern(kern2, [0, 0], ["4/4", "4/4"])
    assert part2.measures[0].voice_offsets[1] == 0
    assert part2.measures[1].voice_offset(1) == 0

    # MusicXML backup reflects the entry point (backs up 3/4, not 4/4)
    from piano_a2s_tpu.symbolic.musicxml import _measure_xml
    xml = _measure_xml(part.measures[0], 48, 1, "treble", first=True,
                      prev=None)
    assert "<backup>" in xml
    import re
    backup = int(re.search(r"<backup>\s*<duration>(\d+)</duration>",
                           xml).group(1))
    assert backup == int(Fraction(3, 4) * 4 * 48)
