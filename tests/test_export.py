"""Score export tests: kern parsing, tie repair, MusicXML and MIDI writers."""

import xml.etree.ElementTree as ET
from fractions import Fraction

from piano_a2s_tpu.symbolic.export import (export_target,
                                           get_score_from_target,
                                           tokens_to_kern)
from piano_a2s_tpu.symbolic.midi import _events_for_part, write_midi
from piano_a2s_tpu.symbolic.musicxml import score_to_musicxml
from piano_a2s_tpu.symbolic.score import (parse_note, parse_staff_kern,
                                          repair_ties, spelled_pitch)
from piano_a2s_tpu.symbolic.vocab import LabelsMultiple

LM = LabelsMultiple(extended=True)


def _target_from_kern(measures_upper, measures_lower, keys, time_sigs):
    return [[keys[i], time_sigs[i], LM.encode(measures_lower[i]),
             LM.encode(measures_upper[i])]
            for i in range(len(keys))]


def test_parse_note_durations():
    assert parse_note("4c").duration == Fraction(1, 4)
    assert parse_note("4.c").duration == Fraction(3, 8)
    assert parse_note("3c").duration == Fraction(1, 3)
    assert parse_note("8r").is_rest
    n = parse_note("[2B-")
    assert n.tie_start and n.alter == -1 and n.midi == 58
    n = parse_note("16dd#;]")
    assert n.tie_stop and n.fermata and n.midi == 75
    assert parse_note("banana") is None


def test_spelled_pitch_octaves():
    assert spelled_pitch("c") == ("C", 0, 4, 60)
    assert spelled_pitch("cc") == ("C", 0, 5, 72)
    assert spelled_pitch("C") == ("C", 0, 3, 48)
    assert spelled_pitch("CC") == ("C", 0, 2, 36)
    assert spelled_pitch("AA") == ("A", 0, 2, 45)
    assert spelled_pitch("b-") == ("B", -1, 4, 70)


def test_parse_staff_two_voices():
    kern = "4c\n*^\n4d\t4e\n*v\n2f\n=\n1g"
    part = parse_staff_kern(kern, [2, 2], ["4/4", "4/4"])
    assert len(part.measures) == 2
    m0 = part.measures[0]
    assert len(m0.voices) == 2
    assert m0.key_fifths == 2


def test_tie_repair_dangling():
    # '[4c' never closed (chunk boundary); '4d]' never opened.
    part = parse_staff_kern("[4c\n4d]\n[4e\n4e]", [0], ["4/4"])
    repair_ties(part)
    notes = [n for v in part.measures[0].voices for c in v for n in c.notes]
    c, d, e1, e2 = notes
    assert not c.tie_start
    assert not d.tie_stop
    assert e1.tie_start and e2.tie_stop  # the valid pair survives


def test_midi_tie_merge(tmp_path):
    part = parse_staff_kern("[4c\n4c]\n4d", [0], ["4/4"])
    repair_ties(part)
    events = _events_for_part(part)
    assert len(events) == 2  # tied c's merged into one event
    onset, dur, midi = events[0]
    assert midi == 60 and dur == 480 * 2  # two quarters at 480 tpq


def test_full_export(tmp_path):
    upper = ["4c 4e 4g\t2cc\n4d\t2dd", "1r"]
    lower = ["2C\n2G", "[1CC", ]
    target = _target_from_kern(upper, lower, keys=[1, 1],
                               time_sigs=["4/4", "4/4"])
    xml_path = str(tmp_path / "out.xml")
    midi_path = str(tmp_path / "out.mid")
    score = export_target(target, xml_path, midi_path)
    assert len(score.parts) == 2

    # MusicXML is well-formed with expected structure
    tree = ET.parse(xml_path)
    root = tree.getroot()
    assert root.tag == "score-partwise"
    parts = root.findall("part")
    assert len(parts) == 2
    measures = parts[0].findall("measure")
    assert len(measures) == 2
    fifths = measures[0].find(".//fifths")
    assert fifths is not None and fifths.text == "1"
    # chord notes marked
    notes = measures[0].findall("note")
    assert any(n.find("chord") is not None for n in notes)

    # MIDI header valid; tracks = conductor + 2 parts
    raw = open(midi_path, "rb").read()
    assert raw[:4] == b"MThd"
    import struct
    fmt, ntrk, tpq = struct.unpack(">HHH", raw[8:14])
    assert (fmt, ntrk, tpq) == (1, 3, 480)
    assert raw.count(b"MTrk") == 3


def test_tokens_to_kern_dedupes_chords():
    toks = LM.encode("4c 4c 4e")
    kern = tokens_to_kern([toks])
    assert kern.splitlines()[0] == "4c 4e"


def test_get_score_handles_garbage_tokens():
    # Model output can contain structurally invalid sequences; the parser
    # must skip them without raising.
    garbage = [[0, "4/4", [4, 4, 4], [63, 63]],
               [0, "3/4", LM.encode("4c"), LM.encode("4d")]]
    score = get_score_from_target(garbage)
    assert len(score.parts[0].measures) >= 1
    xml = score_to_musicxml(score)
    ET.fromstring(xml)


def test_musicxml_two_voice_backup():
    part = parse_staff_kern("*^\n4c\t4e\n4d\t4f\n*v", [0], ["4/4"])
    from piano_a2s_tpu.symbolic.score import Score
    xml = score_to_musicxml(Score(parts=[part]))
    assert "<backup>" in xml
    root = ET.fromstring(xml)
    voices = {v.text for v in root.iter("voice")}
    assert voices == {"1", "2"}
