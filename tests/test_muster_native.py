"""Native MUSTER scorer (train/muster.py) — algorithm-derived tests.

Strategy (the same pinning style as the native MV2H scorer's suite):
identical exports must score zero on every component, and each
single-aspect perturbation of a known score must move EXACTLY its
component (by the hand-computable amount) while leaving unrelated
components at zero. The external MUSTER tool remains canonical when
present (reference contract: /root/reference/evaluate.py:137-163)."""

import os

import numpy as np
import pytest

from piano_a2s_tpu.symbolic.export import export_target
from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
from piano_a2s_tpu.train.muster import (MUSTER_COMPONENTS, XNote,
                                        native_muster_pair,
                                        parse_musicxml, stem_direction)

L = LabelsMultiple(extended=True)
IDX = {name: i for i, name in enumerate(MUSTER_COMPONENTS)}


def _target(upper_texts, lower_texts, keys=None, time_sigs=None):
    n = len(upper_texts)
    keys = keys or [0] * n
    time_sigs = time_sigs or ["4/4"] * n
    return [[keys[i], time_sigs[i], L.encode(lower_texts[i]),
             L.encode(upper_texts[i])] for i in range(n)]


BASE_UP = ["4c\n4d\n4e\n4f", "2g\n4r\n4e"]
BASE_LOW = ["2C\n2D", "2E\n4F\n4G"]


def _ers(tmp_path, target, pred, tag=""):
    t_xml = os.path.join(str(tmp_path), f"t{tag}.xml")
    p_xml = os.path.join(str(tmp_path), f"p{tag}.xml")
    export_target(target, t_xml)
    export_target(pred, p_xml)
    return native_muster_pair(t_xml, p_xml)


def _assert_only(ers, nonzero):
    for name, i in IDX.items():
        if name in nonzero:
            assert ers[i] > 0, f"{name} should be nonzero: {ers}"
        else:
            assert ers[i] == 0, f"{name} should be zero: {ers}"


def test_identical_scores_all_zero(tmp_path):
    t = _target(BASE_UP, BASE_LOW)
    ers = _ers(tmp_path, t, t)
    assert ers.shape == (11,)
    np.testing.assert_array_equal(ers, np.zeros(11))


def test_enharmonic_respell_moves_only_spelling(tmp_path):
    t = _target(["4c\n4d-\n4e\n4f"], ["2C\n2D"])
    p = _target(["4c\n4c#\n4e\n4f"], ["2C\n2D"])  # d-flat -> c-sharp
    ers = _ers(tmp_path, t, p)
    _assert_only(ers, {"note_spelling"})
    # 1 respelled of 6 matched notes
    np.testing.assert_allclose(ers[IDX["note_spelling"]], 1 / 6)


def test_duration_change_moves_only_note_duration(tmp_path):
    t = _target(["4c\n4d\n4e\n4f"], ["2C\n2D"])
    p = _target(["8c\n4d\n4e\n4f"], ["2C\n2D"])
    ers = _ers(tmp_path, t, p)
    _assert_only(ers, {"note_duration"})
    np.testing.assert_allclose(ers[IDX["note_duration"]], 1 / 6)


def test_wrong_pitch_moves_only_note(tmp_path):
    t = _target(["4c\n4d\n4e\n4f"], ["2C\n2D"])
    p = _target(["4c\n4g\n4e\n4f"], ["2C\n2D"])
    ers = _ers(tmp_path, t, p)
    _assert_only(ers, {"note"})
    # one substitution over 6 target notes
    np.testing.assert_allclose(ers[IDX["note"]], 1 / 6)


def test_missing_and_extra_notes_count_in_note_er(tmp_path):
    t = _target(["4c\n4d\n4e\n4f"], ["2C\n2D"])
    p = _target(["4c\n4d\n4e"], ["2C\n2D"])          # deletion
    ers = _ers(tmp_path, t, p)
    np.testing.assert_allclose(ers[IDX["note"]], 1 / 6)
    p2 = _target(["4c\n4d\n4e\n4f\n4g"], ["2C\n2D"])  # insertion
    ers2 = _ers(tmp_path, t, p2, tag="2")
    np.testing.assert_allclose(ers2[IDX["note"]], 1 / 6)


def test_cross_staff_move_flags_staff_assignment(tmp_path):
    t = _target(["4c\n4d\n4e\n4f"], ["2C\n2D"])
    # the quarter-note d moves to the lower staff (same pitch)
    p = _target(["4c\n4e\n4f"], ["4d\n4C\n2D"])
    ers = _ers(tmp_path, t, p)
    assert ers[IDX["staff_assignment"]] > 0
    assert ers[IDX["note"]] > 0  # per-part alignment sees del+ins
    assert ers[IDX["key_signature"]] == 0
    assert ers[IDX["rest"]] == 0


def test_key_signature_change_moves_only_key(tmp_path):
    t = _target(BASE_UP, BASE_LOW, keys=[0, 0])
    p = _target(BASE_UP, BASE_LOW, keys=[0, 2])
    ers = _ers(tmp_path, t, p)
    _assert_only(ers, {"key_signature"})
    # 1 measure of 2, on both parts: 2 mismatched slots / 4 slots
    np.testing.assert_allclose(ers[IDX["key_signature"]], 0.5)


def test_time_signature_change_moves_time_and_barlines(tmp_path):
    t = _target(BASE_UP, BASE_LOW, time_sigs=["4/4", "4/4"])
    p = _target(BASE_UP, BASE_LOW, time_sigs=["4/4", "3/4"])
    ers = _ers(tmp_path, t, p)
    assert ers[IDX["time_signature"]] == 0.5
    # the bar-2 boundary stays (both start bar 2 after a 4/4 bar), but
    # the SCORE END boundary moves — parse onward: measure starts only;
    # bar starts: t {0, 1}, p {0, 1} -> no barline error here.
    assert ers[IDX["note"]] == 0


def test_dropped_rest_moves_only_rest(tmp_path):
    t = _target(["2g\n4r\n4e"], ["1C"])
    p = _target(["2g\n4e"], ["1C"])
    ers = _ers(tmp_path, t, p)
    _assert_only(ers, {"rest"})
    np.testing.assert_allclose(ers[IDX["rest"]], 1.0)  # 1 of 1 rest


def test_rest_duration_change_moves_only_rest_duration(tmp_path):
    t = _target(["2g\n4r\n4e"], ["1C"])
    p = _target(["2g\n8r\n4e"], ["1C"])
    ers = _ers(tmp_path, t, p)
    _assert_only(ers, {"rest_duration"})
    np.testing.assert_allclose(ers[IDX["rest_duration"]], 1.0)


def test_extra_measure_moves_barline(tmp_path):
    t = _target(BASE_UP, BASE_LOW)
    p = _target(BASE_UP + ["4c\n4d\n4e\n4f"], BASE_LOW + ["1C"])
    ers = _ers(tmp_path, t, p)
    assert ers[IDX["barline"]] > 0
    assert ers[IDX["note"]] > 0  # the extra bar's notes are insertions


def test_chords_align_note_for_note(tmp_path):
    t = _target(["2c 2e 2g\n2d 2f"], ["1C"])
    p = _target(["2c 2e 2g\n2d 2f"], ["1C"])
    np.testing.assert_array_equal(_ers(tmp_path, t, p), np.zeros(11))
    # one chord member's pitch wrong -> 1 substitution of 6 notes
    # (5 upper chord members + 1 lower whole note)
    p2 = _target(["2c 2e 2a\n2d 2f"], ["1C"])
    ers = _ers(tmp_path, t, p2, tag="2")
    np.testing.assert_allclose(ers[IDX["note"]], 1 / 6)


def test_stem_direction_rules():
    """Unit pin of the engraving rule: voice split beats the midline;
    otherwise stems point away from the staff midline (B4 treble=71,
    D3 bass=50)."""
    up = XNote(0, 1, 60, clef="treble")              # C4 < B4 -> up
    assert stem_direction(up) == "up"
    down = XNote(0, 1, 79, clef="treble")            # G5 > B4 -> down
    assert stem_direction(down) == "down"
    bass_up = XNote(0, 1, 45, clef="bass")           # A2 < D3 -> up
    assert stem_direction(bass_up) == "up"
    v2 = XNote(0, 1, 45, voice=2, two_voice_measure=True)
    assert stem_direction(v2) == "down"
    v1 = XNote(0, 1, 79, voice=1, two_voice_measure=True)
    assert stem_direction(v1) == "up"


def test_parse_musicxml_two_voice_backup(tmp_path):
    """<backup> second voices parse to correct onsets, and the two-voice
    measure flag drives stem inference."""
    t = _target(["4c\t4e\n4d\t4f"], ["1C"])
    path = os.path.join(str(tmp_path), "v.xml")
    export_target(t, path)
    score = parse_musicxml(path)
    upper = [n for n in score.notes if n.staff == 0 and n.midi is not None]
    assert len(upper) == 4
    by_voice = {}
    for n in upper:
        by_voice.setdefault(n.voice, []).append(n)
    assert sorted(by_voice) == [1, 2]
    # both voices start at onset 0 and advance by a quarter note
    for v, ns in by_voice.items():
        assert [float(n.onset) for n in ns] == [0.0, 0.25]
    assert all(n.two_voice_measure for n in upper)
    assert {stem_direction(n) for n in by_voice[1]} == {"up"}
    assert {stem_direction(n) for n in by_voice[2]} == {"down"}


def test_get_muster_er_native_end_to_end(tmp_path):
    """The evaluate_offline wrapper runs the native engine over an
    exported results tree (the reference's folder contract) and averages
    per-pair ERs."""
    import json
    import pickle

    from piano_a2s_tpu.train.evaluate_offline import get_muster_er

    results = os.path.join(str(tmp_path), "results")
    for d in ("mv2h", "scores/pred", "scores/target"):
        os.makedirs(os.path.join(results, d))
    t = _target(BASE_UP, BASE_LOW)
    p = _target(["8c\n4d\n4e\n4f", BASE_UP[1]], BASE_LOW)  # 1 dur error
    for clip, (tt, pp) in {"a~1~U": (t, t), "b~2~U": (t, p)}.items():
        export_target(pp, os.path.join(results, "scores", "pred",
                                       f"{clip}_pred.xml"))
        export_target(tt, os.path.join(results, "scores", "target",
                                       f"{clip}_target.xml"))
        with open(os.path.join(results, "mv2h", f"{clip}_mv2h.json"),
                  "w") as f:
            json.dump({"MV2H": 1.0}, f)
    ers, n = get_muster_er(str(tmp_path), engine="native")
    assert n == 2
    # clip a is perfect, clip b has 1 duration error of 11 notes
    np.testing.assert_allclose(ers[IDX["note_duration"]],
                               (0 + 1 / 11) / 2)
    assert ers[IDX["note"]] == 0
