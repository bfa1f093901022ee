"""Offline-pipeline component tests: MIDI IO + tempo scaling, loudness /
compressor DSP, kern chunking + target building (no external tools)."""

import os
import pickle

import numpy as np
import pytest

from piano_a2s_tpu.data.audio_fx import (Compressor, integrated_loudness,
                                         loudness_normalize, peak_normalize)
from piano_a2s_tpu.data.render import (count_measures, get_staff_spines,
                                       measure_signatures,
                                       split_single_score)
from piano_a2s_tpu.symbolic.midi_io import (MidiFile, MIDIProcess,
                                            read_midi, write_midi_file)
from piano_a2s_tpu.symbolic.vocab import LabelsMultiple


# ---------------------------------------------------------------------------
# MIDI IO
# ---------------------------------------------------------------------------

def _write_test_midi(path, n_notes=8, tempo_us=500000, tpb=480):
    """Write via our score-level writer, read back with midi_io."""
    from piano_a2s_tpu.symbolic.export import export_target
    lm = LabelsMultiple(extended=True)
    upper = lm.encode("4c 4e\n4d\n4e\n4f")
    lower = lm.encode("2C\n2G")
    target = [[0, "4/4", lower, upper]]
    export_target(target, midi_path=path)


def test_midi_roundtrip(tmp_path):
    path = str(tmp_path / "t.mid")
    _write_test_midi(path)
    midi = read_midi(path)
    assert midi.ticks_per_beat == 480
    assert midi.tempo_us() == 500000
    notes = midi.notes()
    assert len(notes) == 7  # 5 upper (incl 2-chord) + 2 lower
    # Roundtrip through the writer keeps everything
    out2 = str(tmp_path / "t2.mid")
    write_midi_file(midi, out2)
    midi2 = read_midi(out2)
    assert midi2.notes() == notes
    assert abs(midi.length_seconds() - midi2.length_seconds()) < 1e-9


def test_midi_process_scaling(tmp_path):
    path = str(tmp_path / "t.mid")
    _write_test_midi(path)
    orig_len = read_midi(path).length_seconds()
    out = str(tmp_path / "scaled.mid")
    proc = MIDIProcess(path, split="test")
    scaling, original = proc.process(out)
    assert abs(original - orig_len) < 1e-6
    # 1-measure 4/4 at 120bpm = 2s -> must scale UP to reach >= 4s, so the
    # clamp forces scaling = lower bound = 4/len > 1.15 -> infeasible -> None
    if original < 4 / 1.15:
        assert scaling is None
    else:
        assert scaling is not None
        new_len = read_midi(out).length_seconds()
        assert 4.0 - 0.2 <= new_len <= 12.0 + 0.2


def test_midi_process_train_random(tmp_path):
    from piano_a2s_tpu.symbolic.export import export_target
    lm = LabelsMultiple(extended=True)
    bars = [[0, "4/4", lm.encode("1C"), lm.encode("1cc")] for _ in range(4)]
    path = str(tmp_path / "four.mid")
    export_target(bars, midi_path=path)  # 4 bars 4/4 @120 = 8s
    rng = np.random.RandomState(0)
    out = str(tmp_path / "scaled.mid")
    scaling, original = MIDIProcess(path, "train", rng=rng).process(out)
    assert abs(original - 8.0) < 0.01
    assert scaling is not None and 0.85 <= scaling <= 1.15
    assert 4.0 <= read_midi(out).length_seconds() <= 12.0


# ---------------------------------------------------------------------------
# DSP
# ---------------------------------------------------------------------------

def test_integrated_loudness_sine():
    sr = 44100
    t = np.arange(sr * 3) / sr
    # 997 Hz full-scale sine: BS.1770 reference ~ -3.01 LUFS
    x = np.sin(2 * np.pi * 997 * t)
    lufs = integrated_loudness(x, sr)
    assert -3.6 < lufs < -2.5, lufs
    # -20 dB sine is 20 LU quieter
    lufs2 = integrated_loudness(0.1 * x, sr)
    assert abs((lufs - lufs2) - 20.0) < 0.1


def test_peak_and_loudness_normalize():
    x = 0.25 * np.sin(np.linspace(0, 100, 44100))
    y = peak_normalize(x, -1.0)
    assert abs(20 * np.log10(np.abs(y).max()) + 1.0) < 1e-6
    z = loudness_normalize(x, -30.0, -15.0)
    assert np.allclose(z, x * 10 ** (15 / 20))


def test_compressor_reduces_peaks():
    sr = 44100
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440 * t)
    comp = Compressor(threshold_db=-12, ratio=10, attack_ms=1,
                      release_ms=50)
    y = comp(x, sr)
    assert np.abs(y).max() < np.abs(x).max()
    # quiet signal passes ~unchanged
    q = 0.05 * x
    yq = comp(q, sr)
    assert np.allclose(yq, q, atol=1e-3)


# ---------------------------------------------------------------------------
# Kern chunk pipeline (native, no external tools)
# ---------------------------------------------------------------------------

# Conventional kern layout: measure-1 content follows the header directly;
# barlines =2..=7 separate subsequent measures (7 content measures total).
SCORE = """**kern	**kern
*clefF4	*clefG2
*k[f#]	*k[f#]
*M4/4	*M4/4
2C 2E	4cc
.	4dd
2G	2ee
=2	=2
1D	1ff#
=3	=3
2E	2gg
2F#	2aa
=4	=4
1G	1bb
=5	=5
1A	2ccc
.	2b
=6	=6
1B	1a
=7	=7
1C	1g
=8	=8
2D 2F#	2b 2dd
2A	2gg
=9	=9
1G	1g
=
*-	*-
"""


def test_staff_spines_and_signatures():
    assert get_staff_spines(SCORE) == (1, 2)
    sigs = measure_signatures(SCORE)
    assert len(sigs) == 9
    assert sigs[0] == (1, "4/4")
    assert count_measures(SCORE) == 8  # 8 interior barlines, 9 measures


def test_split_single_score_native(tmp_path):
    score_path = str(tmp_path / "testsong.krn")
    with open(score_path, "w") as f:
        f.write(SCORE)
    feature_folder = str(tmp_path / "features")
    labels = LabelsMultiple(extended=True)
    from piano_a2s_tpu.data.datasets import load_time_signatures
    n = split_single_score(score_path, feature_folder, labels,
                           load_time_signatures(), split="train", version=0,
                           rng=np.random.RandomState(0))
    assert n >= 1
    out = os.path.join(feature_folder, "train", "0")
    targets = sorted(os.listdir(os.path.join(out, "target")))
    assert targets
    with open(os.path.join(out, "target", targets[0]), "rb") as f:
        target = pickle.load(f)
    assert len(target) == 5
    key, time, lower_toks, upper_toks = target[0]
    assert time == "4/4"
    assert -6 <= key <= 7
    assert lower_toks and upper_toks
    # tokens decode back to kern text
    text = "".join(labels.decode(upper_toks))
    assert any(ch.isdigit() for ch in text)
    # xml written for synthesis stage
    assert sorted(os.listdir(os.path.join(out, "xml")))
    # info records the transposition
    import json
    infos = sorted(os.listdir(os.path.join(out, "info")))
    info = json.load(open(os.path.join(out, "info", infos[0])))
    assert "transpose" in info and "original_key" in info


def _long_score(n_measures=12):
    """SCORE extended: repeat simple measures up to n_measures."""
    lines = SCORE.splitlines()
    body = lines[:-3]  # up to and including "1G\t1g" of measure 9
    for m in range(10, n_measures + 1):
        body.append(f"={m}\t={m}")
        body.append("1C\t1cc")
    body.extend(["=", "*-\t*-"])
    return "\n".join(body) + "\n"


def test_split_single_score_eval_no_transpose(tmp_path):
    score_path = str(tmp_path / "testsong.krn")
    with open(score_path, "w") as f:
        f.write(_long_score(12))
    feature_folder = str(tmp_path / "features")
    labels = LabelsMultiple(extended=True)
    from piano_a2s_tpu.data.datasets import load_time_signatures
    n = split_single_score(score_path, feature_folder, labels,
                           load_time_signatures(), split="test", version=0,
                           rng=np.random.RandomState(0))
    assert n >= 1
    out = os.path.join(feature_folder, "test", "0")
    import json
    infos = sorted(os.listdir(os.path.join(out, "info")))
    info = json.load(open(os.path.join(out, "info", infos[0])))
    assert info["transpose"] == 0
    # test split stride = 5 -> one full chunk from 12 measures
    assert len(infos) == 1


def test_asap_annotation_parsing():
    from piano_a2s_tpu.data.asap import parse_annotation_downbeats
    anno = ["0.5\t0.5\tdb,4/4,2",
            "1.5\t1.5\tb",
            "2.5\t2.5\tdb",
            "3.5\t3.5\tb,3/4",
            "4.5\t4.5\tdb,,3"]
    upbeat, downbeats = parse_annotation_downbeats(anno)
    assert not upbeat
    assert downbeats[0] == (0.0, "2", "4/4")
    assert downbeats[1][0] == 0.5
    assert downbeats[-1] == (4.5, "3", "3/4")
