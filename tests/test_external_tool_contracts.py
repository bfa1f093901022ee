"""Contract tests for the external-tool subprocess wrappers, against MOCK
binaries on PATH.

java/verovio/fluidsynth are not installed in CI, so the graceful-skip
paths were the only ones previously exercised. These tests install fake
executables that (a) VALIDATE the exact argv contract each wrapper must
emit, and (b) REPLAY the real tools' output formats (MV2H's final 6-line
"Metric: value" stdout block, Converter's note-list text, SMF files, WAV
files) — pinning the NON-skip paths: invocation sequences, temp-file
plumbing, stdout parsing, and downstream file handling.

Contracts pinned against the reference:
  evaluate_midi_mv2h.sh 3-command java sequence (reference:
  evaluate_midi_mv2h.sh:8-11), run_mv2h_pair's last-6-lines parse
  (reference: evaluate.py:40-60), verovio musicxml-hum conversions
  (reference: render.py:457-463, 428) and fluidsynth rendering
  (reference: render.py:299-319).
"""

import json
import os
import pickle
import stat
import subprocess
import sys

import numpy as np
import pytest

from piano_a2s_tpu.data.render import (convert_xml_to_kern, render_all_midi,
                                       render_one_midi, xml_to_midi)
from piano_a2s_tpu.symbolic.midi_io import (MidiEvent, MidiFile, read_midi,
                                            write_midi_file)
from piano_a2s_tpu.train.evaluate_offline import (MV2H_KEYS,
                                                  get_mv2h_from_test,
                                                  get_muster_er,
                                                  run_mv2h_pair)
from piano_a2s_tpu.utils.audio import read_wav, write_wav

# ---------------------------------------------------------------------------
# Fake binaries
# ---------------------------------------------------------------------------

FAKE_JAVA = '''#!{python}
"""Fake `java` replaying MV2H's CLI behavior and output format."""
import os, sys, time

args = sys.argv[1:]
log = os.environ.get("FAKE_JAVA_LOG")
if log:
    with open(log, "a") as f:
        f.write(" ".join(args) + chr(10))
if os.environ.get("FAKE_JAVA_SLEEP"):
    time.sleep(float(os.environ["FAKE_JAVA_SLEEP"]))
assert args[0] == "-cp", f"expected -cp first, got {{args}}"
cp, main = args[1], args[2]
expected_cp = os.environ.get("FAKE_JAVA_EXPECT_CP")
if expected_cp:
    assert cp == expected_cp, f"classpath {{cp}} != {{expected_cp}}"

if main == "mv2h.tools.Converter":
    # Contract: java -cp $MV2H mv2h.tools.Converter -i file.mid > out
    assert args[3] == "-i" and len(args) == 5, args
    raw = open(args[4], "rb").read()
    assert raw[:4] == b"MThd", "Converter must receive a real SMF file"
    # Replayed MV2H intermediate text format (note list + structure).
    print("Note 60 0 0 500 0")
    print("Note 64 500 500 1000 0")
    print("Tatum 0")
    print("Tatum 250")
    print("Hierarchy 4,2 2 a=4 anacrusis=0")
    print("Key 0 Maj 0")
    import hashlib
    print("CHECKSUM " + hashlib.sha256(raw).hexdigest())
elif main == "mv2h.Main":
    # Contract: java -cp $MV2H mv2h.Main -g ref.conv -t hyp.conv -a
    assert args[3] == "-g" and args[5] == "-t" and args[7] == "-a", args
    ref = open(args[4]).read()
    hyp = open(args[6]).read()
    # The conv files must carry the Converter's stdout (shell redirect).
    assert "Note 60 0 0 500 0" in ref and "Tatum" in ref, ref
    assert "Note 60 0 0 500 0" in hyp, hyp
    zero_marker = os.environ.get("FAKE_JAVA_ZERO_FOR")
    if os.environ.get("FAKE_JAVA_GARBAGE"):
        print("this is not")
        print("an MV2H result block")
        sys.exit(0)
    print("Comparing files...")  # leading noise: the parse takes last 6
    if zero_marker and zero_marker in args[6]:
        vals = dict.fromkeys(
            ["Multi-pitch", "Voice", "Meter", "Value", "Harmony"], 0.0)
    else:
        mp = 1.0 if ref == hyp else 0.75
        vals = {{"Multi-pitch": mp, "Voice": 1.0, "Meter": 0.875,
                "Value": 0.9434523809523809, "Harmony": 1.0}}
    vals["MV2H"] = sum(vals.values()) / 5
    for k in ["Multi-pitch", "Voice", "Meter", "Value", "Harmony", "MV2H"]:
        print(f"{{k}}: {{vals[k]}}")
else:
    sys.exit("unexpected java main class: " + main)
'''

FAKE_VEROVIO = '''#!{python}
"""Fake `verovio` validating the musicxml-hum conversion contract."""
import os, shutil, sys

args = sys.argv[1:]
log = os.environ.get("FAKE_VEROVIO_LOG")
if log:
    with open(log, "a") as f:
        f.write(" ".join(args) + chr(10))
assert args[0] == "-f" and args[1] == "musicxml-hum", args
assert args[2] == "-t" and args[3] in ("hum", "midi"), args
src, dash_o, dst = args[4], args[5], args[6]
assert dash_o == "-o" and len(args) == 7, args
assert os.path.exists(src), f"input {{src}} does not exist"
if os.environ.get("FAKE_VEROVIO_FAIL"):
    sys.exit(1)
if args[3] == "hum":
    hum = os.environ.get("FAKE_VEROVIO_HUM")
    if hum:
        shutil.copy(hum, dst)
    else:
        with open(dst, "w") as f:
            f.write("**kern" + chr(10) + "*-" + chr(10))
else:
    shutil.copy(os.environ["FAKE_VEROVIO_MIDI"], dst)
'''

FAKE_FLUIDSYNTH = '''#!{python}
"""Fake `fluidsynth` validating the render invocation contract."""
import os, shutil, sys

args = sys.argv[1:]
log = os.environ.get("FAKE_FLUIDSYNTH_LOG")
if log:
    with open(log, "a") as f:
        f.write(" ".join(args) + chr(10))
# Contract: fluidsynth -ni font.sf2 in.mid -F out.wav -r rate
assert args[0] == "-ni", args
font, midi = args[1], args[2]
assert args[3] == "-F" and args[5] == "-r", args
assert font.endswith(".sf2"), font
assert open(midi, "rb").read(4) == b"MThd", "fluidsynth got a non-SMF"
int(args[6])  # rate must be an integer
if os.environ.get("FAKE_FLUIDSYNTH_FAIL"):
    sys.exit(1)
shutil.copy(os.environ["FAKE_FLUIDSYNTH_WAV"], args[4])
'''


@pytest.fixture()
def fake_bin(tmp_path, monkeypatch):
    """Install the fake binaries at the front of PATH; returns the dir."""
    bindir = tmp_path / "fakebin"
    bindir.mkdir()
    for name, body in (("java", FAKE_JAVA), ("verovio", FAKE_VEROVIO),
                       ("fluidsynth", FAKE_FLUIDSYNTH)):
        p = bindir / name
        p.write_text(body.format(python=sys.executable))
        p.chmod(p.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    for var in ("FAKE_JAVA_SLEEP", "FAKE_JAVA_GARBAGE", "FAKE_JAVA_ZERO_FOR",
                "FAKE_VEROVIO_FAIL", "FAKE_VEROVIO_HUM",
                "FAKE_FLUIDSYNTH_FAIL"):
        monkeypatch.delenv(var, raising=False)
    return bindir


def _write_test_midi(path, n_beats=12, pitches=(60, 64, 67)):
    """A genuine small SMF (~6 s at the default tempo)."""
    events = []
    for i in range(n_beats):
        p = pitches[i % len(pitches)]
        events.append(MidiEvent(0 if i == 0 else 240, 0x90, bytes([p, 80])))
        events.append(MidiEvent(240, 0x80, bytes([p, 0])))
    events.append(MidiEvent(0, 0xFF, b"\x2f\x00"))
    write_midi_file(MidiFile(480, [events]), str(path))


# ---------------------------------------------------------------------------
# MV2H wrapper (run_mv2h_pair + evaluate_midi_mv2h.sh)
# ---------------------------------------------------------------------------

def test_run_mv2h_pair_invocation_and_parse(fake_bin, tmp_path, monkeypatch):
    """The wrapper emits the reference's exact 3-command java sequence
    (Converter x2 with stdout redirected to .conv.txt, then Main -g -t -a),
    parses the final 6-line block, and cleans up the temp files."""
    log = tmp_path / "java.log"
    monkeypatch.setenv("FAKE_JAVA_LOG", str(log))
    monkeypatch.setenv("FAKE_JAVA_EXPECT_CP", "/opt/MV2H/bin")
    ref_mid, hyp_mid = tmp_path / "ref.mid", tmp_path / "hyp.mid"
    _write_test_midi(ref_mid)
    _write_test_midi(hyp_mid, pitches=(62, 65))

    # timeout=60: the fake java pays a python-interpreter startup (~4 s
    # each under CPU load) x3; the production 10 s default is pinned by
    # the dedicated timeout test below.
    result = run_mv2h_pair(str(ref_mid), str(hyp_mid), "/opt/MV2H/bin",
                           timeout=60)
    assert result is not None
    assert set(result) == set(MV2H_KEYS)
    # Different MIDIs -> fake Converter emits different CHECKSUM lines ->
    # fake Main scores Multi-pitch 0.75; proves both real files flowed
    # through the Converter into the files Main compared.
    assert result["Multi-pitch"] == 0.75
    assert result["MV2H"] == pytest.approx(
        (0.75 + 1.0 + 0.875 + 0.9434523809523809 + 1.0) / 5)

    calls = log.read_text().splitlines()
    assert len(calls) == 3
    assert calls[0].split() == ["-cp", "/opt/MV2H/bin", "mv2h.tools.Converter",
                               "-i", str(ref_mid)]
    assert calls[1].split() == ["-cp", "/opt/MV2H/bin", "mv2h.tools.Converter",
                               "-i", str(hyp_mid)]
    assert calls[2].split() == ["-cp", "/opt/MV2H/bin", "mv2h.Main",
                               "-g", f"{ref_mid}.conv.txt",
                               "-t", f"{hyp_mid}.conv.txt", "-a"]
    # temp conversion files removed by the wrapper script
    assert not os.path.exists(f"{ref_mid}.conv.txt")
    assert not os.path.exists(f"{hyp_mid}.conv.txt")

    # identical pair -> identical conv text -> Multi-pitch 1.0
    result2 = run_mv2h_pair(str(ref_mid), str(ref_mid), "/opt/MV2H/bin",
                            timeout=60)
    assert result2["Multi-pitch"] == 1.0


def test_run_mv2h_pair_timeout_returns_none(fake_bin, tmp_path, monkeypatch):
    """10 s-timeout contract (reference: evaluate.py:44): a hanging java
    yields None, not an exception."""
    monkeypatch.setenv("FAKE_JAVA_SLEEP", "5")
    mid = tmp_path / "a.mid"
    _write_test_midi(mid)
    assert run_mv2h_pair(str(mid), str(mid), "/opt/MV2H", timeout=1.0) is None


def test_run_mv2h_pair_malformed_output_returns_none(fake_bin, tmp_path,
                                                     monkeypatch):
    monkeypatch.setenv("FAKE_JAVA_GARBAGE", "1")
    mid = tmp_path / "a.mid"
    _write_test_midi(mid)
    assert run_mv2h_pair(str(mid), str(mid), "/opt/MV2H",
                         timeout=60) is None


def _make_result_fixture(out_dir, split, clip_id, target):
    """A per-clip result JSON + target pickle like the harness writes."""
    split_dir = os.path.join(out_dir, "results", split)
    os.makedirs(split_dir, exist_ok=True)
    target_path = os.path.join(out_dir, f"{clip_id}_target.pkl")
    with open(target_path, "wb") as f:
        pickle.dump(target, f)
    rec = {"style": "pop", "soundfont": "U", "composer": "test",
           "target_path": target_path, "pred": target,
           "wer_upper": 0.0, "wer_lower": 0.0, "key_f1": 1.0,
           "time_f1": 1.0}
    with open(os.path.join(split_dir, f"{clip_id}.json"), "w") as f:
        json.dump(rec, f)
    return target_path


def test_get_mv2h_from_test_end_to_end(fake_bin, tmp_path, monkeypatch):
    """The offline evaluator's non-skip path: export pred+target scores,
    run MV2H per pair, write metric JSONs, journal failures, resume."""
    log = tmp_path / "java.log"
    monkeypatch.setenv("FAKE_JAVA_LOG", str(log))
    monkeypatch.setenv("FAKE_JAVA_ZERO_FOR", "zeroclip")
    out = str(tmp_path / "out")
    # Tokens: duration '4' + pitch 'c' (ids via the vocab in export_target's
    # path) — use a trivially exportable target: one bar, C4 quarter notes.
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
    labels = LabelsMultiple(extended=True)
    toks = labels.encode("4c 4c 4c 4c")
    target = [[0, "4/4", toks, toks]]
    _make_result_fixture(out, "test", "goodclip", target)
    _make_result_fixture(out, "test", "zeroclip", target)
    # broken clip: target_path points nowhere -> export fails -> errors.txt
    _make_result_fixture(out, "test", "brokenclip", target)
    os.remove(os.path.join(out, "brokenclip_target.pkl"))

    errors = get_mv2h_from_test(out, "test", "/opt/MV2H/bin", timeout=60)

    # goodclip scored and saved with the replayed real-format numbers
    mv2h_path = os.path.join(out, "results", "mv2h", "goodclip_mv2h.json")
    assert os.path.exists(mv2h_path)
    with open(mv2h_path) as f:
        scores = json.load(f)
    assert set(scores) == set(MV2H_KEYS)
    assert scores["Multi-pitch"] == 1.0  # pred == target here
    # zeroclip: MV2H == 0 -> journaled, no metric JSON (reference
    # evaluate.py:57-59 treats 0 as a midi-read error)
    assert not os.path.exists(
        os.path.join(out, "results", "mv2h", "zeroclip_mv2h.json"))
    assert sorted(errors) == ["brokenclip", "zeroclip"]
    with open(os.path.join(out, "results", "errors.txt")) as f:
        assert sorted(f.read().split()) == ["brokenclip", "zeroclip"]
    # exported artifacts exist for the scored pair
    for sub, suffix in (("scores/pred", "goodclip_pred.xml"),
                        ("midi/target", "goodclip_target.mid")):
        assert os.path.exists(os.path.join(out, "results", sub, suffix))

    # resumability: second run skips the already-scored clip entirely
    n_calls = len(log.read_text().splitlines())
    get_mv2h_from_test(out, "test", "/opt/MV2H/bin", timeout=60)
    calls_after = log.read_text().splitlines()
    assert all("goodclip" not in c for c in calls_after[n_calls:])


def test_get_mv2h_from_test_parallel_matches_serial(fake_bin, tmp_path,
                                                    monkeypatch):
    """jobs=4 produces byte-identical outcomes to the serial pass (same
    metric JSONs, same errors.txt contents and ordering) — per-clip work
    is independent, the pool only changes wall time."""
    monkeypatch.setenv("FAKE_JAVA_ZERO_FOR", "zclip")
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
    labels = LabelsMultiple(extended=True)
    toks = labels.encode("4c 4c 4c 4c")
    target = [[0, "4/4", toks, toks]]

    def build(out):
        for i in range(3):
            _make_result_fixture(out, "test", f"clip{i}", target)
        _make_result_fixture(out, "test", "zclip", target)
        _make_result_fixture(out, "test", "brokenclip", target)
        os.remove(os.path.join(out, "brokenclip_target.pkl"))

    serial, parallel = str(tmp_path / "s"), str(tmp_path / "p")
    build(serial)
    build(parallel)
    # Generous timeout: each fake-java call is milliseconds of work, but
    # concurrent Python-interpreter startups on a loaded single-core CI
    # host can take tens of seconds — a tight timeout turns MV2H
    # timeouts into silent skips (the reference contract) and fails the
    # equality below for environmental reasons.
    err_s = get_mv2h_from_test(serial, "test", "/opt/MV2H/bin", timeout=600)
    err_p = get_mv2h_from_test(parallel, "test", "/opt/MV2H/bin",
                               timeout=600, jobs=3)
    assert err_p == err_s
    with open(os.path.join(serial, "results", "errors.txt")) as f:
        errors_txt_s = f.read()
    with open(os.path.join(parallel, "results", "errors.txt")) as f:
        assert f.read() == errors_txt_s
    mv2h_s = sorted(os.listdir(os.path.join(serial, "results", "mv2h")))
    mv2h_p = sorted(os.listdir(os.path.join(parallel, "results", "mv2h")))
    assert mv2h_p == mv2h_s == [f"clip{i}_mv2h.json" for i in range(3)]
    for name in mv2h_s:
        with open(os.path.join(serial, "results", "mv2h", name)) as f:
            a = json.load(f)
        with open(os.path.join(parallel, "results", "mv2h", name)) as f:
            assert json.load(f) == a


# ---------------------------------------------------------------------------
# verovio wrapper (convert_xml_to_kern, xml_to_midi score path)
# ---------------------------------------------------------------------------

def test_convert_xml_to_kern_contract(fake_bin, tmp_path, monkeypatch):
    log = tmp_path / "verovio.log"
    monkeypatch.setenv("FAKE_VEROVIO_LOG", str(log))
    xml_dir, kern_dir = tmp_path / "xml", tmp_path / "kern"
    xml_dir.mkdir()
    for name in ("a.xml", "b.xml"):
        (xml_dir / name).write_text("<score-partwise/>")
    (xml_dir / "ignored.txt").write_text("not xml")

    n = convert_xml_to_kern(str(xml_dir), str(kern_dir))
    assert n == 2
    for name in ("a.krn", "b.krn"):
        assert (kern_dir / name).read_text().startswith("**kern")
    calls = log.read_text().splitlines()
    assert len(calls) == 2
    assert calls[0].split()[:4] == ["-f", "musicxml-hum", "-t", "hum"]


def test_convert_xml_to_kern_counts_failures(fake_bin, tmp_path,
                                             monkeypatch):
    monkeypatch.setenv("FAKE_VEROVIO_FAIL", "1")
    xml_dir = tmp_path / "xml"
    xml_dir.mkdir()
    (xml_dir / "a.xml").write_text("<score-partwise/>")
    assert convert_xml_to_kern(str(xml_dir), str(tmp_path / "kern")) == 0


def test_xml_to_midi_score_path_contract(fake_bin, tmp_path, monkeypatch):
    """Score-MIDI rendering: verovio -t midi into a temp .raw.mid, then
    MIDIProcess tempo-scaling into the final midi + info update
    (reference: render.py:424-448)."""
    genuine = tmp_path / "genuine.mid"
    _write_test_midi(genuine)  # ~6 s -> valid for the 4-12 s clamp
    monkeypatch.setenv("FAKE_VEROVIO_MIDI", str(genuine))
    feat = tmp_path / "features"
    folder = feat / "train" / "0"
    for sub in ("target", "xml", "info"):
        (folder / sub).mkdir(parents=True)
    (folder / "target" / "song.pkl").write_bytes(pickle.dumps([]))
    (folder / "xml" / "song.xml").write_text("<score-partwise/>")
    (folder / "info" / "song.json").write_text(json.dumps({"n_measures": 5}))

    xml_to_midi([0], str(feat), midi_syn="score", seed=0)

    midi_path = folder / "midi" / "song.mid"
    assert midi_path.exists()
    midi = read_midi(str(midi_path))  # genuine SMF round-trips
    assert 4.0 <= midi.length_seconds() <= 12.0
    assert not (folder / "midi" / "song.mid.raw.mid").exists()
    info = json.loads((folder / "info" / "song.json").read_text())
    assert info["composer"] == "score"
    assert 0.85 <= info["scaling"] <= 1.15
    # genuine file is ~6 s (12 beats at the default tempo); MIDIProcess
    # may trim trailing/leading silence before measuring
    assert 4.0 <= info["original_length"] <= 6.5
    assert info["n_measures"] == 5  # pre-existing info preserved


# ---------------------------------------------------------------------------
# fluidsynth wrapper (render_one_midi / render_all_midi)
# ---------------------------------------------------------------------------

def _genuine_wav(path, seconds=1.0, rate=44100):
    t = np.arange(int(seconds * rate)) / rate
    write_wav(str(path), 0.25 * np.sin(2 * np.pi * 440 * t), rate)


def test_render_one_midi_contract(fake_bin, tmp_path, monkeypatch):
    wav_src = tmp_path / "genuine.wav"
    _genuine_wav(wav_src)
    monkeypatch.setenv("FAKE_FLUIDSYNTH_WAV", str(wav_src))
    log = tmp_path / "fs.log"
    monkeypatch.setenv("FAKE_FLUIDSYNTH_LOG", str(log))
    midi = tmp_path / "in.mid"
    _write_test_midi(midi)
    out_wav = tmp_path / "out.wav"

    ok = render_one_midi(str(midi), str(out_wav), "/sf/Upright.sf2")
    assert ok and out_wav.exists()
    call = log.read_text().split()
    assert call == ["-ni", "/sf/Upright.sf2", str(midi), "-F", str(out_wav),
                    "-r", "44100"]
    # The wrapper post-processes the synth output (compressor + BS.1770
    # loudness loop): the written wav differs from the raw synth wav but
    # stays valid mono audio at the same rate.
    data, rate = read_wav(str(out_wav))
    assert rate == 44100 and len(data) == 44100
    assert np.isfinite(data).all() and np.abs(data).max() <= 1.0


def test_render_one_midi_failure_returns_false(fake_bin, tmp_path,
                                               monkeypatch):
    monkeypatch.setenv("FAKE_FLUIDSYNTH_FAIL", "1")
    midi = tmp_path / "in.mid"
    _write_test_midi(midi)
    assert not render_one_midi(str(midi), str(tmp_path / "out.wav"),
                               "/sf/a.sf2")


def test_render_all_midi_soundfont_naming(fake_bin, tmp_path, monkeypatch):
    """Train split: one random soundfont per clip; test split: every test
    soundfont, with the ~{font} name suffix the datasets parse
    (reference: render.py:274-319)."""
    wav_src = tmp_path / "genuine.wav"
    _genuine_wav(wav_src)
    monkeypatch.setenv("FAKE_FLUIDSYNTH_WAV", str(wav_src))
    feat = tmp_path / "features"
    for split in ("train", "test"):
        mdir = feat / split / "0" / "midi"
        mdir.mkdir(parents=True)
        _write_test_midi(mdir / "song.mid")

    render_all_midi([0], str(feat), "/sf", seed=0)

    train_wavs = os.listdir(feat / "train" / "0" / "wav")
    assert len(train_wavs) == 1
    name = train_wavs[0]
    assert name.startswith("song~") and name.endswith(".wav")
    from piano_a2s_tpu.data.render import TEST_SOUNDFONTS, TRAIN_SOUNDFONTS
    assert name[5:-4] + ".sf2" in TRAIN_SOUNDFONTS
    test_wavs = sorted(os.listdir(feat / "test" / "0" / "wav"))
    assert test_wavs == sorted(f"song~{sf[:-4]}.wav"
                               for sf in TEST_SOUNDFONTS)


# ---------------------------------------------------------------------------
# MUSTER wrapper (get_muster_er)
# ---------------------------------------------------------------------------

FAKE_MUSTER = '''#!{python}
"""Fake MUSTER evaluate_XML_voicePlus.sh.

Validates the argv contract (pred_path target_path ER — reference:
evaluate.py:149) and replays the real tool's output contract: MUSTER
writes an ER.txt CSV into the CALLER'S cwd whose comma-field 12 carries
a label plus the 11 tab-joined error-rate components (the parse at
reference evaluate.py:150-152).
"""
import os, sys

pred, target, mode = sys.argv[1], sys.argv[2], sys.argv[3]
assert mode == "ER", sys.argv
log = os.environ.get("FAKE_MUSTER_LOG")
if log:
    with open(log, "a") as f:
        f.write(" ".join(sys.argv[1:]) + chr(10))
name = os.path.basename(pred)
assert name.endswith("_pred"), pred
assert os.path.basename(target).endswith("_target"), target
# The exported pairs carry .xml; MUSTER receives the extensionless prefix
# (the reference's get_ER argv contract, evaluate.py:149).
assert os.path.exists(pred) or os.path.exists(pred + ".xml"), pred
assert os.path.exists(target) or os.path.exists(target + ".xml"), target
if "failclip" in name:
    sys.exit(1)  # dies before writing ER.txt
if "nanclip" in name:
    vals = ["nan"] * 11
else:
    vals = [str(round(0.1 * (i + 1), 1)) for i in range(11)]
line = ",".join(["x"] * 12 + ["ER" + chr(9) + chr(9).join(vals)])
with open("ER.txt", "w") as f:
    f.write(line + chr(10))
'''


def _install_fake_muster(tmp_path, monkeypatch):
    script = tmp_path / "evaluate_XML_voicePlus.sh"
    script.write_text(FAKE_MUSTER.format(python=sys.executable))
    script.chmod(script.stat().st_mode | stat.S_IXUSR)
    log = tmp_path / "muster.log"
    monkeypatch.setenv("FAKE_MUSTER_LOG", str(log))
    # get_muster_er reads ER.txt from the cwd (the MUSTER tool's contract)
    monkeypatch.chdir(tmp_path)
    return str(script), log


def _make_muster_fixture(root, names):
    """The on-disk layout get_muster_er scans: one mv2h JSON per scored
    clip plus the exported score pair (reference: evaluate.py:138-148)."""
    for sub in ("mv2h", "scores/pred", "scores/target"):
        os.makedirs(os.path.join(root, "results", sub), exist_ok=True)
    for name in names:
        with open(os.path.join(root, "results", "mv2h",
                               name + "_mv2h.json"), "w") as f:
            json.dump({"MV2H": 1.0}, f)
        for side in ("pred", "target"):
            with open(os.path.join(root, "results", "scores", side,
                                   f"{name}_{side}"), "w") as f:
                f.write("<score/>")


def test_get_muster_er_contract(tmp_path, monkeypatch):
    """Non-skip path: invocation argv, cwd ER.txt parse, 11-component
    mean over the parseable clips; nan rows skipped (reference:
    evaluate.py:145-163)."""
    script, log = _install_fake_muster(tmp_path, monkeypatch)
    root = str(tmp_path / "out")
    _make_muster_fixture(root, ["aclip", "bclip", "nanclip"])

    ers, n = get_muster_er(root, muster_script=script)

    assert n == 2  # nanclip parsed but skipped as NaN
    np.testing.assert_allclose(
        ers, [0.1 * (i + 1) for i in range(11)], rtol=1e-6)
    calls = [c.split() for c in log.read_text().splitlines()]
    assert [os.path.basename(c[0]) for c in calls] == \
        ["aclip_pred", "bclip_pred", "nanclip_pred"]  # sorted enumeration
    assert calls[0][0] == os.path.join(root, "results", "scores", "pred",
                                       "aclip_pred")
    assert calls[0][1] == os.path.join(root, "results", "scores", "target",
                                       "aclip_target")
    assert all(c[2] == "ER" for c in calls)


def test_get_muster_er_failure_skips_not_recounts(tmp_path, monkeypatch):
    """A MUSTER run that dies before writing ER.txt is SKIPPED. (The
    reference would silently re-parse the previous pair's stale cwd
    ER.txt — evaluate.py:149-152 has no freshness check — and count it
    twice; our wrapper unlinks ER.txt before each run instead. Annotated
    divergence in get_muster_er.)"""
    script, log = _install_fake_muster(tmp_path, monkeypatch)
    root = str(tmp_path / "out")
    _make_muster_fixture(root, ["aclip", "failclip"])

    ers, n = get_muster_er(root, muster_script=script)

    assert n == 1
    np.testing.assert_allclose(
        ers, [0.1 * (i + 1) for i in range(11)], rtol=1e-6)
    assert len(log.read_text().splitlines()) == 2  # both were attempted
    assert not os.path.exists("ER.txt")  # failclip's unlink was last


def test_get_muster_er_no_tool_returns_zero(tmp_path, monkeypatch):
    """Graceful skip when the MUSTER tool is absent entirely — and the
    skip must NOT touch cwd state (a user's own ER.txt survives)."""
    monkeypatch.chdir(tmp_path)
    (tmp_path / "ER.txt").write_text("user's own file\n")
    root = str(tmp_path / "out")
    _make_muster_fixture(root, ["aclip"])
    ers, n = get_muster_er(root, muster_script=str(tmp_path / "missing.sh"))
    assert n == 0
    assert (ers == 0).all()
    assert (tmp_path / "ER.txt").read_text() == "user's own file\n"


def test_fake_binaries_resolve_first(fake_bin):
    """Sanity: the fixture's PATH override wins over any real binaries."""
    import shutil as _sh
    for tool in ("java", "verovio", "fluidsynth"):
        assert _sh.which(tool) == str(fake_bin / tool)
    r = subprocess.run(["java"], capture_output=True)
    assert r.returncode != 0  # fake java demands -cp
