"""End-to-end orchestration tests for the `prepare_data.py` CLI.

The individual stage functions are contract-tested in
test_external_tool_contracts.py; these tests drive the CLI `main()` itself
— stage sequencing over a real on-disk corpus, key=value override
splitting, unknown-stage rejection, and the `asap` branch running
`ProcessASAP.process_all` against a fake ASAP checkout — with the mock
java/verovio/fluidsynth binaries on PATH (reference entry points:
data_processing/render.py __main__ and datasets/asap.py __main__).
"""

import json
import os
import pickle

import numpy as np
import pytest

import prepare_data
from piano_a2s_tpu.utils.audio import write_wav

# Reused fixtures/helpers (pytest picks up `fake_bin` via this import).
from test_external_tool_contracts import fake_bin, _write_test_midi  # noqa: F401
from test_pipeline import SCORE, _long_score

SYN_YAML = """\
seed: 11
midi_syn: score
workspace: {root}
feature_folder: {root}/features
train_versions: 1
soundfont_folder: {root}/soundfonts
"""

ASAP_YAML = """\
seed: 11
midi_syn: score
workspace: {root}
feature_folder: {root}/asap_features
asap_folder: {root}/asap
"""


def _write_sine_wav(path, seconds, rate=16000, freq=440.0):
    t = np.arange(int(seconds * rate)) / rate
    write_wav(str(path), 0.5 * np.sin(2 * np.pi * freq * t), rate)


@pytest.fixture()
def syn_corpus(fake_bin, tmp_path, monkeypatch):  # noqa: F811
    """Fake MuseSyn xml corpus + replay fixtures for the mock binaries."""
    root = tmp_path / "ws"
    (root / "xml").mkdir(parents=True)
    (root / "soundfonts").mkdir()
    # One train song (name not in test_split/valid_split metadata).
    (root / "xml" / "zz_test_song.xml").write_text("<score/>")
    kern_fixture = tmp_path / "fixture.krn"
    kern_fixture.write_text(SCORE)
    monkeypatch.setenv("FAKE_VEROVIO_HUM", str(kern_fixture))
    midi_fixture = tmp_path / "fixture.mid"
    _write_test_midi(midi_fixture, n_beats=12)  # ~6 s
    monkeypatch.setenv("FAKE_VEROVIO_MIDI", str(midi_fixture))
    wav_fixture = tmp_path / "fixture.wav"
    _write_sine_wav(wav_fixture, 6.0)
    monkeypatch.setenv("FAKE_FLUIDSYNTH_WAV", str(wav_fixture))
    yaml_path = tmp_path / "syn.yaml"
    yaml_path.write_text(SYN_YAML.format(root=root))
    return root, yaml_path


def test_syn_full_chain(syn_corpus):
    """All seven stages end-to-end: xml -> kern -> chunks -> midi -> wav ->
    spectrograms, through the CLI's own stage loop and Pool fan-out."""
    root, yaml_path = syn_corpus
    rc = prepare_data.main(["syn", str(yaml_path),
                            "--kern-folder", str(root / "kern"),
                            "--xml-folder", str(root / "xml")])
    assert rc == 0

    # convert: verovio wrote the kern fixture under the score's name.
    assert (root / "kern" / "zz_test_song.krn").read_text() == SCORE

    # split: train chunks with target/xml/info.
    train0 = root / "features" / "train" / "0"
    targets = sorted(os.listdir(train0 / "target"))
    assert targets
    names = [t[:-4] for t in targets]
    assert all(n.startswith("zz_test_song") for n in names)
    assert sorted(os.listdir(train0 / "xml"))

    # midi: one .mid per surviving target, info updated by MIDIProcess.
    midis = sorted(os.listdir(train0 / "midi"))
    assert midis
    info = json.load(open(train0 / "info" / f"{midis[0][:-4]}.json"))
    assert info["composer"] == "score"
    assert 0.85 <= info["scaling"] <= 1.15

    # clean kept the (valid) clips: every midi still has its target.
    for m in midis:
        assert (train0 / "target" / f"{m[:-4]}.pkl").exists()

    # render: one wav per midi, named midi~soundfont.wav, loudness-processed
    # (not byte-identical to the fluidsynth fixture).
    wavs = sorted(os.listdir(train0 / "wav"))
    assert len(wavs) == len(midis)
    assert all("~" in w and w.endswith(".wav") for w in wavs)

    # spectrograms: a log-VQT .npy per wav with the full 480-bin layout,
    # plus the model-rate int16 audio/ twin for input_features: audio.
    specs = sorted(os.listdir(train0 / "spectrogram"))
    assert len(specs) == len(wavs)
    spec = np.load(train0 / "spectrogram" / specs[0])
    assert spec.ndim == 2 and spec.shape[1] == 480
    assert np.isfinite(spec).all()
    audios = sorted(os.listdir(train0 / "audio"))
    assert audios == specs
    assert np.load(train0 / "audio" / audios[0]).dtype == np.int16

    # ... and the audio-mode dataset round-trips the pipeline's output
    # (the `input_features: audio` training layout works end-to-end
    # from the REAL synthesis pipeline, not just data/synth.py).
    from piano_a2s_tpu.data import SyntheticTrainDataset
    ds = SyntheticTrainDataset(
        str(root / "features"), "train", versions=[0],
        input_features="audio", max_samples=16000,
        rng=np.random.RandomState(0))
    item = ds[0]
    assert item["audio"].dtype == np.int16
    assert item["audio"].shape == (16000,)
    assert item["upper"].ndim == 2

    # Target payload decodes: 5 measures of (key, time, lower, upper).
    with open(train0 / "target" / targets[0], "rb") as f:
        target = pickle.load(f)
    assert len(target) == 5 and target[0][1] == "4/4"


def test_syn_stage_subset_and_overrides(syn_corpus, capsys):
    """key=value args are overrides (not stages); a stage subset runs only
    those stages; train_versions=0 short-circuits."""
    root, yaml_path = syn_corpus
    rc = prepare_data.main(["syn", str(yaml_path), "convert",
                            "train_versions=0",
                            "--kern-folder", str(root / "kern"),
                            "--xml-folder", str(root / "xml")])
    assert rc == 0
    assert "nothing to do" in capsys.readouterr().out

    rc = prepare_data.main(["syn", str(yaml_path), "convert",
                            "--kern-folder", str(root / "kern"),
                            "--xml-folder", str(root / "xml")])
    assert rc == 0
    assert (root / "kern" / "zz_test_song.krn").exists()
    # Only `convert` ran: no features were produced.
    assert not (root / "features").exists()


def test_syn_unknown_stage_rejected(syn_corpus):
    root, yaml_path = syn_corpus
    with pytest.raises(SystemExit):
        prepare_data.main(["syn", str(yaml_path), "sepctrograms"])


def test_asap_end_to_end(fake_bin, tmp_path, monkeypatch):  # noqa: F811
    """The `asap` branch: ProcessASAP.process_all over a fake ASAP checkout
    — score conversion via verovio, annotation matching, chunk slicing,
    target building, unmatched journaling, spectrograms."""
    from piano_a2s_tpu.symbolic.humdrum import Kern, count_measure_segments

    root = tmp_path / "ws"
    # train_asap.txt's first entry is Bach#Prelude#bwv_862; the anchor dir
    # name `asap-dataset` is what _score_name splits on.
    song_dir = root / "asap" / "asap-dataset" / "Bach" / "Prelude" / "bwv_862"
    song_dir.mkdir(parents=True)
    (song_dir / "xml_score.musicxml").write_text("<score/>")

    score_text = _long_score(12)
    kern_fixture = tmp_path / "score.krn"
    kern_fixture.write_text(score_text)
    monkeypatch.setenv("FAKE_VEROVIO_HUM", str(kern_fixture))
    n_measures = count_measure_segments("\n".join(Kern(data=score_text).body))

    # Matching performance: one downbeat per measure, 1 s apart, with
    # time signature and (numeric) key carried on each line.
    anno = "".join(f"{t}.0\t{t}.0\tdb,4/4,1\n" for t in range(n_measures))
    (song_dir / "perf1_annotations.txt").write_text(anno)
    _write_sine_wav(song_dir / "perf1.wav", n_measures + 1.0)
    # Mismatched performance: annotation count != score measures.
    (song_dir / "perf2_annotations.txt").write_text(
        "0.0\t0.0\tdb,4/4,1\n1.0\t1.0\tdb,4/4,1\n")
    _write_sine_wav(song_dir / "perf2.wav", 3.0)

    yaml_path = tmp_path / "asap.yaml"
    yaml_path.write_text(ASAP_YAML.format(root=root))
    rc = prepare_data.main(["asap", str(yaml_path)])
    assert rc == 0

    features = root / "asap_features"
    unmatched = (features / "unmatched.txt").read_text().split()
    assert unmatched == ["Bach#Prelude#bwv_862#perf2"]

    train = features / "train"
    targets = sorted(os.listdir(train / "target"))
    assert targets, "matching performance produced no chunks"
    assert all(t.startswith("Bach#Prelude#bwv_862#perf1.") for t in targets)
    with open(train / "target" / targets[0], "rb") as f:
        target = pickle.load(f)
    assert len(target) == 5
    for key, time, lower, upper in target:
        assert key == 1 and time == "4/4" and lower and upper
    # kern / kern_upper / kern_lower written per chunk; wav is the 5 s
    # annotation-bounded slice; spectrogram computed for each target.
    name = targets[0][:-4]
    for sub in ("kern", "kern_upper", "kern_lower"):
        assert (train / sub / f"{name}.krn").exists()
    from piano_a2s_tpu.utils.audio import read_wav
    audio, sr = read_wav(str(train / "wav" / f"{name}.wav"))
    assert abs(len(audio) / sr - 5.0) < 0.01
    specs = sorted(os.listdir(train / "spectrogram"))
    assert len(specs) == len(targets)
