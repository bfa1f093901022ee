"""Real-music fixtures through the full symbolic pipeline.

VERDICT r3 item 4: the synthetic corpora exercise random-walk bars only;
these hand-encoded public-domain excerpts (tests/fixtures/kern/ — Mozart
K.545, Beethoven Op.27/2, the Bach-notebook Minuet, Clementi Op.36/1)
carry the constructs real scores hit: chords, ties across bars, triplet
twelfths, dotted rhythms, rests, 3/4 meter, 4-sharp/1-sharp keys, Alberti
figures and 16th runs. Each runs clean -> split -> transpose -> targets
(data/render.py, reference: render.py:52-233), then decode-side export
to MusicXML + MIDI (symbolic/export.py) and a native-MV2H self-score.

First-chunk targets are pinned in tests/goldens/real_scores.json so any
parser/tokenizer/transposition change on real-music input is a visible
diff, not a silent drift. (The real hum2xml/music21 cross-check of
VERDICT Missing #5 stays open: neither tool exists in this image, so no
authentic golden can be recorded — README documents that limit.)
"""

import glob
import json
import os
import pickle
import xml.etree.ElementTree as ET

import numpy as np
import pytest

sys_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = sorted(glob.glob(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "kern",
    "*.krn")))
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "goldens", "real_scores.json")


@pytest.fixture(scope="module")
def pipeline_outputs(tmp_path_factory):
    from piano_a2s_tpu.data.render import (load_time_signatures,
                                           split_single_score)
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple

    labels = LabelsMultiple(extended=True)
    ts_list = load_time_signatures()
    root = str(tmp_path_factory.mktemp("real_scores"))
    out = {}
    for path in FIXTURES:
        name = os.path.basename(path).split(".")[0]
        counts = {}
        for split in ("test", "train"):
            counts[split] = split_single_score(
                path, root, labels, ts_list, split=split, version=0,
                rng=np.random.RandomState(0))
        out[name] = {"root": root, "counts": counts}
    return out


def test_fixtures_produce_chunks(pipeline_outputs):
    assert len(FIXTURES) == 4
    for name, info in pipeline_outputs.items():
        assert info["counts"]["test"] >= 1, name
        # train stride 2 yields strictly more chunks than test stride 5
        assert info["counts"]["train"] >= info["counts"]["test"], name


def test_targets_decode_and_structure(pipeline_outputs):
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
    labels = LabelsMultiple(extended=True)
    for name, info in pipeline_outputs.items():
        tgt_path = os.path.join(info["root"], "test", "0", "target",
                                f"{name}.0.pkl")
        with open(tgt_path, "rb") as f:
            target = pickle.load(f)
        assert len(target) == 5, name  # 5-bar chunks
        for key, ts, lower, upper in target:
            assert -6 <= int(key) <= 7
            assert ts in ("4/4", "3/4")
            # token ids decode to kern text and re-encode identically
            for seq in (lower, upper):
                text = "".join(labels.decode(seq))
                assert labels.encode(text) == list(seq), (name, text)


def test_train_split_transposes_within_feasible_range(pipeline_outputs):
    """Train chunks draw a transposition; keys must stay in [-6, 7] and
    match the transposed kern written next to the target."""
    for name, info in pipeline_outputs.items():
        targets = sorted(glob.glob(os.path.join(
            info["root"], "train", "0", "target", f"{name}.*.pkl")))
        assert targets, name
        for t in targets:
            with open(t, "rb") as f:
                target = pickle.load(f)
            for key, *_ in target:
                assert -6 <= int(key) <= 7, (name, key)


def test_export_to_musicxml_and_midi(pipeline_outputs, tmp_path):
    from piano_a2s_tpu.symbolic.export import export_target
    from piano_a2s_tpu.symbolic.midi_io import read_midi
    from piano_a2s_tpu.train.mv2h import run_native_mv2h_pair

    for name, info in pipeline_outputs.items():
        with open(os.path.join(info["root"], "test", "0", "target",
                               f"{name}.0.pkl"), "rb") as f:
            target = pickle.load(f)
        xml_path = str(tmp_path / f"{name}.musicxml")
        midi_path = str(tmp_path / f"{name}.mid")
        export_target(target, xml_path, midi_path)

        tree = ET.parse(xml_path)  # well-formed XML
        notes = tree.getroot().iter("note")
        n_xml = sum(1 for _ in notes)
        n_target = sum(
            sum(1 for tok in ("".join(_decode(m[i])).split())
                if any(c.isalpha() and c.lower() in "abcdefgr"
                       for c in tok))
            for m in target for i in (2, 3))
        assert n_xml > 0 and n_xml >= 0.5 * n_target, (name, n_xml,
                                                       n_target)

        midi = read_midi(midi_path)
        n_on = sum(1 for tr in midi.tracks for ev in tr
                   if ev.kind == "note_on" and len(ev.data) >= 2
                   and ev.data[1] > 0)
        assert n_on > 0, name

        # the exported MIDI scores a perfect MV2H against itself
        self_score = run_native_mv2h_pair(midi_path, midi_path)
        assert all(abs(v - 1.0) < 1e-9 for v in self_score.values()), (
            name, self_score)


def _decode(seq):
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
    return LabelsMultiple(extended=True).decode(seq)


def test_first_chunk_targets_match_goldens(pipeline_outputs):
    """Pin the test-split first chunk of every fixture. Regenerate with
    tests/fixtures/kern/regen_goldens.py after INTENTIONAL parser or
    tokenizer changes; any other diff is a real-music regression."""
    with open(GOLDEN) as f:
        golden = json.load(f)
    for name, info in pipeline_outputs.items():
        with open(os.path.join(info["root"], "test", "0", "target",
                               f"{name}.0.pkl"), "rb") as f:
            target = pickle.load(f)
        got = [[int(m[0]), str(m[1]), list(map(int, m[2])),
                list(map(int, m[3]))] for m in target]
        assert got == golden[name], name
