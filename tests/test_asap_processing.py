"""ASAP preprocessing: chunk processing without external tools, and loader
prefetch equivalence."""

import os
import pickle

import numpy as np

from piano_a2s_tpu.data.asap import ProcessASAP
from piano_a2s_tpu.symbolic.humdrum import Kern

CHUNK = """**kern	**kern
*clefF4	*clefG2
*k[]	*k[]
*M4/4	*M4/4
2C 2E	4cc
.	4dd
2G	2ee
=2	=2
1D	1ff
=3	=3
2E	2gg
2F	2aa
=4	=4
1G	1bb
=5	=5
1A	1b
=6	=6
*-	*-
"""


def _processor(tmp_path):
    proc = ProcessASAP.__new__(ProcessASAP)
    proc.asap_folder = str(tmp_path / "asap")
    proc.feature_folder = str(tmp_path / "features")
    proc.sample_rate = 16000
    proc.max_duration = 12.0
    from piano_a2s_tpu.symbolic.vocab import LabelsMultiple
    from piano_a2s_tpu.data.datasets import load_time_signatures
    proc.labels = LabelsMultiple(extended=True)
    proc.time_sig_list = load_time_signatures()
    return proc


def test_process_chunk_builds_target_and_wav(tmp_path):
    proc = _processor(tmp_path)
    split_dir = os.path.join(proc.feature_folder, "train")
    for sub in ("wav", "kern", "kern_upper", "kern_lower", "target",
                "info"):
        os.makedirs(os.path.join(split_dir, sub), exist_ok=True)
    sr = 16000
    audio = 0.1 * np.random.RandomState(0).randn(10 * sr).astype(np.float32)
    # downbeats: sentinel + 7 downbeats @ 1s spacing, key=0, time 4/4
    downbeats = [(0.0, "0", "4/4")] + [
        (float(t), "0", "4/4") for t in range(1, 8)]
    chunk = Kern(data=CHUNK)
    ok = proc._process_chunk(chunk, 0, audio, sr, downbeats,
                             "composer#piece", "perf1", split_dir, "train")
    assert ok
    target_path = os.path.join(split_dir, "target",
                               "composer#piece#perf1.0.pkl")
    assert os.path.exists(target_path)
    with open(target_path, "rb") as f:
        target = pickle.load(f)
    assert len(target) == 5
    assert all(m[1] == "4/4" and m[0] == 0 for m in target)
    wav_path = os.path.join(split_dir, "wav", "composer#piece#perf1.0.wav")
    assert os.path.exists(wav_path)
    from piano_a2s_tpu.utils.audio import read_wav
    data, rate = read_wav(wav_path)
    assert rate == sr and 4 * sr <= len(data) <= 12 * sr

    # spectrogram generation picks up the wav, and also emits the
    # model-rate int16 audio/ layout the on-device-VQT finetune mode
    # (input_features: audio) reads
    n = proc.prepare_spectrograms()
    assert n == 1
    spec = np.load(os.path.join(split_dir, "spectrogram",
                                "composer#piece#perf1.0.npy"))
    assert spec.shape[1] == 480
    pcm = np.load(os.path.join(split_dir, "audio",
                               "composer#piece#perf1.0.npy"))
    assert pcm.dtype == np.int16 and len(pcm) == len(data)
    np.testing.assert_allclose(pcm / 32768.0, np.clip(data, -1, 1),
                               atol=1.0 / 32768.0)
    # and the ASAPDataset audio mode can now read the layout
    from piano_a2s_tpu.data import ASAPDataset
    item = ASAPDataset(proc.feature_folder, "train",
                       input_features="audio")[0]
    assert item["audio"].dtype == np.int16


def test_process_chunk_rejects_short_audio(tmp_path):
    proc = _processor(tmp_path)
    split_dir = os.path.join(proc.feature_folder, "train")
    for sub in ("wav", "kern", "kern_upper", "kern_lower", "target"):
        os.makedirs(os.path.join(split_dir, sub), exist_ok=True)
    sr = 16000
    audio = np.zeros(8 * sr, np.float32)
    downbeats = [(0.0, "0", "4/4")] + [
        (0.2 * t, "0", "4/4") for t in range(1, 8)]  # 1 s window < 4 s min
    ok = proc._process_chunk(Kern(data=CHUNK), 0, audio, sr, downbeats,
                             "c#p", "perf", split_dir, "train")
    assert not ok


def test_dataloader_prefetch_order_identical(tmp_path):
    from piano_a2s_tpu.data.datasets import DataLoader

    class Dummy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"spectrogram": np.full((1, 2, 2), i, np.float32),
                    "time_sig": np.zeros(2, np.int32),
                    "key": np.zeros(2, np.int32),
                    "upper": np.zeros((2, 3), np.int32),
                    "upper_lengths": np.ones(2, np.int32),
                    "lower": np.zeros((2, 3), np.int32),
                    "lower_lengths": np.ones(2, np.int32),
                    "name": f"s{i}", "version": 0}

    a = [b["names"] for b in DataLoader(Dummy(), 3, shuffle=True, seed=5,
                                        prefetch=0)]
    b = [b["names"] for b in DataLoader(Dummy(), 3, shuffle=True, seed=5,
                                        prefetch=2)]
    assert a == b
    assert len(a) == 4 and len(a[-1]) == 3  # final batch padded


def test_drop_opening_barline_alignment():
    """An opening (e.g. invisible '=1-') barline before any content must
    not create an empty leading measure: chunks would silently sit one
    measure behind their downbeat audio windows (the content-based
    measure-count guard can't catch the shift)."""
    from piano_a2s_tpu.data.asap import drop_opening_barline

    KERN = ("**kern\n*clefG2\n*k[]\n*M4/4\n=1-\n4c\n=2\n4e\n=3\n4f\n"
            "=4\n4g\n=5\n4a\n=6\n4b\n==\n*-\n")
    fixed = drop_opening_barline(Kern(data=KERN))
    assert "=1-" not in fixed.body
    chunks = fixed.split(5, 1)
    # chunk 0 must cover content measures 1..5 (4c..4a), not pad with an
    # empty leading measure (which left it at 4c..4g)
    content = [ln for ln in chunks[0].body
               if not ln.startswith(("*", "!", "="))]
    assert content == ["4c", "4e", "4f", "4g", "4a"]

    # no leading barline -> unchanged object content
    KERN2 = "**kern\n*M4/4\n4c\n=2\n4e\n==\n*-\n"
    assert drop_opening_barline(Kern(data=KERN2)).body == \
        Kern(data=KERN2).body


def test_dataloader_abandoned_iterator_releases_producer():
    """Breaking out of a prefetching loader must stop the producer thread
    (review finding: it blocked forever on a full queue, pinning
    `prefetch` batches of host memory per abandoned epoch)."""
    import threading
    import time

    from piano_a2s_tpu.data.datasets import DataLoader

    class Dummy:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"spectrogram": np.zeros((1, 2, 2), np.float32),
                    "time_sig": np.zeros(2, np.int32),
                    "key": np.zeros(2, np.int32),
                    "upper": np.zeros((2, 3), np.int32),
                    "upper_lengths": np.ones(2, np.int32),
                    "lower": np.zeros((2, 3), np.int32),
                    "lower_lengths": np.ones(2, np.int32),
                    "name": f"s{i}", "version": 0}

    before = threading.active_count()
    for _ in range(5):
        it = iter(DataLoader(Dummy(), 2, prefetch=2))
        next(it)
        it.close()  # the consumer walks away after one batch
    deadline = time.monotonic() + 5.0
    while threading.active_count() > before and time.monotonic() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= before


def test_pad_score_empty_measures():
    """A zero-measure target yields (0, max_length) arrays (the
    reference's torch.zeros shape), not a np.stack ValueError."""
    from piano_a2s_tpu.data.datasets import _DatasetBase

    ds = _DatasetBase.__new__(_DatasetBase)
    ds.pad_id, ds.eos_id = 147, 146
    padded, lengths = ds.pad_score([], 6)
    assert padded.shape == (0, 6) and lengths.shape == (0,)


def test_synthetic_train_dataset_default_rng_is_seeded(tmp_path):
    """Two independently-constructed datasets (no rng passed) must sample
    the SAME versions — per-host sharded loading depends on lockstep
    locators (review finding: the default was OS entropy)."""
    import json
    import pickle

    from piano_a2s_tpu.data.datasets import SyntheticTrainDataset

    for v in range(3):
        base = tmp_path / "train" / str(v)
        for d in ("spectrogram", "target", "info"):
            (base / d).mkdir(parents=True)
        np.save(base / "spectrogram" / "s.npy", np.zeros((4, 8), np.float32))
        with open(base / "target" / "s.pkl", "wb") as f:
            pickle.dump([[0, "4/4", [1], [1]]], f)
        json.dump({}, open(base / "info" / "s.json", "w"))

    kw = dict(feature_folder=str(tmp_path), versions=range(3),
              max_frame_num=8, max_length=(4, 3))
    a = SyntheticTrainDataset(**kw)
    b = SyntheticTrainDataset(**kw)
    locs_a = [a.locate(0) for _ in range(20)]
    locs_b = [b.locate(0) for _ in range(20)]
    assert locs_a == locs_b
