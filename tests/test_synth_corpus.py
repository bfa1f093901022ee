"""Synthetic corpus generator: layout contract, audio-token consistency,
and trainability of the generated data."""

import os
import pickle

import numpy as np

import jax

from piano_a2s_tpu.data.synth import (make_song, synthesize_bar,
                                      synthesize_target_audio, write_corpus)
from piano_a2s_tpu.ops.vqt import VQTConfig
from piano_a2s_tpu.symbolic.vocab import LabelsMultiple


def test_single_note_lands_on_its_vqt_bin():
    """A rendered note's fundamental shows up at the right VQT bin:
    the audio<->token mapping is physically consistent, not just noise."""
    from piano_a2s_tpu.ops.vqt import get_vqt_host
    sr = 16000
    out = np.zeros(sr * 2, np.float64)
    synthesize_bar("1c", 1.5, sr, out, 0.25)  # C4 for 1.5 s
    cfg = VQTConfig(sample_rate=sr)
    spec = get_vqt_host(out.astype(np.float32), cfg)
    frame = spec[spec.shape[0] // 2]
    # C4 = 261.63 Hz; fmin = A0 27.5 Hz; 60 bins/octave
    expected_bin = round(60 * np.log2(261.63 / 27.5))
    assert abs(int(np.argmax(frame)) - expected_bin) <= 1


def test_make_song_contract():
    rng = np.random.RandomState(0)
    target, audio = make_song(rng, n_bars=5)
    assert len(target) == 5
    labels = LabelsMultiple(extended=True)
    for key, ts, lower, upper in target:
        assert -6 <= key <= 7 and ts == "4/4"
        # token sequences decode back to kern note text and stay well
        # under the (398, 189) caps
        assert 0 < len(lower) <= 30 and 0 < len(upper) <= 40
        text = "".join(labels.decode(upper))
        assert text and all(ch not in text for ch in ("<", ">"))
    assert audio.dtype == np.float32
    assert len(audio) <= 12 * 16000
    assert 0.5 < np.abs(audio).max() <= 0.71  # normalized, non-silent


def test_synthesize_from_tokens_matches_text_path():
    """Decoding the stored token ids reproduces the same audio as the
    original bar text (the corpus is reconstructible from targets alone)."""
    rng = np.random.RandomState(3)
    target, audio = make_song(rng, n_bars=2)
    audio2 = synthesize_target_audio(target)  # decodes token ids
    np.testing.assert_allclose(audio, audio2, atol=1e-6)


def test_write_corpus_multiversion(tmp_path):
    """Multi-version corpora: identical targets per song across versions,
    distinct audio renderings (timbre/tempo), per-version fonts in the
    names, style-mixed chunk casing — the layout SyntheticTrainDataset's
    random-version sampling consumes."""
    root = str(tmp_path / "features")
    n = write_corpus(root, "train", 4, seed=9, n_bars=2, frontend="none",
                     versions=[0, 1, 2], style_mix=True)
    assert n == 4
    targets, audios = [], []
    for v in range(3):
        base = os.path.join(root, "train", str(v))
        names = sorted(os.listdir(os.path.join(base, "audio")))
        assert len(names) == 4
        # casing mix: half pop (upper), half classical (lower)
        chunks = [nm.split("~")[0] for nm in names]
        assert sum(c[0].isupper() for c in chunks) == 2
        assert all(nm.split("~")[1] == f"v{v}" for nm in names)
        with open(os.path.join(base, "target", chunks[0] + ".pkl"),
                  "rb") as f:
            targets.append(pickle.load(f))
        audios.append(np.load(os.path.join(base, "audio", names[0])))
    assert targets[0] == targets[1] == targets[2]  # same symbolic content
    # renderings genuinely differ (timbre + clip length)
    assert not (len(audios[0]) == len(audios[1])
                and np.allclose(audios[0], audios[1]))

    from piano_a2s_tpu.data import SyntheticTrainDataset
    ds = SyntheticTrainDataset(root, "train", versions=[0, 1, 2],
                               max_length=(64, 64),
                               input_features="audio",
                               rng=np.random.RandomState(0))
    assert len(ds) == 4
    item = ds[0]
    assert item["audio"].ndim == 1 and item["upper"].shape == (2, 64)


def test_write_corpus_loads_and_trains(tmp_path):
    root = str(tmp_path / "features")
    n = write_corpus(root, "train", 3, seed=5, n_bars=2,
                     frontend="direct")  # direct host VQT: fast for CI
    assert n == 3
    base = os.path.join(root, "train", "0")
    names = sorted(os.listdir(os.path.join(base, "spectrogram")))
    assert len(names) == 3 and names[0].endswith("~v0~Upright.npy")
    spec = np.load(os.path.join(base, "spectrogram", names[0]))
    assert spec.shape[1] == 480 and spec.shape[0] <= 1201
    assert np.isfinite(spec).all() and spec.max() <= 1.0
    with open(os.path.join(base, "target",
                           names[0].split("~")[0] + ".pkl"), "rb") as f:
        target = pickle.load(f)
    assert len(target) == 2
    audio = np.load(os.path.join(base, "audio", names[0]))
    assert audio.dtype == np.float32

    # Loads through the standard dataset/loader contract and takes a
    # finite full-pipeline train step on a small model.
    from piano_a2s_tpu.data import DataLoader, SyntheticTrainDataset
    from piano_a2s_tpu.models import ModelConfig, init_params, init_state
    from piano_a2s_tpu.train.step import make_jitted_steps, make_optimizer

    ds = SyntheticTrainDataset(root, "train", versions=[0],
                               max_frame_num=1201, max_length=(64, 64),
                               rng=np.random.RandomState(0))
    (batch,) = list(DataLoader(ds, 3, shuffle=False))
    assert batch["spectrogram"].shape == (3, 1, 1201, 480)
    assert (batch["upper_lengths"] > 0).all()

    cfg = ModelConfig(conv_feature_size=8, hidden_size=8, max_bars=2,
                      max_length=(64, 64), note_emb_size=4,
                      staff_emb_size=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=1.0)
    t_step, _ = make_jitted_steps(opt, cfg)
    _, _, _, out = t_step(params, opt.init(params), init_state(cfg),
                          {k: v for k, v in batch.items()
                           if k not in ("names", "versions", "n_real")},
                          jax.random.PRNGKey(0), 1.0)
    assert np.isfinite(float(out.loss))
