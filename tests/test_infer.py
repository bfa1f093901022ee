"""Transcriber end-to-end on CPU: audio -> target structure -> files."""

import os
import xml.etree.ElementTree as ET

import numpy as np

import jax
import jax.numpy as jnp

from piano_a2s_tpu.infer import Transcriber, result_to_files
from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.ops.vqt import VQTConfig

CFG = ModelConfig(freq_bins=12, conv_feature_size=16, hidden_size=16,
                  max_bars=2, max_length=(8, 6), note_emb_size=8,
                  staff_emb_size=8)
VQT = VQTConfig(bins_per_octave=3, n_octaves=4, window_size=1024,
                sample_rate=16000, hop_length=160)


def _transcriber(eos_bias=4.0):
    params = init_params(jax.random.PRNGKey(0), CFG)
    for d in ("upper", "lower"):
        b = np.array(params["decoder"][d]["out"]["b"])
        b[CFG.eos] += eos_bias
        params["decoder"][d]["out"]["b"] = jnp.asarray(b)
    state = init_state(CFG)
    return Transcriber(params, state, CFG, VQT, max_frame_num=101)


def test_transcribe_and_export(tmp_path):
    tr = _transcriber()
    audio = (0.1 * np.random.RandomState(0).randn(16000)).astype(np.float32)
    result = tr.transcribe(audio)
    assert len(result) == CFG.max_bars
    for key, ts, lower, upper in result:
        assert -6 <= key <= 7
        assert "/" in ts
        assert isinstance(lower, list) and isinstance(upper, list)
    paths = result_to_files(result, str(tmp_path / "out"))
    assert os.path.exists(paths["kern"])
    ET.parse(paths["musicxml"])
    raw = open(paths["midi"], "rb").read()
    assert raw[:4] == b"MThd"


def test_transcribe_batch_shapes():
    tr = _transcriber()
    rng = np.random.RandomState(1)
    clips = [0.1 * rng.randn(12000).astype(np.float32) for _ in range(3)]
    results = tr.transcribe_batch(clips)
    assert len(results) == 3
    # short audio is padded; all clips produce max_bars entries
    assert all(len(r) == CFG.max_bars for r in results)


def test_transcribe_stream_equals_blocking_calls():
    """The pipelined serving loop yields exactly the blocking API's results
    (in order, including the padded final partial batch), at every queue
    depth — pipelining is a scheduling change, not a numeric one."""
    tr = _transcriber()
    rng = np.random.RandomState(2)
    clips = [0.1 * rng.randn(n).astype(np.float32)
             for n in (12000, 16000, 8000, 16000, 5000)]
    expected = [tr.transcribe(c) for c in clips]
    for depth in (0, 1, 3):
        streamed = list(tr.transcribe_stream(clips, batch_size=2,
                                             depth=depth))
        assert streamed == expected, f"depth={depth}"


def test_transcribe_stream_lazy_consumption():
    """The stream accepts a generator and never materializes all clips."""
    tr = _transcriber()
    rng = np.random.RandomState(3)
    produced = []

    def gen():
        for i in range(5):
            produced.append(i)
            yield 0.1 * rng.randn(8000).astype(np.float32)

    it = tr.transcribe_stream(gen(), batch_size=2, depth=1)
    first = next(it)
    assert len(first) == CFG.max_bars
    # depth-1 pipeline: at most 2 batches (4 clips) consumed for 1 result
    assert len(produced) <= 4
    rest = list(it)
    assert len(rest) == 4
