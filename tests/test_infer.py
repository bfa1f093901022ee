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


def test_int16_pcm_bit_identical_to_float():
    """Raw int16 PCM clips (the 16-bit-WAV fast path) produce exactly the
    float32 path's results: the on-device conversion uses read_wav's
    /32768 scale, so the floats are identical."""
    tr = _transcriber()
    rng = np.random.RandomState(4)
    ints = [(rng.randint(-3000, 3000, n)).astype(np.int16)
            for n in (12000, 16000, 9000)]
    floats = [i.astype(np.float32) / 32768.0 for i in ints]
    expected = list(tr.transcribe_stream(floats, batch_size=2, depth=0))
    got = list(tr.transcribe_stream(ints, batch_size=2, depth=0))
    assert got == expected
    # blocking API accepts int16 too (host-side conversion)
    assert tr.transcribe(ints[0]) == expected[0]


def test_stream_mixed_int16_and_float_batches():
    """A stream mixing int16 and float clips inside ONE batch normalizes
    host-side (np.stack would promote raw int16 VALUES to float)."""
    tr = _transcriber()
    rng = np.random.RandomState(5)
    i16 = rng.randint(-3000, 3000, 12000).astype(np.int16)
    f32 = 0.1 * rng.randn(12000).astype(np.float32)
    mixed = list(tr.transcribe_stream([i16, f32], batch_size=2, depth=0))
    assert mixed[0] == tr.transcribe(i16)
    assert mixed[1] == tr.transcribe(f32)


def test_read_wav_pcm16_roundtrip(tmp_path):
    """read_wav_pcm16 returns the exact samples write_wav stored, and the
    /32768 scale matches read_wav; non-16-bit/mono files return None."""
    import struct
    import wave

    from piano_a2s_tpu.utils.audio import (read_wav, read_wav_pcm16,
                                           write_wav)
    rng = np.random.RandomState(6)
    data = np.clip(0.3 * rng.randn(5000), -1, 1).astype(np.float32)
    path = str(tmp_path / "m.wav")
    write_wav(path, data, 16000)
    pcm, sr = read_wav_pcm16(path)
    assert sr == 16000 and pcm.dtype == np.int16
    f, sr2 = read_wav(path)
    np.testing.assert_array_equal(pcm.astype(np.float32) / 32768.0, f)

    stereo = str(tmp_path / "s.wav")
    with wave.open(stereo, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(struct.pack("<4h", 1, 2, 3, 4))
    assert read_wav_pcm16(stereo) is None
