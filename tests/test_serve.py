"""HTTP serving (piano_a2s_tpu.serve): dynamic-batching server over the
Transcriber — routes, WAV/.npy ingestion, all four output formats,
concurrent requests batched into one device call, and error paths.
(The reference has no serving surface; this is framework-only scope.)"""

import io
import json
import threading
import time
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest

import jax

from piano_a2s_tpu.infer import Transcriber
from piano_a2s_tpu.models import ModelConfig, init_params, init_state
from piano_a2s_tpu.ops.vqt import VQTConfig
from piano_a2s_tpu.serve import TranscriptionService, make_server

VCFG = VQTConfig(bins_per_octave=4, n_octaves=4)
CFG = ModelConfig(freq_bins=16, conv_feature_size=24, hidden_size=16,
                  max_bars=2, max_length=(8, 6), note_emb_size=8,
                  staff_emb_size=8)
T_ENC = 20


def _transcriber():
    params = init_params(jax.random.PRNGKey(0), CFG)
    for d in ("upper", "lower"):
        b = np.array(params["decoder"][d]["out"]["b"])
        b[CFG.eos] += 6.0
        params["decoder"][d]["out"]["b"] = np.asarray(b)
    return Transcriber(params, init_state(CFG), CFG, vqt_cfg=VCFG,
                       max_frame_num=T_ENC)


def _wav_bytes(audio: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype("<i2")
                      .tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def server():
    tr = _transcriber()
    tr.transcribe_batch([np.zeros(1000, np.float32)])  # warm compile
    httpd = make_server(tr, "127.0.0.1", 0, max_batch=4, max_wait_ms=30)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    httpd.service.close()


def _post(url, body, **kw):
    req = urllib.request.Request(url, data=body, method="POST")
    return urllib.request.urlopen(req, timeout=kw.pop("timeout", 60))


def test_healthz_and_stats_routes(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=10) as r:
        info = json.load(r)
    assert info["status"] == "ok"
    assert info["sample_rate"] == VCFG.sample_rate
    with urllib.request.urlopen(f"{server}/stats", timeout=10) as r:
        stats = json.load(r)
    assert {"requests", "batches", "clips_per_batch"} <= set(stats)


def test_transcribe_wav_json(server):
    rng = np.random.RandomState(0)
    audio = (0.2 * rng.randn(2 * VCFG.sample_rate)).astype(np.float32)
    with _post(f"{server}/transcribe",
               _wav_bytes(audio, VCFG.sample_rate)) as r:
        out = json.load(r)
    assert len(out["bars"]) == CFG.max_bars
    assert set(out["kern"]) == {"upper", "lower"}  # decoded notation
    bar = out["bars"][0]
    assert {"key_signature", "time_signature",
            "upper_tokens", "lower_tokens"} <= set(bar)
    assert bar["time_signature"] in ("4/4", "3/4", "2/4", "6/8", "2/2",
                                     "12/8", "3/8")

    # a WAV at a different sample rate is resampled host-side
    with _post(f"{server}/transcribe", _wav_bytes(
            audio[: VCFG.sample_rate], 8000)) as r:
        assert len(json.load(r)["bars"]) == CFG.max_bars


def test_transcribe_npy_and_formats(server):
    rng = np.random.RandomState(1)
    audio = (0.2 * rng.randn(VCFG.sample_rate)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, audio)
    body = buf.getvalue()
    for fmt, ctype_part, probe in (
            ("kern", "text/plain", b"!! upper staff"),
            ("musicxml", "musicxml", b"<score-partwise"),
            ("midi", "audio/midi", b"MThd")):
        with _post(f"{server}/transcribe?format={fmt}", body) as r:
            data = r.read()
            assert ctype_part in r.headers["Content-Type"], fmt
        assert probe in data[:200], (fmt, data[:40])

    # int16 npy accepted too
    buf = io.BytesIO()
    np.save(buf, (audio * 32767).astype(np.int16))
    with _post(f"{server}/transcribe", buf.getvalue()) as r:
        assert len(json.load(r)["bars"]) == CFG.max_bars


def test_error_paths(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/transcribe", b"not audio at all")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/transcribe?format=opus",
              _wav_bytes(np.zeros(1000, np.float32), VCFG.sample_rate))
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/nope", b"x")
    assert e.value.code == 404
    # a spectrogram-shaped npy is rejected with a diagnosis
    buf = io.BytesIO()
    np.save(buf, np.zeros((10, 16), np.float32))
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/transcribe", buf.getvalue())
    assert e.value.code == 400
    assert "1-D" in json.load(e.value)["error"]


def test_concurrent_requests_are_batched(server):
    """N parallel clients within the batching window -> fewer device
    batches than requests (the dynamic batcher at work)."""
    with urllib.request.urlopen(f"{server}/stats", timeout=10) as r:
        before = json.load(r)
    rng = np.random.RandomState(2)
    bodies = [_wav_bytes((0.2 * rng.randn(VCFG.sample_rate))
                         .astype(np.float32), VCFG.sample_rate)
              for _ in range(4)]
    results, errors = [None] * 4, []

    def call(i):
        try:
            with _post(f"{server}/transcribe", bodies[i]) as r:
                results[i] = json.load(r)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors and all(r is not None for r in results)
    with urllib.request.urlopen(f"{server}/stats", timeout=10) as r:
        after = json.load(r)
    n_req = after["requests"] - before["requests"]
    n_batches = after["batches"] - before["batches"]
    assert n_req == 4
    assert n_batches < n_req  # at least two requests shared a batch
    assert after["max_batch_seen"] >= 2


def test_service_direct_and_close():
    tr = _transcriber()
    svc = TranscriptionService(tr, max_batch=2, max_wait_ms=5)
    out = svc.submit(np.zeros(1000, np.float32))
    assert len(out) == CFG.max_bars
    svc.close()
    with pytest.raises(RuntimeError):
        svc.submit(np.zeros(1000, np.float32))


class _FakeTranscriber:
    """Deterministic stand-in for batching-semantics tests: records the
    batch sizes the worker forms, no device work."""

    def __init__(self, device_s=0.0):
        self.batches = []
        self.device_s = device_s

    def prepare_batch(self, clips):
        return list(clips), len(clips)

    def transcribe_prepared(self, specs, n, timings=None):
        import time as _t

        self.batches.append(n)
        if self.device_s:
            _t.sleep(self.device_s)
        return [[0]] * n


def test_fullness_window_fills_underfull_batches():
    """The admission window: with fullness_target set, a batch that is
    under-full when the base window expires keeps waiting (bounded by
    fullness_extra_ms) for stragglers — so staggered arrivals land in ONE
    batch instead of two. With the window off, the same pattern splits."""
    import time

    for target, extra_ms in ((1.0, 2000.0), (0.0, 0.0)):
        fake = _FakeTranscriber()
        svc = TranscriptionService(fake, max_batch=4, max_wait_ms=30,
                                   fullness_target=target,
                                   fullness_extra_ms=extra_ms)
        threads = []
        for i in range(4):
            t = threading.Thread(target=svc.submit,
                                 args=(np.zeros(8, np.float32),))
            threads.append(t)
            t.start()
            time.sleep(0.06)  # arrivals straggle past the 30 ms window
        for t in threads:
            t.join(timeout=30)
        svc.close()
        if target:
            # the admission window holds the batch until it is FULL
            assert fake.batches == [4], fake.batches
        else:
            # without it, the same arrival pattern splits into several
            # under-full batches
            assert len(fake.batches) >= 2, fake.batches


def test_fullness_extra_is_a_hard_cap():
    """An unreachable target must still release the batch once the extra
    window expires (no starvation)."""
    import time

    fake = _FakeTranscriber()
    svc = TranscriptionService(fake, max_batch=8, max_wait_ms=10,
                               fullness_target=1.0,
                               fullness_extra_ms=80.0)
    t0 = time.monotonic()
    svc.submit(np.zeros(8, np.float32), timeout=30)
    dt = time.monotonic() - t0
    svc.close()
    assert fake.batches == [1]
    assert dt < 5.0  # released at the cap, not starved


def test_service_close_with_inflight_request():
    """close() while a request is queued must flush it and join the
    worker promptly (a regression here left the worker stranded in
    wait() after the final-batch take cleared close()'s wakeup —
    close() then hung for its full join timeout)."""
    import time

    tr = _transcriber()
    tr.transcribe_batch([np.zeros(1000, np.float32)])  # warm compile
    svc = TranscriptionService(tr, max_batch=4, max_wait_ms=200)
    results = []
    t = threading.Thread(target=lambda: results.append(
        svc.submit(np.zeros(1000, np.float32))))
    t.start()
    time.sleep(0.05)  # request enqueued, batching window still open
    t0 = time.time()
    svc.close()
    dt = time.time() - t0
    t.join(timeout=30)
    assert results and len(results[0]) == CFG.max_bars  # flushed, served
    assert not svc._worker.is_alive()
    assert dt < 8, f"close() took {dt:.1f}s (worker stranded?)"


def test_corrupt_wav_body_is_a_400(server):
    """A body passing the RIFF magic check but truncated mid-header must
    produce a 400 error JSON, not a connection abort (wave.Error escaped
    the ValueError-only catch before the review fix)."""
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/transcribe", b"RIFF\x00\x00\x00\x00WAVEgarbage")
    assert e.value.code == 400
    assert "bad request body" in json.load(e.value)["error"]


def test_unknown_format_rejected_before_inference(server):
    """A typo'd format 400s up front — without consuming a device batch."""
    before = json.loads(
        urllib.request.urlopen(f"{server}/stats", timeout=30).read())
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/transcribe?format=xml",
              _wav_bytes(np.zeros(1000, np.float32), VCFG.sample_rate))
    assert e.value.code == 400
    assert "unknown format" in json.load(e.value)["error"]
    after = json.loads(
        urllib.request.urlopen(f"{server}/stats", timeout=30).read())
    assert after["requests"] == before["requests"]  # never submitted


def test_timed_out_requests_are_dropped_from_the_queue():
    """Clips whose submitter already received a TimeoutError must not
    consume device batch slots (overload would otherwise become 100%
    dead work)."""
    from piano_a2s_tpu.serve import TranscriptionService

    fake = _FakeTranscriber(device_s=0.3)
    svc = TranscriptionService(fake, max_batch=4, max_wait_ms=5.0)
    try:
        # One long-running batch occupies the worker...
        blocker = threading.Thread(
            target=lambda: svc.submit(np.zeros(8, np.float32), timeout=10))
        blocker.start()
        time.sleep(0.05)
        # ...while two clips time out in the queue behind it.
        for _ in range(2):
            with pytest.raises(TimeoutError):
                svc.submit(np.zeros(8, np.float32), timeout=0.05)
        blocker.join()
        # Let the worker drain whatever it still forms.
        time.sleep(0.6)
        assert sum(fake.batches) == 1  # only the live clip ran
    finally:
        svc.close()
