"""bench.measure_train_fit smoke: the end-to-end Trainer.fit bench config
runs (fixture generation, fit, epoch_time parsing) at toy sizes on CPU."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_measure_train_fit_small():
    import bench
    clips_per_sec = bench.measure_train_fit(
        epochs=2, n_train=4, batch_size=2, accum_steps=2,
        exp_kwargs=dict(max_length=(8, 6), max_duration=1,
                        frames_per_second=23, bins_per_octave=4,
                        n_octaves=4, conv_feature_size=16, hidden_size=16,
                        note_emb_size=8, staff_emb_size=8),
        spec_shape=(22, 16))
    assert clips_per_sec > 0


def test_canary_normalization_logic(tmp_path, monkeypatch):
    """_Canary interpolated lookup + cross-round ref pinning.
    (Bracketing/dip-flag details live in tests/test_bench_canary.py.)"""
    import json

    import bench

    class FakeVariant:
        def __init__(self, rates):
            self.rates = list(rates)

        def timed_loop(self):
            return bench.BATCH / self.rates.pop(0)

    c = bench._Canary(FakeVariant([80.0, 60.0, 40.0]))
    t0 = c.sample() and c.samples[0][0]
    c.samples[:] = [(0.0, 80.0), (10.0, 60.0), (20.0, 40.0)]
    assert c.at(0.0) == 80.0
    assert c.at(5.0) == 70.0     # linear between brackets
    assert c.at(100.0) == 40.0   # clamped outside the range
    assert c.median() == 60.0
    del t0

    monkeypatch.setattr(bench, "BASELINE_CACHE",
                        str(tmp_path / "baseline.json"))
    # First run pins the ref; later runs read it back unchanged.
    assert bench.get_canary_ref(60.0) == 60.0
    assert bench.get_canary_ref(90.0) == 60.0
    data = json.load(open(tmp_path / "baseline.json"))
    assert data["canary_ref_clips_per_sec"] == 60.0
    # Normalization: raw * ref / contemporaneous canary.
    raw, contemporaneous = 50.0, 40.0
    assert raw * 60.0 / contemporaneous == 75.0
