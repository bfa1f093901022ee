"""Bench drift-canary pairing (bench.py _Canary).

Round-4 regression: configs_normalized divided every serving number by
whatever canary sample was globally nearest one shared post-sweep
timestamp; a tunnel dip there inflated the whole family ~3.1x. The fix
pairs each config with the canary INTERPOLATED at its own best-round
timestamp and flags measurements whose bracketing samples disagree.
These tests pin that logic (pure host arithmetic — no TPU, no jax)."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_module"] = mod
    spec.loader.exec_module(mod)
    return mod


def _canary(samples):
    bench = _load_bench()
    c = bench._Canary.__new__(bench._Canary)
    c.variant = None
    c.samples = list(samples)
    return c


def test_at_interpolates_between_brackets():
    c = _canary([(0.0, 50.0), (10.0, 60.0), (20.0, 40.0)])
    assert c.at(5.0) == 55.0
    assert c.at(15.0) == 50.0
    assert c.at(0.0) == 50.0
    # clamped outside the sampled range
    assert c.at(-5.0) == 50.0
    assert c.at(99.0) == 40.0


def test_dip_elsewhere_does_not_leak():
    """A dip AFTER a config's measurement must not touch its factor —
    the exact r04 failure (nearest-sample pairing picked the dip)."""
    c = _canary([(0.0, 52.0), (10.0, 52.0), (60.0, 17.0), (70.0, 50.0)])
    # measurement at t=5 sits between two healthy samples
    assert abs(c.at(5.0) - 52.0) < 1e-9
    assert c.dip_flag(5.0) is None
    # a measurement INSIDE the dip window is flagged
    assert c.dip_flag(65.0) is not None


def test_bracket_boundary_reuses_nearest():
    c = _canary([(0.0, 50.0), (10.0, 60.0)])
    assert c.bracket(0.0) == (50.0, 50.0)
    assert c.bracket(10.0) == (60.0, 60.0)
    before, after = c.bracket(4.0)
    assert (before, after) == (50.0, 60.0)


def test_record_keeps_samples_sorted():
    c = _canary([(10.0, 60.0)])
    c.record(5.0, 50.0)
    c.record(20.0, 40.0)
    assert [t for t, _ in c.samples] == [5.0, 10.0, 20.0]
    assert c.median() == 50.0


def test_serving_interleaved_returns_timestamps(monkeypatch):
    """measure_serving_interleaved stamps each config's BEST round (not a
    shared sweep-end time) and feeds the canary config's rounds into the
    canary sample list."""
    bench = _load_bench()

    class FakeVariant:
        def __init__(self, vals):
            self.vals = list(vals)

        def timed_loop(self):
            return bench.BATCH / self.vals.pop(0)

    built = {
        "canary_cfg": FakeVariant([50.0, 20.0, 52.0]),   # dip in round 2
        "other": FakeVariant([30.0, 31.0, 29.0]),        # best in round 2
    }
    canary = _canary([])
    out = bench.measure_serving_interleaved(
        {k: {} for k in built}, rounds=3, built=built, canary=canary,
        canary_name="canary_cfg")
    assert out["canary_cfg"][0] == 52.0
    assert out["other"][0] == 31.0
    # every canary_cfg round became a drift sample
    assert [v for _, v in canary.samples] == [50.0, 20.0, 52.0]
    # and the configs' timestamps differ (per-config, not shared)
    assert out["canary_cfg"][1] != out["other"][1]
