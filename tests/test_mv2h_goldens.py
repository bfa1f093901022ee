"""MV2H golden worked examples — externally-anchored scorer pins.

tests/goldens/mv2h_worked/ holds pairs of intermediate-format files whose
five component scores are derived BY HAND from the metric's published
definitions (derivations in that folder's README.md). The native engine
must reproduce every number exactly — converting its trust basis from
self-consistent algebra to independently hand-checked arithmetic.

When java + the MV2H classpath are available (ADVICE r4: optional
cross-engine check), the canonical Java tool runs on the SAME files and
must agree too; that test auto-skips on java-free hosts like this image.
"""

import json
import os
import shutil
import subprocess

import numpy as np
import pytest

from piano_a2s_tpu.train.mv2h import evaluate_mv2h, parse_score

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens",
                          "mv2h_worked")
with open(os.path.join(GOLDEN_DIR, "expected.json")) as f:
    EXPECTED = json.load(f)
CASES = sorted(EXPECTED)


def _load_pair(case):
    with open(os.path.join(GOLDEN_DIR, f"{case}_gt.txt")) as f:
        gt = parse_score(f.read())
    with open(os.path.join(GOLDEN_DIR, f"{case}_tr.txt")) as f:
        tr = parse_score(f.read())
    return gt, tr


@pytest.mark.parametrize("case", CASES)
def test_native_reproduces_hand_derived_scores(case):
    gt, tr = _load_pair(case)
    result = evaluate_mv2h(gt, tr, align=True)
    for key, want in EXPECTED[case].items():
        np.testing.assert_allclose(
            result[key], want, atol=1e-12,
            err_msg=f"{case} {key}: derivation in "
                    f"{GOLDEN_DIR}/README.md")


def _mv2h_classpath():
    for cand in (os.environ.get("MV2H_BIN", ""), "/opt/MV2H/bin",
                 "./MV2H/bin"):
        if cand and os.path.exists(cand):
            return cand
    return None


@pytest.mark.skipif(not (shutil.which("java") and _mv2h_classpath()),
                    reason="java + MV2H classpath not on this host")
@pytest.mark.parametrize("case", CASES)
def test_java_tool_agrees_on_goldens(case):
    """Cross-engine anchor: the canonical Java tool on the same files."""
    cp = _mv2h_classpath()
    out = subprocess.check_output(
        ["java", "-cp", cp, "mv2h.Main",
         "-g", os.path.join(GOLDEN_DIR, f"{case}_gt.txt"),
         "-t", os.path.join(GOLDEN_DIR, f"{case}_tr.txt"), "-a"],
        timeout=30).decode()
    scores = {}
    for line in out.splitlines()[-6:]:
        k, _, v = line.partition(": ")
        scores[k] = float(v)
    for key, want in EXPECTED[case].items():
        np.testing.assert_allclose(scores[key], want, atol=1e-6,
                                   err_msg=f"java {case} {key}")
