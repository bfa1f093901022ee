"""Regenerate tests/goldens/real_scores.json from the kern fixtures.

Run after an INTENTIONAL parser/tokenizer/target change:
    python tests/fixtures/kern/regen_goldens.py
and commit the diff together with the change that caused it.
"""
import glob
import json
import os
import pickle
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                    "..", "..", ".."))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from piano_a2s_tpu.data.render import (load_time_signatures,  # noqa: E402
                                       split_single_score)
from piano_a2s_tpu.symbolic.vocab import LabelsMultiple  # noqa: E402


def main():
    labels = LabelsMultiple(extended=True)
    ts_list = load_time_signatures()
    root = tempfile.mkdtemp()
    golden = {}
    for path in sorted(glob.glob(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "*.krn"))):
        name = os.path.basename(path).split(".")[0]
        n = split_single_score(path, root, labels, ts_list, split="test",
                               version=0, rng=np.random.RandomState(0))
        assert n >= 1, (name, n)
        with open(os.path.join(root, "test", "0", "target",
                               f"{name}.0.pkl"), "rb") as f:
            target = pickle.load(f)
        golden[name] = [[int(m[0]), str(m[1]), list(map(int, m[2])),
                         list(map(int, m[3]))] for m in target]
    out = os.path.join(REPO, "tests", "goldens", "real_scores.json")
    with open(out, "w") as f:
        json.dump(golden, f, indent=1)
    print("wrote", out, "with", len(golden), "fixtures")


if __name__ == "__main__":
    main()
