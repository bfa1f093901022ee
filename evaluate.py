#!/usr/bin/env python3
"""Offline evaluation (MV2H + MUSTER + WER/F1): python evaluate.py [configs/finetune.yaml] (thin launcher; implementation: piano_a2s_tpu.cli.evaluate)."""

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from piano_a2s_tpu.cli.evaluate import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
