#!/usr/bin/env python3
"""Finetune on real recordings (ASAP): python finetune.py configs/finetune.yaml [key=value ...] (thin launcher; implementation: piano_a2s_tpu.cli.finetune)."""

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from piano_a2s_tpu.cli.finetune import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
