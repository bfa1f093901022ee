#!/usr/bin/env python3
"""Transcribe piano audio to score files: python transcribe.py input.wav [more.wav ...] (thin launcher; implementation: piano_a2s_tpu.cli.transcribe)."""

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from piano_a2s_tpu.cli.transcribe import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
