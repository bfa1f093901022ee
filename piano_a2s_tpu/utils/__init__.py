"""Cross-cutting utilities (reference: utilities.py)."""

from .io import load, mkdirs, save, set_seed  # noqa: F401
from .audio import (  # noqa: F401
    float32_to_int16, int16_to_float32, read_wav, resample, write_wav)
from .sequences import get_sequence_duration  # noqa: F401
