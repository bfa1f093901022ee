"""Symbolic-music core: vocabularies, Kern/Humdrum parsing, score export.

Host-side, pure Python (with optional native C++ acceleration for the
humextra-equivalent tools). Mirrors the capability of the reference's
``data_processing/humdrum.py`` (see /root/reference/data_processing/humdrum.py).
"""

from .vocab import Labels, LabelsMultiple, LabelsSingle  # noqa: F401
