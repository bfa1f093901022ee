"""Test configuration.

Tests run on a virtual 8-device CPU platform so the multi-chip sharding path
is exercised without TPU hardware (the standard JAX recipe:
``--xla_force_host_platform_device_count``). The axon TPU plugin ignores
JAX_PLATFORMS, so the platform is forced via jax.config here, before any
test imports jax transitively.
"""

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from piano_a2s_tpu.utils.platform import force_virtual_cpu_devices  # noqa: E402

force_virtual_cpu_devices(8)

import jax  # noqa: E402

# Persistent compilation cache (CPU compiles too): cuts repeat suite runs
# substantially. Must go through jax.config — the env var alone is ignored
# (see piano_a2s_tpu/utils/cache.py).
from piano_a2s_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(os.path.join(REPO_ROOT, ".jax_cache"))


def reference_modules():
    """Import the PyTorch reference (read-only, for parity goldens).

    The reference imports music21 at module scope but never needs it for the
    model/tokenizer paths we test against; stub it if absent.
    """
    import types
    if "music21" not in sys.modules:
        try:
            import music21  # noqa: F401
        except ImportError:
            sys.modules["music21"] = types.ModuleType("music21")
    ref = "/root/reference"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    import models as ref_models  # noqa
    from data_processing import humdrum as ref_humdrum  # noqa
    return ref_models, ref_humdrum
