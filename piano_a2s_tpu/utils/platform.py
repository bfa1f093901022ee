"""Virtual-device platform forcing (test/dryrun infrastructure).

One shared implementation: callers previously each had their own variant
and the subtle bug differed between them (a pre-existing
``--xla_force_host_platform_device_count`` flag must be REPLACED, not
kept, or the requested count is silently not applied; and the axon TPU
plugin ignores the ``JAX_PLATFORMS`` env var, so the platform must also
be forced through ``jax.config``).
"""

from __future__ import annotations

import os


def force_virtual_cpu_devices(n: int) -> None:
    """Make jax expose `n` virtual CPU devices. Must be called before jax
    backend initialization (importing jax is fine; creating arrays or
    calling jax.devices() is not)."""
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
