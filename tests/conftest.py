"""Test configuration.

All tests run on the CPU backend with 8 virtual XLA devices so that
multi-device (sharded) execution paths are exercised without TPU
hardware, mirroring the reference's serial-vs-parallel consistency
strategy (see SURVEY.md section 4).

Note: in this environment ``jax`` is pre-imported at interpreter
startup (the hardware tunnel registers itself as the ``axon``
platform), so environment variables alone are too late — the platform
must be forced through ``jax.config`` before any backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
