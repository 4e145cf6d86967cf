"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count``); the real-TPU path is exercised
by ``bench.py`` and ``__graft_entry__.py`` on hardware.

Note: this environment's sitecustomize force-selects the axon TPU platform,
so the CPU override must happen via jax.config after import, not env vars.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# TABMAT_TPU_TEST_TPU=1 runs the suite against the real chip (used to
# exercise tests/test_tpu_kernels.py on hardware; CI stays on CPU)
if os.environ.get("TABMAT_TPU_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
