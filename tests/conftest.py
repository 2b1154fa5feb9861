"""Test configuration: run everything on a virtual multi-device CPU backend.

Note: in some harnesses jax is pre-imported at interpreter startup, so
JAX_PLATFORMS / XLA_FLAGS env vars cannot be relied on; we configure through
jax.config before any backend-initializing call instead.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
try:
    cpu0 = jax.devices("cpu")[0]
    jax.config.update("jax_default_device", cpu0)
except Exception:
    pass
