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
# The suite compiles hundreds of distinct executables in one process, and
# in that state jaxlib's persistent-cache native serialize (full-suite crash
# during tutorial 05's cache write) AND deserialize (crash during tutorial
# 03's cache read, with read-only mode on) have both segfaulted (jax 0.9
# XLA:CPU). The suite starts once, so persistent-cache hits save almost
# nothing here (in-process jit caching covers repeats): disable it outright.
# The default-on cache path is still exercised by the tutorial subprocesses
# (tests/test_tutorials.py) and test_multi_misc's unit tests.
# Must be set before hybdrt_tpu is imported.
os.environ.setdefault("HYBDRT_TPU_NO_COMPILE_CACHE", "1")

import jax

# Restrict backend discovery to CPU in-process as well: with jax pre-imported
# the JAX_PLATFORMS env var above is ignored, and the first jax.devices()
# call would otherwise initialize the experimental axon TPU tunnel too —
# which, in its degraded windows, hangs backend init for tens of minutes
# before the suite runs a single test.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

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

import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Drop jit caches after each test module.

    The suite compiles hundreds of distinct XLA:CPU executables in one
    process; with all of them held live, jaxlib 0.9's compiler eventually
    segfaults inside backend_compile_and_load near the end of the run
    (reproducible at ~85% of the suite; the same test passes in isolation).
    Executables are rarely shared across modules (different shapes/configs),
    so per-module clearing costs little and keeps the native footprint
    bounded. In-module caching behavior (and the tests that assert it) is
    unaffected."""
    yield
    jax.clear_caches()
    gc.collect()
