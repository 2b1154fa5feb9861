"""Device placement helpers.

Matrix assembly and other one-time prep involve complex dtypes (complex128 is
unsupported on TPU) and irregular host logic; they run on the CPU backend.
Only the real-valued jitted solver loops run on the accelerator.
"""
import os
from contextlib import contextmanager
from functools import wraps

import jax


def init_compilation_cache(cache_dir=None, min_compile_secs=0.2):
    """Enable JAX's persistent compilation cache for the library.

    A single cold ``DRT.fit_eis`` costs seconds of XLA compile; the jitted
    outer loop is identical across processes for a given config+shape, so a
    persistent cache makes every process start after the first skip straight
    to execution. Called automatically at package import (default-on);
    set ``HYBDRT_TPU_NO_COMPILE_CACHE=1`` to opt out or
    ``HYBDRT_TPU_COMPILE_CACHE_DIR`` to relocate the cache.
    """
    if os.environ.get("HYBDRT_TPU_NO_COMPILE_CACHE"):
        return False
    if cache_dir is None:
        cache_dir = os.environ.get(
            "HYBDRT_TPU_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "hybdrt_tpu", "jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:
        return False
    return True


def cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return jax.devices()[0]


@contextmanager
def host_cpu():
    """Context: place newly created jnp arrays/computations on the host CPU."""
    with jax.default_device(cpu_device()):
        yield


def on_host(fn):
    """Decorator: run fn with CPU as the default jax device."""
    @wraps(fn)
    def wrapped(*args, **kwargs):
        with host_cpu():
            return fn(*args, **kwargs)
    return wrapped
