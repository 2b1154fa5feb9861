"""Device placement helpers.

Matrix assembly and other one-time prep involve complex dtypes (complex128 is
unsupported on TPU) and irregular host logic; they run on the CPU backend.
Only the real-valued jitted solver loops run on the accelerator.
"""
import os
from contextlib import contextmanager
from functools import wraps

import jax


def _machine_fingerprint():
    """Short hash of the host CPU model + feature flags.

    XLA:CPU caches AOT-compiled executables specialized to the compile
    machine's ISA extensions; loading them on a host with different features
    (e.g. after a VM migration) triggers "Machine type used for XLA:CPU
    compilation doesn't match ... could lead to execution errors such as
    SIGILL" and has crashed test runs here. Keying the cache directory on the
    fingerprint makes each machine type get its own cache.
    """
    import hashlib
    import platform
    desc = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    desc.append(line.strip())
                    if len(desc) >= 3:
                        break
    except OSError:
        desc.append(platform.processor())
    return hashlib.sha1("|".join(desc).encode()).hexdigest()[:10]


def init_compilation_cache(cache_dir=None, min_compile_secs=0.2):
    """Enable JAX's persistent compilation cache for the library.

    A single cold ``DRT.fit_eis`` costs seconds of XLA compile; the jitted
    outer loop is identical across processes for a given config+shape, so a
    persistent cache makes every process start after the first skip straight
    to execution. Called automatically at package import (default-on);
    set ``HYBDRT_TPU_NO_COMPILE_CACHE=1`` to opt out or
    ``HYBDRT_TPU_COMPILE_CACHE_DIR`` to relocate the cache.

    The default location is keyed by a host-machine fingerprint so cached
    CPU executables are never reused across machines with different ISA
    features (see ``_machine_fingerprint``).

    ``HYBDRT_TPU_COMPILE_CACHE_READONLY=1`` serves cache hits but never
    writes new entries. Writing an entry calls the native
    ``executable.serialize()``, which has segfaulted long-lived processes
    that compiled hundreds of distinct executables (observed in the full
    test suite, jax 0.9 XLA:CPU); jax gates the write on
    ``persistent_cache_min_compile_time_secs`` BEFORE serializing, so an
    unreachable threshold makes the cache read-only and crash-safe.
    """
    if os.environ.get("HYBDRT_TPU_NO_COMPILE_CACHE"):
        return False
    if os.environ.get("HYBDRT_TPU_COMPILE_CACHE_READONLY"):
        min_compile_secs = 1e9
    if cache_dir is None:
        cache_dir = os.environ.get(
            "HYBDRT_TPU_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "hybdrt_tpu",
                         "jax_cache-" + _machine_fingerprint()))
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
