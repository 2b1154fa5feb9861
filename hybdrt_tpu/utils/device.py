"""Device placement helpers.

Matrix assembly and other one-time prep involve complex dtypes (complex128 is
unsupported on TPU) and irregular host logic; they run on the CPU backend.
Only the real-valued jitted solver loops run on the accelerator.
"""
import os
from contextlib import contextmanager
from functools import wraps

import jax


def _clamp_cpu_isa():
    """Pin XLA:CPU codegen to a portable ISA level (AVX2) before the first
    backend initialization.

    jaxlib 0.9's cpu_aot_loader compares the persistent cache entry's
    LLVM-derived compile features against a DIFFERENT host-feature detection
    path at load time; LLVM tuning flags (``+prefer-no-gather``,
    ``+prefer-no-scatter``) and AMX bits appear only on the compile side, so
    EVERY cross-process load of a cached CPU executable — even on the very
    machine that compiled it — logs "Machine type used for XLA:CPU
    compilation doesn't match ... could lead to execution errors such as
    SIGILL" (reproduced: compile in one process, reload in a second, same
    host). The check is therefore pure noise for same-host reuse and cannot
    distinguish a real ISA mismatch. Clamping codegen to AVX2 empirically
    yields executables whose feature list is a subset of every host's
    detected set (zero warnings on reload) and — the real point — makes
    cached executables genuinely safe to run on any AVX2-capable host, so a
    VM migration can no longer turn a stale cache entry into a SIGILL.
    Measured cost on the f64 fit loop: none (within run-to-run noise;
    results differ at the last ulp only).

    Honors a pre-existing ``xla_cpu_max_isa`` in XLA_FLAGS. Returns the
    effective max_isa string ("" when the flag could not be applied because
    an XLA backend already exists in this process — the fingerprint then
    keys the cache on the unclamped host)."""
    import re
    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(r"--xla_cpu_max_isa=(\S+)", flags)
    if m:
        return m.group(1)
    try:
        from jax._src import xla_bridge as _xb
        if _xb._backends:
            # Too late: flags were already parsed at backend creation
            return ""
    except Exception:
        pass  # private API moved: assume early import (the common case)
    os.environ["XLA_FLAGS"] = (flags + " --xla_cpu_max_isa=AVX2").strip()
    return "AVX2"


def _machine_fingerprint(isa_clamp=""):
    """Short hash identifying the executable-compatibility domain.

    XLA:CPU caches AOT-compiled executables specialized to the compile
    machine; serving them to a host with different ISA features (e.g. after
    a VM migration) risks SIGILL. Keying the cache directory on this
    fingerprint makes each compatibility domain get its own cache. Inputs:

    * the FULL /proc/cpuinfo identity of cpu 0 (vendor/family/model/
      stepping/microcode/model name/flags) — LLVM derives tuning features
      (e.g. ``prefer-no-gather``) from the exact CPUID, not just the flag
      list, so hashing only model+flags (the round-3 scheme) let two hosts
      with different steppings share a cache;
    * the jaxlib version (different bundled LLVM → different codegen);
    * the effective ``xla_cpu_max_isa`` clamp (see _clamp_cpu_isa) — a
      clamped and an unclamped process must never share entries.
    """
    import hashlib
    import platform
    desc = [platform.machine(), _jaxlib_version(), f"max_isa={isa_clamp}"]
    keys = ("vendor_id", "cpu family", "model", "stepping", "microcode",
            "model name", "flags")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # end of cpu 0's block
                if line.split(":")[0].strip() in keys:
                    desc.append(line.strip())
    except OSError:
        desc.append(platform.processor())
    return hashlib.sha1("|".join(desc).encode()).hexdigest()[:10]


def _jaxlib_version():
    try:
        import jaxlib
        return f"jaxlib-{jaxlib.__version__}"
    except Exception:
        return f"jax-{jax.__version__}"


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
    isa_clamp = _clamp_cpu_isa()
    if cache_dir is None:
        cache_dir = os.environ.get(
            "HYBDRT_TPU_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "hybdrt_tpu",
                         "jax_cache-" + _machine_fingerprint(isa_clamp)))
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
