"""Device placement helpers.

Matrix assembly and other one-time prep involve complex dtypes (complex128 is
unsupported on TPU) and irregular host logic; they run on the CPU backend.
Only the real-valued jitted solver loops run on the accelerator.
"""
from contextlib import contextmanager
from functools import wraps

import jax


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
