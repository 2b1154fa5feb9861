"""Shared helpers for the hybdrt_tpu tutorials.

Every tutorial is self-contained and runnable end-to-end: data is simulated
in the script (no external files needed), figures are written to
examples/output/, and setting the environment variable HYBDRT_TPU_QUICK=1
shrinks problem sizes so the whole suite runs quickly (this is how the test
suite executes them).
"""
import os
import sys

# Make the repo importable when running a tutorial directly from its folder
_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                          os.pardir, os.pardir))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

QUICK = os.environ.get("HYBDRT_TPU_QUICK", "0") == "1"
OUTPUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          os.pardir, "output")


def use_cpu_f64():
    """Tutorials run on the CPU backend in float64 — the accuracy
    configuration. See tutorial 6 for the TPU float32 performance path."""
    import jax
    # CPU-only: restrict backend discovery BEFORE the first jax.devices()
    # call. Without this, discovery also initializes the experimental TPU
    # tunnel backend, whose degraded windows hang init for tens of minutes
    # (JAX_PLATFORMS env is ignored when jax is pre-imported at startup).
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    jax.config.update("jax_enable_x64", True)
    try:
        # Virtual devices for the sharding demos (no-op if the backend is
        # already initialized, e.g. when jax was imported before this)
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except RuntimeError:
        pass


def savefig(fig, name):
    os.makedirs(OUTPUT_DIR, exist_ok=True)
    path = os.path.join(OUTPUT_DIR, name)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    print(f"  saved {os.path.relpath(path)}")


def zarc(freq, r, tau0, alpha=0.9):
    """ZARC element: the workhorse synthetic relaxation, an exact test
    oracle with known Rp = r and peak at tau0."""
    return r / (1 + (2j * np.pi * freq * tau0) ** alpha)


def add_noise(z, sigma, seed=0):
    rng = np.random.default_rng(seed)
    return z + rng.normal(0, sigma, len(z)) + 1j * rng.normal(0, sigma, len(z))
