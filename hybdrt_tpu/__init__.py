"""hybdrt_tpu — TPU-native probabilistic DRT/DOP analysis framework.

A from-scratch JAX/XLA re-design of the capabilities of ``jdhuang-csm/hybrid-drt``
(reference layout: ``hybdrt/``): self-tuning hierarchical-Bayesian DRT inversion
(QPHB), distribution-of-phasances (DOP), joint time/frequency-domain ("hybrid")
fits, probabilistic analysis (PFRT, credible intervals), dual inversion with
discrete equivalent-circuit model generation, and multi-dimensional DRT mapping.

Design stance (not a port):
  * the numerical core is a set of pure functions over pytrees, jitted end-to-end
    (``hybdrt_tpu.solver.fitcore``), with the inequality-constrained QP solved by
    a JAX-native primal-dual interior-point method (``hybdrt_tpu.ops.qp``)
    instead of the reference's cvxopt C solver;
  * matrix assembly (impedance/response/penalty/variance matrices) is vectorized
    jnp code (``hybdrt_tpu.ops``), replacing the reference's python loops over
    scipy quadrature (reference: hybdrt/matrices/mat1d.py);
  * batch scale-out over thousands of spectra uses ``vmap`` + ``shard_map`` over a
    ``jax.sharding.Mesh`` (``hybdrt_tpu.parallel``) instead of the reference's
    serial python loop (reference: hybdrt/mapping/drtmd.py:303).

Float64 is enabled globally for numerical parity with the CPU reference; the
performance paths accept ``dtype`` arguments to run in float32 on TPU.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)
# On TPU, float32 matmuls default to bf16 MXU passes (~1e-3 relative error),
# which corrupts the ill-conditioned QP normal matrices this framework
# builds; force true float32 matmul accumulation everywhere
_jax.config.update("jax_default_matmul_precision", "float32")

from . import utils  # noqa: E402
from .utils import device as _device  # noqa: E402

# Default-on persistent compilation cache: a first-session fit costs seconds
# of XLA compile; subsequent process starts reuse it (opt out with
# HYBDRT_TPU_NO_COMPILE_CACHE=1)
_device.init_compilation_cache()

from . import ops  # noqa: E402

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports to keep `import hybdrt_tpu` light.
    if name == "DRT":
        from .models.drt import DRT
        return DRT
    if name == "DRTMD":
        from .mapping.drtmd import DRTMD
        return DRTMD
    if name in ("models", "solver", "parallel", "mapping", "preprocessing", "dataload",
                "filters", "plotting", "evaluation", "peaks", "fileload", "fourier"):
        import importlib
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module 'hybdrt_tpu' has no attribute {name!r}")
