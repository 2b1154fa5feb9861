"""Regression guard for the windowed-resolve program size.

Round-4 finding: the dense all-windows resolve program (each window's
(w*nc)^2 kron matrix run through the dense interior-point solver) produced
~2.5 MB of MLIR at production shapes (~100 windows of 7 x 95-param
observations) and reliably OOM-killed the axon remote-compile helper, so
resolve_group(batched=True) could never run on the tunneled chip and fell
back to ~100x-slower per-window solves (the drtmd.py warning path).

The matrix-free rewrite (resolve.solve_resolve_batch -> vmapped coupled
IP-PCG core) keeps each window in block form; its program must stay far
below the measured failure size AT BENCH SHAPES so the fallback never
triggers there. Lowering is client-side and cheap — no compile, no chip.
"""
import numpy as np
import jax
import jax.numpy as jnp

from hybdrt_tpu.mapping import resolve as resolve_mod

# The two observed axon compile-helper SIGKILLs both had code_len within
# 26 bytes of the dense window-resolve program's ~2.5 MB serialization
# (experiments/README.md round-4 notes). Demand an order of magnitude of
# headroom below that.
DENSE_FAILURE_BYTES = 2_500_000
CEILING_BYTES = DENSE_FAILURE_BYTES // 10


def _bench_like_window_batch(n_windows=147, w=7, nc=120):
    """Shapes matching the 1024-obs bench het leg: batch_size=7, overlap=2
    -> ~(1024-7)/5 + 1 windows; nc ~ tau window + special params."""
    rng = np.random.default_rng(0)
    a = rng.normal(size=(w, nc + 3, nc))
    p = np.einsum("wij,wik->wjk", a, a) / nc + np.eye(nc)
    p_b = np.broadcast_to(p, (n_windows, w, nc, nc))
    q_b = np.broadcast_to(rng.normal(size=(w, nc)), (n_windows, w, nc))
    lb_b = np.zeros((n_windows, w, nc))
    my = np.eye(w) * 0.1
    my_b = np.broadcast_to(my, (n_windows, w, w))
    c_b = np.broadcast_to(np.eye(nc), (n_windows, nc, nc))
    return tuple(jnp.asarray(x, dtype=jnp.float32)
                 for x in (p_b, q_b, lb_b, my_b, c_b))


def test_windowed_resolve_program_under_axon_ceiling():
    args = _bench_like_window_batch()
    lowered = jax.jit(resolve_mod._coupled_batch_core).lower(
        *args, jnp.asarray(1e-12, jnp.float32), jnp.asarray(1e-10, jnp.float32),
        jnp.asarray(60, jnp.int32), jnp.asarray(200, jnp.int32))
    code = lowered.as_text()
    size = len(code.encode())
    assert size < CEILING_BYTES, (
        f"windowed resolve program is {size} bytes at bench shapes; "
        f"the axon compile helper OOM-killed at ~{DENSE_FAILURE_BYTES}")


def test_program_size_independent_of_window_count():
    """The vmapped program's code size must not grow with the number of
    windows (only shapes change), so larger maps cannot regress past the
    ceiling."""
    small = _bench_like_window_batch(n_windows=4)
    large = _bench_like_window_batch(n_windows=256)
    tols = (jnp.asarray(1e-12, jnp.float32), jnp.asarray(1e-10, jnp.float32),
            jnp.asarray(60, jnp.int32), jnp.asarray(200, jnp.int32))
    size_small = len(jax.jit(resolve_mod._coupled_batch_core)
                     .lower(*small, *tols).as_text())
    size_large = len(jax.jit(resolve_mod._coupled_batch_core)
                     .lower(*large, *tols).as_text())
    assert size_large < size_small * 1.1
