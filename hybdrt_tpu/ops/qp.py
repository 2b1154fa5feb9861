"""JAX-native bound-constrained quadratic programming.

Replaces the reference's cvxopt C solver (reference hybdrt/models/qphb.py:426,
solve_convex_opt: min 1/2 x^T P x + q^T x s.t. G x <= h with G = -I), i.e. a
lower-bounded QP:

    min_x  1/2 x^T P x + q^T x    s.t.  x >= lb

Solved with a Mehrotra predictor-corrector primal-dual interior-point method
followed by an active-set "polish" step that lands on the exact KKT point.
Everything is jit- and vmap-compatible: the per-iteration work is one Cholesky
factorization of (P + diag(z/s)) plus two triangular solves, which XLA maps
efficiently onto the MXU, and a batch of QPs (one per spectrum) runs as a
single batched factorization under vmap/shard_map.

General linear inequalities (G x <= h), needed for the optional curvature
constraint (reference drt1d.py:896-911), are supported by solve_qp.
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


class QPResult(NamedTuple):
    x: jnp.ndarray        # primal solution
    z: jnp.ndarray        # dual for bound constraints
    s: jnp.ndarray        # slacks x - lb
    gap: jnp.ndarray      # final complementarity gap s.z
    iterations: jnp.ndarray
    primal_objective: jnp.ndarray


# ---------------------------------------------------------------------------
# SPD factor/solve primitives with a TPU batched fast path.
#
# The solver below is written per-problem and vmapped by callers (one QP per
# spectrum). XLA's batched Cholesky at this size (n ~ 100, batch ~ 1000) is
# ~6x off what the hardware can do; custom_vmap dispatches the BATCHED case
# to the pallas batch-as-lane kernels (ops/pallas_chol_lane.py) on TPU-class
# backends in float32, while the unbatched case (single CPU float64 fits, the
# golden-parity path) keeps LAPACK semantics exactly.
# ---------------------------------------------------------------------------
from jax import custom_batching


def _use_lane_kernel(dtype):
    if dtype != jnp.float32 or jax.default_backend() == "cpu":
        return False
    # A CPU default device (e.g. the test harness pinning work to a virtual
    # CPU mesh while a TPU backend exists in the process) must not dispatch
    # the TPU kernel
    dd = jax.config.jax_default_device
    return dd is None or getattr(dd, "platform", None) != "cpu"


@custom_batching.custom_vmap
def spd_factor(a):
    """Lower Cholesky factor of one SPD matrix."""
    return jnp.linalg.cholesky(a)


@spd_factor.def_vmap
def _spd_factor_vmap(axis_size, in_batched, a):
    if not in_batched[0]:
        a = jnp.broadcast_to(a, (axis_size, *a.shape))
    return jnp.linalg.cholesky(a), True


@custom_batching.custom_vmap
def spd_solve_factored(l, b):
    """Solve (L L^T) x = b given the factor from spd_factor."""
    return jsl.cho_solve((l, True), b)


@spd_solve_factored.def_vmap
def _spd_solve_factored_vmap(axis_size, in_batched, l, b):
    if not in_batched[0]:
        l = jnp.broadcast_to(l, (axis_size, *l.shape))
    if not in_batched[1]:
        b = jnp.broadcast_to(b, (axis_size, *b.shape))
    if _use_lane_kernel(l.dtype):
        from .pallas_chol_lane import chol_solve_factored_lane
        return chol_solve_factored_lane(l, b), True
    y = jsl.solve_triangular(l, b[..., None], lower=True)
    x = jsl.solve_triangular(jnp.transpose(l, (0, 2, 1)), y, lower=False)
    return x[..., 0], True


@custom_batching.custom_vmap
def spd_factor_solve(a, b):
    """(x, l) = (a^-1 b, chol(a)): factor once, return the factor for reuse
    (the Mehrotra corrector solves against the predictor's factorization).
    Batched float32 on TPU dispatches to the fused pallas kernel."""
    l = jnp.linalg.cholesky(a)
    return jsl.cho_solve((l, True), b), l


@spd_factor_solve.def_vmap
def _spd_factor_solve_vmap(axis_size, in_batched, a, b):
    if not in_batched[0]:
        a = jnp.broadcast_to(a, (axis_size, *a.shape))
    if not in_batched[1]:
        b = jnp.broadcast_to(b, (axis_size, *b.shape))
    if _use_lane_kernel(a.dtype):
        from .pallas_chol_lane import chol_factor_solve_lane
        x, l = chol_factor_solve_lane(a, b)
        return (x, l), (True, True)
    l = jnp.linalg.cholesky(a)
    y = jsl.solve_triangular(l, b[..., None], lower=True)
    x = jsl.solve_triangular(jnp.transpose(l, (0, 2, 1)), y, lower=False)[..., 0]
    return (x, l), (True, True)


@custom_batching.custom_vmap
def spd_solve(a, b):
    """x = a^-1 b for one SPD matrix. Batched on a TPU-class backend in
    float32, this dispatches to the fused batch-as-lane pallas kernel
    (factor + both substitutions without leaving VMEM): ~6x faster than
    XLA's batched Cholesky at this framework's sizes. (The factor/solve
    split kernels hit the 16M scoped-VMEM ceiling at n ~ 93; the fused
    kernel fits, so re-factoring per solve is still the fastest option.)"""
    return jsl.cho_solve((jnp.linalg.cholesky(a), True), b)


@spd_solve.def_vmap
def _spd_solve_vmap(axis_size, in_batched, a, b):
    if not in_batched[0]:
        a = jnp.broadcast_to(a, (axis_size, *a.shape))
    if not in_batched[1]:
        b = jnp.broadcast_to(b, (axis_size, *b.shape))
    if _use_lane_kernel(a.dtype):
        from .pallas_chol_lane import chol_solve_lane
        return chol_solve_lane(a, b), True
    l = jnp.linalg.cholesky(a)
    y = jsl.solve_triangular(l, b[..., None], lower=True)
    x = jsl.solve_triangular(jnp.transpose(l, (0, 2, 1)), y, lower=False)
    return x[..., 0], True


def _max_step(v, dv):
    """Largest alpha in (0, 1] with v + alpha dv >= 0."""
    ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
    return jnp.minimum(1.0, jnp.min(ratio))


# ---------------------------------------------------------------------------
# Fused fixed-count Mehrotra steps. The warm-started QP solves inside the
# QPHB outer loop run a small capped number of steps (qp_max_iter_warm);
# running them as ONE pallas kernel per 128-lane block keeps P resident in
# VMEM across all steps instead of materializing H and L to HBM every step
# (ops/pallas_ip_lane.py). custom_vmap keeps the unbatched/CPU path on the
# plain jnp loop below (identical math).
# ---------------------------------------------------------------------------
def _ip_steps_single(P, q, lb, x, s, z, n_steps):
    n = q.shape[0]

    def body(_, carry):
        x, s, z, done = carry
        d = z / s
        r_d = P @ x + q - z
        r_p = s - (x - lb)
        mu = jnp.dot(s, z) / n
        H = P + jnp.diag(d)
        rhs_aff = -r_d - z + d * r_p
        dx_aff, l_f = spd_factor_solve(H, rhs_aff)
        ds_aff = dx_aff - r_p
        dz_aff = -z - d * ds_aff
        a_p = _max_step(s, ds_aff)
        a_d = _max_step(z, dz_aff)
        mu_aff = jnp.dot(s + a_p * ds_aff, z + a_d * dz_aff) / n
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)
        r_c = s * z + ds_aff * dz_aff - sigma * mu
        dx = spd_solve_factored(l_f, -r_d - r_c / s + d * r_p)
        ds = dx - r_p
        dz = -r_c / s - d * ds
        a_p = jnp.minimum(1.0, 0.99 * _max_step(s, ds))
        a_d = jnp.minimum(1.0, 0.99 * _max_step(z, dz))
        x_new = x + a_p * dx
        tiny = jnp.asarray(1e-30 if q.dtype == jnp.float64 else 1e-25, q.dtype)
        s_new = jnp.maximum(s + a_p * ds, tiny)
        z_new = jnp.maximum(z + a_d * dz, tiny)
        bad = ~(jnp.all(jnp.isfinite(x_new)) & jnp.all(jnp.isfinite(z_new)))
        frozen = done | bad
        return (jnp.where(frozen, x, x_new), jnp.where(frozen, s, s_new),
                jnp.where(frozen, z, z_new), frozen)

    x, s, z, _ = jax.lax.fori_loop(0, n_steps, body,
                                   (x, s, z, jnp.array(False)))
    return x, s, z


_IP_STEPS_CACHE = {}


def _get_ip_steps(n_steps):
    fn = _IP_STEPS_CACHE.get(n_steps)
    if fn is not None:
        return fn

    @custom_batching.custom_vmap
    def ip_steps(P, q, lb, x, s, z):
        return _ip_steps_single(P, q, lb, x, s, z, n_steps)

    @ip_steps.def_vmap
    def _ip_steps_vmap(axis_size, in_batched, P, q, lb, x, s, z):
        args = []
        for a, batched in zip((P, q, lb, x, s, z), in_batched):
            if not batched:
                a = jnp.broadcast_to(a, (axis_size, *a.shape))
            args.append(a)
        if _use_lane_kernel(args[0].dtype):
            from .pallas_ip_lane import ip_steps_lane
            out = ip_steps_lane(*args, n_steps=n_steps)
        else:
            out = jax.vmap(lambda *a: _ip_steps_single(*a, n_steps))(*args)
        return out, (True, True, True)

    _IP_STEPS_CACHE[n_steps] = ip_steps
    return ip_steps


@partial(jax.jit, static_argnames=("polish", "fused_steps"))
def solve_qp_box(P, q, lb, tol_gap=1e-12, tol_feas=1e-10, max_iter=60, polish=True,
                 x_init=None, z_init=None, fused_steps=None):
    """Solve min 1/2 x'Px + q'x s.t. x >= lb. P must be symmetric PD.

    The problem is Jacobi-equilibrated (x = D x~ with D = diag(P)^-1/2) before
    solving: an exact reparameterization that removes scaling-induced
    ill-conditioning, which matters for float32 execution on TPU where the
    overfit weight-initialization QP has cond(P) ~ 1e7.

    x_init/z_init warm-start the interior point (e.g. from the previous QPHB
    outer iteration); the converged optimum is unaffected, only the iteration
    count.

    fused_steps (static int): run exactly that many Mehrotra steps with no
    convergence check, dispatching batched float32 TPU calls to the fused
    pallas loop kernel (P stays VMEM-resident across steps). Intended for
    warm-started solves whose step count is already capped; the active-set
    polish restores exactness afterwards as usual.
    """
    d_eq = 1.0 / jnp.sqrt(jnp.clip(jnp.diagonal(P), 1e-300, None))
    P_orig, q_orig, lb_orig = P, q, lb
    P = P * d_eq[:, None] * d_eq[None, :]
    q = q * d_eq
    lb = lb / d_eq
    if x_init is not None:
        x_init = x_init / d_eq
    if z_init is not None:
        z_init = z_init * d_eq

    res = _solve_qp_box_core(P, q, lb, tol_gap, tol_feas, max_iter, polish,
                             x_init=x_init, z_init=z_init,
                             fused_steps=fused_steps)
    x = res.x * d_eq
    z = res.z / d_eq
    s = x - lb_orig
    obj = 0.5 * jnp.dot(x, P_orig @ x) + jnp.dot(q_orig, x)
    return QPResult(x=x, z=z, s=s, gap=jnp.dot(jnp.maximum(s, 0), z),
                    iterations=res.iterations, primal_objective=obj)


def _solve_qp_box_core(P, q, lb, tol_gap=1e-12, tol_feas=1e-10, max_iter=60, polish=True,
                       x_init=None, z_init=None, fused_steps=None):
    n = q.shape[0]
    dtype = q.dtype
    # Precision-aware tolerances: float32 cannot reach 1e-12 relative gap
    eps = jnp.finfo(dtype).eps
    tol_gap = jnp.maximum(jnp.asarray(tol_gap, dtype=dtype), 50 * eps)
    tol_feas = jnp.maximum(jnp.asarray(tol_feas, dtype=dtype), 50 * eps)
    P = 0.5 * (P + P.T)

    if x_init is not None:
        # Warm start: push the supplied point strictly interior
        s0 = jnp.maximum(x_init - lb, 1e-4)
        x0 = lb + s0
        if z_init is not None:
            z0 = jnp.maximum(z_init, 1e-4)
        else:
            z0 = jnp.maximum(jnp.abs(P @ x0 + q), 1.0)
    else:
        # --- Initialization: damped unconstrained solution pushed interior
        eye = jnp.eye(n, dtype=dtype)
        diag_scale = jnp.mean(jnp.diag(P))
        x0 = spd_solve(P + eye * (1e-10 * diag_scale + 1e-12), -q)
        s0 = jnp.maximum(x0 - lb, 1.0)
        x0 = lb + s0
        z0 = jnp.maximum(jnp.abs(P @ x0 + q), 1.0)

    q_scale = 1.0 + jnp.max(jnp.abs(q))

    def converged(x, s, z):
        r_d = P @ x + q - z
        gap = jnp.dot(s, z) / n
        obj = 0.5 * jnp.dot(x, P @ x) + jnp.dot(q, x)
        ok_gap = gap <= tol_gap * (1.0 + jnp.abs(obj))
        ok_dual = jnp.max(jnp.abs(r_d)) <= tol_feas * q_scale
        return ok_gap & ok_dual

    def body(carry):
        # Under vmap the loop runs until ALL batch elements converge; a
        # converged element's state must be FROZEN (jnp.where on done below),
        # otherwise it keeps stepping at the s/z floors, overflows in float32,
        # goes NaN, never registers converged, and drags the whole batch to
        # max_iter on every call.
        x_old, s_old, z_old, it, done = carry
        x, s, z = x_old, s_old, z_old
        d = z / s
        r_d = P @ x + q - z
        r_p = s - (x - lb)
        mu = jnp.dot(s, z) / n

        H = P + jnp.diag(d)

        # Predictor (affine scaling) step (factor once, reuse for corrector)
        rhs_aff = -r_d - z + d * r_p
        dx_aff, l_f = spd_factor_solve(H, rhs_aff)
        ds_aff = dx_aff - r_p
        dz_aff = -z - d * ds_aff
        a_p = _max_step(s, ds_aff)
        a_d = _max_step(z, dz_aff)
        mu_aff = jnp.dot(s + a_p * ds_aff, z + a_d * dz_aff) / n
        sigma = (mu_aff / jnp.maximum(mu, 1e-300)) ** 3
        sigma = jnp.clip(sigma, 0.0, 1.0)

        # Corrector step
        r_c = s * z + ds_aff * dz_aff - sigma * mu
        rhs = -r_d - r_c / s + d * r_p
        dx = spd_solve_factored(l_f, rhs)
        ds = dx - r_p
        dz = -r_c / s - d * ds

        eta = 0.99
        a_p = jnp.minimum(1.0, eta * _max_step(s, ds))
        a_d = jnp.minimum(1.0, eta * _max_step(z, dz))

        x = x + a_p * dx
        tiny = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-25, dtype=dtype)
        s = jnp.maximum(s + a_p * ds, tiny)
        z = jnp.maximum(z + a_d * dz, tiny)
        # NaN/inf guard: a failed step (singular H in float32) keeps the
        # previous iterate and stops, rather than poisoning the batch
        bad = ~(jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(z)))
        x = jnp.where(done | bad, x_old, x)
        s = jnp.where(done | bad, s_old, s)
        z = jnp.where(done | bad, z_old, z)
        return x, s, z, it + 1, done | bad | converged(x, s, z)

    def cond(carry):
        _, _, _, it, done = carry
        return (it < max_iter) & (~done)

    if fused_steps is not None:
        x, s, z = _get_ip_steps(int(fused_steps))(P, q, lb, x0, s0, z0)
        it = jnp.asarray(fused_steps, dtype=jnp.int32)
    else:
        max_iter = jnp.asarray(max_iter, dtype=jnp.int32)
        x, s, z, it, _ = jax.lax.while_loop(
            cond, body, (x0, s0, z0, jnp.array(0, dtype=jnp.int32), jnp.array(False)))

    if polish:
        # Active-set polish: clamp near-active bounds and solve the reduced
        # KKT system exactly. Dimensionally-consistent activity test via
        # sqrt(diag P) scaling.
        dsqrt = jnp.sqrt(jnp.clip(jnp.diag(P), 1e-300, None))
        active = s * dsqrt < z / dsqrt

        free_mask = ~active
        fm = free_mask.astype(dtype)
        # H = [[P_ff, 0], [0, I_aa]] in scattered form
        H = P * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
        rhs = jnp.where(free_mask, -q - P @ jnp.where(active, lb, 0.0), lb)
        x_pol = spd_solve(H, rhs)
        x_pol = jnp.where(active, lb, x_pol)
        grad = P @ x_pol + q
        z_pol = jnp.where(active, grad, 0.0)
        # Validity: polished point must be primal/dual feasible
        valid = jnp.all(x_pol >= lb - 1e-9 * (1 + jnp.abs(lb))) & jnp.all(z_pol >= -tol_feas * q_scale)
        x = jnp.where(valid, x_pol, x)
        z = jnp.where(valid, z_pol, z)
        s = x - lb

    obj = 0.5 * jnp.dot(x, P @ x) + jnp.dot(q, x)
    return QPResult(x=x, z=z, s=s, gap=jnp.dot(s, z), iterations=it, primal_objective=obj)


@partial(jax.jit, static_argnames=("max_iter",))
def solve_qp(P, q, G, h, tol_gap=1e-12, tol_feas=1e-10, max_iter=60):
    """General inequality-constrained QP: min 1/2 x'Px + q'x s.t. G x <= h.

    Same Mehrotra scheme with slacks s = h - Gx > 0 and the reduced normal
    system (P + G' diag(z/s) G) dx = rhs. Used for the optional curvature
    constraint path; the pure bound case should use solve_qp_box.
    """
    n = q.shape[0]
    m = h.shape[0]
    dtype = q.dtype
    P = 0.5 * (P + P.T)
    eye = jnp.eye(n, dtype=dtype)

    chol0 = jsl.cho_factor(P + eye * (1e-10 * jnp.mean(jnp.diag(P)) + 1e-12))
    x0 = jsl.cho_solve(chol0, -q)
    s0 = jnp.maximum(h - G @ x0, 1.0)
    z0 = jnp.ones(m, dtype=dtype)

    q_scale = 1.0 + jnp.max(jnp.abs(q))

    def body(carry):
        # Freeze converged/failed elements under vmap (see solve_qp_box body)
        x_old, s_old, z_old, it, done = carry
        x, s, z = x_old, s_old, z_old
        d = z / s
        r_d = P @ x + q + G.T @ z
        r_p = s - h + G @ x
        mu = jnp.dot(s, z) / m

        H = P + (G.T * d[None, :]) @ G
        chol = jsl.cho_factor(H)

        def newton(r_c):
            # dz = (-r_c - z ds)/s with ds = -r_p - G dx; eliminating into
            # P dx + G' dz = -r_d gives (P + G' D G) dx = -r_d + G'(r_c/s) - G'(d r_p)
            rhs = -r_d + G.T @ (r_c / s) - G.T @ (d * r_p)
            dx = jsl.cho_solve(chol, rhs)
            ds = -r_p - G @ dx
            dz = (-r_c - z * ds) / s
            return dx, ds, dz

        dx_a, ds_a, dz_a = newton(s * z)
        a_p = _max_step(s, ds_a)
        a_d = _max_step(z, dz_a)
        mu_aff = jnp.dot(s + a_p * ds_a, z + a_d * dz_a) / m
        # Same guards as the box solver: mu -> 0 would blow sigma up to
        # inf/NaN near complementarity, and sigma > 1 over-centers
        sigma = (mu_aff / jnp.maximum(mu, 1e-300)) ** 3
        sigma = jnp.clip(sigma, 0.0, 1.0)

        dx, ds, dz = newton(s * z + ds_a * dz_a - sigma * mu)
        eta = 0.99
        a_p = jnp.minimum(1.0, eta * _max_step(s, ds))
        a_d = jnp.minimum(1.0, eta * _max_step(z, dz))
        x = x + a_p * dx
        s = s + a_p * ds
        z = z + a_d * dz

        bad = ~(jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(z)))
        x = jnp.where(done | bad, x_old, x)
        s = jnp.where(done | bad, s_old, s)
        z = jnp.where(done | bad, z_old, z)

        r_d = P @ x + q + G.T @ z
        gap = jnp.dot(s, z) / m
        obj = 0.5 * jnp.dot(x, P @ x) + jnp.dot(q, x)
        ok = (gap <= tol_gap * (1.0 + jnp.abs(obj))) & \
             (jnp.max(jnp.abs(r_d)) <= tol_feas * q_scale)
        return x, s, z, it + 1, done | bad | ok

    def cond(carry):
        _, _, _, it, done = carry
        return (it < max_iter) & (~done)

    x, s, z, it, _ = jax.lax.while_loop(
        cond, body, (x0, s0, z0, jnp.array(0, dtype=jnp.int32), jnp.array(False)))
    obj = 0.5 * jnp.dot(x, P @ x) + jnp.dot(q, x)
    return QPResult(x=x, z=z, s=s, gap=jnp.dot(s, z), iterations=it, primal_objective=obj)
