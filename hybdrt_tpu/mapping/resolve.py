"""Coherent multi-observation re-optimization ("resolve").

Joint refinement of a batch of neighboring DRT fits: each observation
contributes its posterior quadratic form (P_i, q_i) with data-dependent
nuisance parameters marginalized out, and a Gaussian second-derivative
smoothing penalty couples the solutions across the observation (psi) axis.
The block QP is solved by the JAX interior-point solver instead of cvxopt
(reference hybdrt/mapping/resolve.py:176-341).
"""
from copy import deepcopy

import numpy as np
import jax
import jax.numpy as jnp
from scipy.ndimage import gaussian_filter1d, median_filter

from ..ops import basis as basis_mod
from ..ops.qp import solve_qp_box


def get_offset_pq(drt):
    """P, q with data-dependent params (v_baseline, vz_offset) fixed at their
    fitted values and marginalized into q (reference resolve.py:11-63)."""
    p = np.asarray(drt.fit_parameters["p_matrix"])
    q = np.asarray(drt.fit_parameters["q_vector"])

    remove_names = [k for k in ("v_baseline", "vz_offset") if k in drt.special_qp_params]
    num_remove = int(sum(drt.special_qp_params[k].get("size", 1) for k in remove_names))
    if num_remove == 0:
        return p, q

    x_remove = np.empty(num_remove)
    for k in remove_names:
        v = drt.special_qp_params[k]
        if k == "v_baseline":
            unscaled = np.atleast_1d(drt.fit_parameters["v_baseline"])
            scaled = unscaled / drt.response_signal_scale
            scaled = np.array(scaled, dtype=float)
            scaled[0] += drt.scaled_response_offset
            scaled = scaled * drt.v_baseline_scale
            x_remove[v["index"]:v["index"] + v["size"]] = scaled
        elif k == "vz_offset":
            x_remove[v["index"]] = drt.fit_parameters["vz_offset"]

    q_offset = x_remove @ p[:num_remove, num_remove:]
    return p[num_remove:, num_remove:], q[num_remove:] + q_offset


def offset_special_dict(special_qp_params):
    """Special-param dict after removing data-dependent params
    (reference resolve.py:139-165)."""
    shifted = deepcopy(special_qp_params)
    del_index = {name: special_qp_params[name]["index"]
                 for name in ("v_baseline", "vz_offset") if name in special_qp_params}
    if del_index:
        for name in del_index:
            del shifted[name]
        for key in shifted:
            index = shifted[key]["index"]
            shift = sum(special_qp_params[name].get("size", 1)
                        for name, di in del_index.items() if di < index)
            shifted[key]["index"] = index - shift
    return shifted


def resize_pq(p, q, special_offset, tau_indices, match_tau_indices):
    """Pad/truncate the DRT block of (P, q) to a common tau window
    (reference resolve.py:66-137)."""
    num_drt = tau_indices[1] - tau_indices[0]
    match_num = match_tau_indices[1] - match_tau_indices[0]
    new_size = p.shape[0] + (match_num - num_drt)
    left_offset = tau_indices[0] - match_tau_indices[0]
    right_offset = tau_indices[1] - match_tau_indices[1]

    p_out = np.zeros((new_size, new_size))
    q_out = np.zeros(new_size)
    so = special_offset
    p_out[:so, :so] = p[:so, :so]
    q_out[:so] = q[:so]
    p_drt = p[so:, so:]
    q_drt = q[so:]

    if left_offset >= 0 and right_offset <= 0:
        left = so + left_offset
        right = new_size + right_offset if right_offset < 0 else new_size
        p_out[left:right, left:right] = p_drt
        q_out[left:right] = q_drt
        p_out[left:right, :so] = p[so:, :so]
        p_out[:so, left:right] = p[:so, so:]
    elif left_offset < 0 and right_offset > 0:
        p_out[so:, so:] = p_drt[-left_offset:-right_offset, -left_offset:-right_offset]
        q_out[so:] = q_drt[-left_offset:-right_offset]
        p_out[so:, :so] = p[so - left_offset:p.shape[0] - right_offset, :so]
        p_out[:so, so:] = p[:so, so - left_offset:p.shape[0] - right_offset]
    elif left_offset >= 0:
        left = so + left_offset
        p_out[left:, left:] = p_drt[:-right_offset, :-right_offset]
        q_out[left:] = q_drt[:-right_offset]
        p_out[left:, :so] = p[so:p.shape[0] - right_offset, :so]
        p_out[:so, left:] = p[:so, so:p.shape[0] - right_offset]
    else:
        right = new_size + right_offset
        p_out[so:right, so:right] = p_drt[-left_offset:, -left_offset:]
        q_out[so:right] = q_drt[-left_offset:]
        p_out[so:right, :so] = p[so - left_offset:, :so]
        p_out[:so, so:right] = p[:so, so - left_offset:]
    return p_out, q_out


def get_tau_indices(obs_tau_indices, truncate=False):
    if truncate:
        return (int(np.max([t[0] for t in obs_tau_indices])),
                int(np.min([t[1] for t in obs_tau_indices])))
    return (int(np.min([t[0] for t in obs_tau_indices])),
            int(np.max([t[1] for t in obs_tau_indices])))


def prepare_group_blocks(obs_drt_list, obs_tau_indices, nonneg,
                         truncate=False, sigma=1, lambda_psi=1,
                         tau_filter_sigma=0, special_filter_sigma=0):
    """Per-observation blocks + psi-coupling factors of the joint resolve QP
    (reference resolve.py:176-330, everything before the cvxopt call), WITHOUT
    materializing the (nr*nc) x (nr*nc) block matrix.

    The joint Hessian is H = blockdiag(P_i) + My (x) Cmat, where My (nr, nr)
    is the Gaussian second-derivative stencil over the observation (psi) axis
    and Cmat (nc, nc) = F diag(lambda_psi * param_scale) F collects the
    per-coefficient penalty scaling and the optional within-observation
    smoothing filter F. H is never formed; consumers either materialize it
    (small windows, assemble_resolve_system) or apply it matrix-free
    (whole-group coupled solve, solve_coupled_group).

    Returns (p_stack (nr,nc,nc), q_stack (nr,nc), lb (nc,), my (nr,nr),
    cmat (nc,nc), meta) with meta = (special_dict, match_tau_indices, nr, nc).
    """
    match_tau_indices = get_tau_indices(obs_tau_indices, truncate=truncate)

    special_dict = offset_special_dict(obs_drt_list[0].special_qp_params)
    special_offset = int(np.sum([v.get("size", 1) for v in special_dict.values()]))

    p_list, q_list = [], []
    for i, drt in enumerate(obs_drt_list):
        p, q = get_offset_pq(drt)
        p, q = resize_pq(p, q, special_offset, obs_tau_indices[i], match_tau_indices)
        p_list.append(p)
        q_list.append(q)

    nr = len(obs_drt_list)
    nc = len(q_list[0])

    # Second-derivative smoothing stencil across observations
    ly = gaussian_filter1d(np.eye(nr), sigma=sigma, mode="reflect", order=2)
    scale_vec = np.array([drt.coefficient_scale for drt in obs_drt_list])
    scale_smooth = gaussian_filter1d(median_filter(scale_vec, 3), 2)
    lys = ly @ np.diag(scale_vec / scale_smooth)
    my = lys.T @ lys

    # Per-parameter penalty scaling (R_inf / DOP columns)
    param_scale = np.ones(nc)
    dop_start = dop_end = None
    if "R_inf" in special_dict:
        x_inf = np.array([drt.fit_parameters["R_inf"] / drt.coefficient_scale
                          for drt in obs_drt_list])
        ohmic_scale = 5 * np.std(x_inf)
        if ohmic_scale > 0:
            param_scale[special_dict["R_inf"]["index"]] = ohmic_scale ** -2
    if "x_dop" in special_dict:
        x_dop = np.array([drt.fit_parameters["x_dop"]
                          / (drt.coefficient_scale * drt.dop_scale_vector)
                          for drt in obs_drt_list])
        dop_scales = np.std(x_dop, axis=0) + 0.1 * np.std(x_dop)
        dop_start = special_dict["x_dop"]["index"]
        dop_end = dop_start + special_dict["x_dop"].get("size", 1)
        param_scale[dop_start:dop_end] = dop_scales ** -2

    # Optional within-observation smoothing filters
    if tau_filter_sigma > 0 or special_filter_sigma > 0:
        filter_mat = np.eye(nc)
        if special_filter_sigma > 0 and dop_start is not None:
            eps = 1 / (np.sqrt(2) * special_filter_sigma)
            filter_mat[dop_start:dop_end, dop_start:dop_end] = np.asarray(
                basis_mod.construct_func_eval_matrix(
                    jnp.arange(dop_start, dop_end, dtype=float), epsilon=eps, order=0))
        if tau_filter_sigma > 0:
            eps = 1 / (np.sqrt(2) * tau_filter_sigma)
            filter_mat[special_offset:, special_offset:] = np.asarray(
                basis_mod.construct_func_eval_matrix(
                    jnp.arange(nc - special_offset, dtype=float), epsilon=eps, order=0))
        cmat = filter_mat @ np.diag(param_scale * lambda_psi) @ filter_mat
    else:
        cmat = np.diag(param_scale * lambda_psi)

    # Lower bounds (reference resolve.py:314-330); identical for every obs
    if nonneg:
        lb = np.zeros(nc)
    else:
        lb = np.full(nc, -10.0)
    for sp in special_dict.values():
        if sp["nonneg"]:
            lb[sp["index"]:sp["index"] + sp.get("size", 1)] = 0.0

    return (np.stack(p_list), np.stack(q_list), lb, my, cmat,
            (special_dict, match_tau_indices, nr, nc))


def assemble_resolve_system(obs_drt_list, obs_tau_indices, nonneg,
                            truncate=False, sigma=1, lambda_psi=1,
                            tau_filter_sigma=0, special_filter_sigma=0):
    """Materialize the joint block-QP system for one resolve window
    (reference resolve.py:176-330, everything before the cvxopt call).

    Returns (p_matrix, q_vector, lb, meta) with
    meta = (special_dict, match_tau_indices, nr, nc)."""
    p_stack, q_stack, lb_c, my, cmat, meta = prepare_group_blocks(
        obs_drt_list, obs_tau_indices, nonneg, truncate=truncate, sigma=sigma,
        lambda_psi=lambda_psi, tau_filter_sigma=tau_filter_sigma,
        special_filter_sigma=special_filter_sigma)
    _, _, nr, nc = meta

    # Block system: P block-diagonal + coupling my[i, j] * cmat
    p_matrix = np.kron(my, cmat)
    for i in range(nr):
        p_matrix[i * nc:(i + 1) * nc, i * nc:(i + 1) * nc] += p_stack[i]
    q_vector = q_stack.reshape(-1)
    lb = np.tile(lb_c, nr)
    return p_matrix, q_vector, lb, meta


def resolve_observations(obs_drt_list, obs_tau_indices, nonneg, obs_psi=None,
                         truncate=False, sigma=1, lambda_psi=1, unpack=False,
                         tau_filter_sigma=0, special_filter_sigma=0):
    """Jointly re-optimize a batch of fitted observations with psi-smoothing
    (reference resolve.py:176-341). Returns x (nr, nc) or unpacked params."""
    p_matrix, q_vector, lb, meta = assemble_resolve_system(
        obs_drt_list, obs_tau_indices, nonneg, truncate=truncate, sigma=sigma,
        lambda_psi=lambda_psi, tau_filter_sigma=tau_filter_sigma,
        special_filter_sigma=special_filter_sigma)
    special_dict, match_tau_indices, nr, nc = meta

    res = solve_qp_box(jnp.asarray(p_matrix), jnp.asarray(q_vector), jnp.asarray(lb))
    x_opt = np.asarray(res.x).reshape((nr, nc))

    if unpack:
        x_drt, x_special = unpack_resolved_x(x_opt, obs_drt_list, special_dict)
        return x_drt, x_special, match_tau_indices
    return x_opt, match_tau_indices


def solve_resolve_batch(blocks, mesh=None, dtype=None, tol_gap=1e-12,
                        tol_feas=1e-10, max_iter=60, cg_iters=200):
    """Solve many resolve-window block QPs as ONE vmapped (optionally
    mesh-sharded) MATRIX-FREE computation — the device-parallel replacement
    for the reference's per-window cvxopt calls inside resolve_group
    (reference drtmd.py:486-560).

    Each window keeps its H = blockdiag(P_i) + My (x) Cmat structure and is
    solved by the coupled IP-PCG core (see solve_coupled_group) with the
    window axis vmapped. An earlier dense variant materialized each
    window's (w*nc)^2 kron matrix; at production window counts (~100
    windows x (7*95)^3 dense IP) that program reliably OOM-killed the axon
    remote-compile helper, so the windowed resolve could not run on the
    tunneled chip at all. The matrix-free program is ~30x smaller and
    O(w*nc^2) memory per window.

    blocks: list of (p_stack (w, nc_i, nc_i), q_stack (w, nc_i), lb (nc_i,),
    my (w, w), cmat (nc_i, nc_i)) from prepare_group_blocks; windows with
    narrower tau spans are padded to the widest nc with pinned identity
    columns (exactly zero in the solution, strictly complementary).
    Returns a list of x (w, nc_i) at the original sizes."""
    from ..parallel import sharding as sh

    dtype = dtype or jnp.float64
    sizes = [q.shape[1] for (_, q, _, _, _) in blocks]
    w = blocks[0][1].shape[0]
    nc_max = max(sizes)
    b = len(blocks)
    p_b = np.zeros((b, w, nc_max, nc_max))
    q_b = np.ones((b, w, nc_max))  # pad cols pinned at lb=0 with dual 1
    lb_b = np.zeros((b, w, nc_max))
    my_b = np.zeros((b, w, w))
    c_b = np.zeros((b, nc_max, nc_max))
    pad_idx = None
    for i, (p, q, lb, my, cmat) in enumerate(blocks):
        n = q.shape[1]
        p_b[i, :, :n, :n] = p
        if n < nc_max:
            if pad_idx is None or len(pad_idx) != nc_max - n:
                pad_idx = np.arange(n, nc_max)
            p_b[i][:, pad_idx, pad_idx] = 1.0
        q_b[i, :, :n] = q
        lb_b[i, :, :n] = np.broadcast_to(lb, (w, n))
        my_b[i] = my
        c_b[i, :n, :n] = cmat

    arrays = (p_b, q_b, lb_b, my_b, c_b)
    if mesh is not None:
        arrays = tuple(sh.shard_batch(jnp.asarray(
            sh.pad_batch(a, mesh)[0], dtype=dtype), mesh) for a in arrays)
    else:
        arrays = tuple(jnp.asarray(a, dtype=dtype) for a in arrays)

    x_b, _, _ = _coupled_batch_core(
        *arrays, jnp.asarray(tol_gap, dtype=dtype),
        jnp.asarray(tol_feas, dtype=dtype),
        jnp.asarray(max_iter, dtype=jnp.int32),
        jnp.asarray(cg_iters, dtype=jnp.int32))
    x_b = np.asarray(x_b)
    return [x_b[i, :, :n] for i, n in enumerate(sizes)]


# Module-level jitted solver so repeat resolve calls reuse the compiled
# executable instead of retracing per call
@jax.jit
def _coupled_batch_core(p, q, lb, my, cmat, tol_gap, tol_feas, max_iter,
                        cg_iters):
    return jax.vmap(
        _coupled_body, in_axes=(0, 0, 0, 0, 0, None, None, None, None)
    )(p, q, lb, my, cmat, tol_gap, tol_feas, max_iter, cg_iters)


def solve_coupled_group(p_stack, q_stack, lb, my, cmat, mesh=None, dtype=None,
                        tol_gap=1e-12, tol_feas=1e-10, max_iter=60,
                        cg_iters=200):
    """Solve the WHOLE-group coupled resolve QP as one box-constrained problem.

    The reference never solves the full group jointly: cvxopt's dense solver
    caps it at overlapping batch_size=7 windows whose solutions are
    overlap-averaged (reference drtmd.py:513-545, resolve.py:176-341) — an
    approximation born of the solver, not the model. Here the exact global
    optimum is computed by the same Mehrotra predictor-corrector trajectory
    as ops.qp.solve_qp_box, but MATRIX-FREE: the Hessian
    H = blockdiag(P_i) + My (x) Cmat is only ever APPLIED — a batched
    (nr,nc,nc)@(nr,nc) matmul plus the psi-stencil (My @ V) @ Cmat, both
    MXU-shaped — and each IP Newton system (H + diag(z/s)) dx = r is solved
    by PCG with a block-Jacobi preconditioner re-factored per IP step
    (vmapped Cholesky of P_i + My_ii*Cmat + diag(d_i); the barrier diagonal
    makes it strong exactly where the system stiffens — measured ~5 CG
    iterations per solve on real resolve systems). An active-set polish
    (masked PCG on the free set) restores exact bounds, as in solve_qp_box.
    Memory is O(nr * nc^2) instead of the dense scheme's O((nr*nc)^2).

    With a mesh, the observation axis is sharded (pad lanes carry identity
    blocks, zero stencil rows, and q=1 so they pin to the bound exactly) and
    XLA inserts the collectives for the stencil contraction.

    Returns (x (nr, nc), n_iter, kkt_residual)."""
    from ..parallel import sharding as sh

    dtype = dtype or jnp.float64
    nr, nc = q_stack.shape
    p_b = np.asarray(p_stack)
    q_b = np.asarray(q_stack)
    lb_b = np.broadcast_to(np.asarray(lb), (nr, nc)).copy()
    my_b = np.asarray(my)

    if mesh is not None:
        rem = (-nr) % mesh.devices.size
        if rem:
            p_b = np.concatenate(
                [p_b, np.broadcast_to(np.eye(nc), (rem, nc, nc))], axis=0)
            q_b = np.concatenate([q_b, np.ones((rem, nc))], axis=0)
            lb_b = np.concatenate([lb_b, np.zeros((rem, nc))], axis=0)
            my_pad = np.zeros((nr + rem, nr + rem))
            my_pad[:nr, :nr] = my_b
            my_b = my_pad
        args = [sh.shard_batch(jnp.asarray(a, dtype=dtype), mesh)
                for a in (p_b, q_b, lb_b)]
        my_j = jnp.asarray(my_b, dtype=dtype)
    else:
        args = [jnp.asarray(a, dtype=dtype) for a in (p_b, q_b, lb_b)]
        my_j = jnp.asarray(my_b, dtype=dtype)

    x, n_iter, kkt = _coupled_core(
        *args, my_j, jnp.asarray(cmat, dtype=dtype),
        jnp.asarray(tol_gap, dtype=dtype), jnp.asarray(tol_feas, dtype=dtype),
        jnp.asarray(max_iter, dtype=jnp.int32),
        jnp.asarray(cg_iters, dtype=jnp.int32))
    return np.asarray(x)[:nr], int(n_iter), float(kkt)


def _coupled_body(p, q, lb, my, cmat, tol_gap, tol_feas, max_iter, cg_iters):
    """Matrix-free Mehrotra predictor-corrector for
    min 1/2 sum_i x_i P_i x_i + q.x + 1/2 psi-coupling, s.t. x >= lb,
    mirroring ops.qp._solve_qp_box_core's trajectory (equilibration, sigma
    heuristic, step lengths, freeze-on-NaN, active-set polish) with every
    dense Cholesky replaced by block-Jacobi-preconditioned CG.

    All iterates live as (nr, nc); the Hessian is applied matrix-free."""
    from ..ops.qp import spd_factor, spd_solve_factored

    dt = q.dtype
    nr, nc = q.shape
    n = nr * nc
    eps = jnp.finfo(dt).eps
    tol_gap = jnp.maximum(tol_gap, 50 * eps)
    tol_feas = jnp.maximum(tol_feas, 50 * eps)
    cg_rtol = jnp.asarray(100.0, dt) * eps
    myd = jnp.diagonal(my)

    # Jacobi equilibration (exact reparameterization x = dvec * x~): removes
    # scaling-induced ill-conditioning, essential for float32 on TPU
    hdiag = jax.vmap(jnp.diag)(p) + myd[:, None] * jnp.diag(cmat)[None, :]
    dvec = 1.0 / jnp.sqrt(jnp.clip(hdiag, 1e-300, None))
    q_e = q * dvec
    lb_e = lb / dvec
    q_scale = 1.0 + jnp.max(jnp.abs(q_e))
    # Equilibrated diagonal blocks (exact): used by the preconditioner only
    mj = dvec[:, :, None] * (p + myd[:, None, None] * cmat[None]) \
        * dvec[:, None, :]

    def hv_e(v):
        u = dvec * v
        return dvec * (jnp.einsum("bij,bj->bi", p, u) + (my @ u) @ cmat)

    def pcg(apply, prec, b):
        """Preconditioned CG, fixed relative tolerance, capped iterations."""
        r0 = b
        z0 = prec(r0)
        stop2 = (cg_rtol ** 2) * jnp.vdot(b, b)
        state0 = (jnp.zeros_like(b), r0, z0, z0, jnp.vdot(r0, z0),
                  jnp.asarray(0, jnp.int32))

        def cond(st):
            _, r, _, _, _, k = st
            return (jnp.vdot(r, r) > stop2) & (k < cg_iters)

        def body2(st):
            x, r, z, pd, rz, k = st
            hp = apply(pd)
            den = jnp.vdot(pd, hp)
            alpha = jnp.where(den > 0, rz / den, 0.0)
            x = x + alpha * pd
            r = r - alpha * hp
            z_new = prec(r)
            rz_new = jnp.vdot(r, z_new)
            beta = jnp.where(rz > 0, rz_new / rz, 0.0)
            pd = z_new + beta * pd
            return (x, r, z_new, pd, rz_new, k + 1)

        x, *_ = jax.lax.while_loop(cond, body2, state0)
        return x

    def max_step(v, dv):
        m = dv < 0
        ratio = jnp.where(m, -v / jnp.where(m, dv, -1.0), jnp.inf)
        return jnp.minimum(jnp.asarray(1e20, dt), jnp.min(ratio))

    # --- Initialization: block-Jacobi unconstrained solve pushed interior
    lfac0 = jax.vmap(spd_factor)(mj)
    x0 = jax.vmap(spd_solve_factored)(lfac0, -q_e)
    s0 = jnp.maximum(x0 - lb_e, 1.0)
    x0 = lb_e + s0
    z0 = jnp.maximum(jnp.abs(hv_e(x0) + q_e), 1.0)

    def converged(x, s, z):
        hx = hv_e(x)
        r_d = hx + q_e - z
        gap = jnp.vdot(s, z) / n
        obj = 0.5 * jnp.vdot(x, hx) + jnp.vdot(q_e, x)
        ok_gap = gap <= tol_gap * (1.0 + jnp.abs(obj))
        ok_dual = jnp.max(jnp.abs(r_d)) <= tol_feas * q_scale
        return ok_gap & ok_dual

    def body(carry):
        x_old, s_old, z_old, it, done = carry
        x, s, z = x_old, s_old, z_old
        d = z / s
        r_d = hv_e(x) + q_e - z
        r_p = s - (x - lb_e)

        # Barrier-augmented block-Jacobi preconditioner, re-factored per step
        lfac = jax.vmap(spd_factor)(mj + jax.vmap(jnp.diag)(d))

        def prec(r):
            return jax.vmap(spd_solve_factored)(lfac, r)

        def apply(v):
            return hv_e(v) + d * v

        mu = jnp.vdot(s, z) / n
        rhs_aff = -r_d - z + d * r_p
        dx_aff = pcg(apply, prec, rhs_aff)
        ds_aff = dx_aff - r_p
        dz_aff = -z - d * ds_aff
        a_p = jnp.minimum(1.0, max_step(s, ds_aff))
        a_d = jnp.minimum(1.0, max_step(z, dz_aff))
        mu_aff = jnp.vdot(s + a_p * ds_aff, z + a_d * dz_aff) / n
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-300)) ** 3, 0.0, 1.0)

        r_c = s * z + ds_aff * dz_aff - sigma * mu
        rhs = -r_d - r_c / s + d * r_p
        dx = pcg(apply, prec, rhs)
        ds = dx - r_p
        dz = -r_c / s - d * ds

        eta = 0.99
        a_p = jnp.minimum(1.0, eta * max_step(s, ds))
        a_d = jnp.minimum(1.0, eta * max_step(z, dz))
        x = x + a_p * dx
        tiny = jnp.asarray(1e-30 if dt == jnp.float64 else 1e-25, dt)
        s = jnp.maximum(s + a_p * ds, tiny)
        z = jnp.maximum(z + a_d * dz, tiny)
        bad = ~(jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(z)))
        x = jnp.where(done | bad, x_old, x)
        s = jnp.where(done | bad, s_old, s)
        z = jnp.where(done | bad, z_old, z)
        return x, s, z, it + 1, done | bad | converged(x, s, z)

    def cond(carry):
        _, _, _, it, done = carry
        return (it < max_iter) & (~done)

    x, s, z, n_iter, _ = jax.lax.while_loop(
        cond, body, (x0, s0, z0, jnp.asarray(0, jnp.int32),
                     jnp.asarray(False)))

    # --- Active-set polish (equilibrated diag(H) == 1, so activity is s < z).
    # Iterated: the IP's s/z classification can misplace a handful of
    # coordinates (a free coordinate whose true optimum sits AT the bound
    # comes out slightly primal-infeasible and a single-shot polish gets
    # discarded wholesale); each round clamps primal violators and releases
    # negative multipliers, keeping the last valid polished point.
    def polish_round(_, carry):
        active, x_acc = carry
        fm = (~active).astype(dt)

        def apply_pol(v):
            return fm * hv_e(fm * v) + (1.0 - fm) * v

        lfac_pol = jax.vmap(spd_factor)(
            fm[:, :, None] * mj * fm[:, None, :]
            + jax.vmap(jnp.diag)(1.0 - fm))

        def prec_pol(r):
            return jax.vmap(spd_solve_factored)(lfac_pol, r)

        rhs_pol = jnp.where(active, lb_e,
                            -q_e - hv_e(jnp.where(active, lb_e, 0.0)))
        x_pol = pcg(apply_pol, prec_pol, rhs_pol)
        x_pol = jnp.where(active, lb_e, x_pol)
        grad = hv_e(x_pol) + q_e
        z_pol = jnp.where(active, grad, 0.0)
        valid = jnp.all(x_pol >= lb_e - 1e-9 * (1 + jnp.abs(lb_e))) \
            & jnp.all(z_pol >= -tol_feas * q_scale)
        x_acc = jnp.where(valid, x_pol, x_acc)
        active = (active & (z_pol >= 0)) | (x_pol < lb_e)
        return active, x_acc

    _, x = jax.lax.fori_loop(0, 3, polish_round, (s < z, x))

    # --- Report in ORIGINAL units
    x_out = dvec * x
    g = jnp.einsum("bij,bj->bi", p, x_out) + (my @ x_out) @ cmat + q
    at_b = x_out <= lb + jnp.sqrt(eps) * (1.0 + jnp.abs(lb))
    kkt = jnp.max(jnp.abs(jnp.where(at_b, jnp.minimum(g, 0.0), g)))
    return x_out, n_iter, kkt


# Single-group jitted entry (used by solve_coupled_group)
_coupled_core = jax.jit(_coupled_body)


def unpack_resolved_x(x, obs_drt_list, special_dict):
    """Rescale resolved coefficients to physical units (reference resolve.py:344)."""
    special_offset = int(np.sum([v.get("size", 1) for v in special_dict.values()]))
    coef_scale = np.array([drt.coefficient_scale for drt in obs_drt_list])
    x_drt = x[:, special_offset:] * coef_scale[:, None]

    x_special = {}
    for key, info in special_dict.items():
        start, size = info["index"], info.get("size", 1)
        x_k = x[:, start:start + size] * coef_scale[:, None]
        if key == "x_dop":
            dop_scale = np.stack([drt.dop_scale_vector for drt in obs_drt_list])
            x_k = x_k * dop_scale
        elif key == "C_inv":
            x_k = x_k * np.array([drt.capacitance_scale for drt in obs_drt_list])[:, None]
        elif key == "inductance":
            x_k = x_k * np.array([drt.inductance_scale for drt in obs_drt_list])[:, None]
        if size == 1:
            x_k = x_k.flatten()
        x_special[key] = x_k
    return x_drt, x_special
