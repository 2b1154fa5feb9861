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


def assemble_resolve_system(obs_drt_list, obs_tau_indices, nonneg,
                            truncate=False, sigma=1, lambda_psi=1,
                            tau_filter_sigma=0, special_filter_sigma=0):
    """Build the joint block-QP system for one resolve window
    (reference resolve.py:176-330, everything before the cvxopt call).

    Returns (p_matrix, q_vector, lb, meta) with
    meta = (special_dict, match_tau_indices, nr, nc)."""
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
    else:
        filter_mat = None

    # Assemble block system: P block-diagonal, coupling diag(param_scale)*My[i,j]
    p_matrix = np.zeros((nr * nc, nr * nc))
    m_full = np.zeros((nr * nc, nr * nc))
    for i in range(nr):
        p_matrix[i * nc:(i + 1) * nc, i * nc:(i + 1) * nc] = p_list[i]
    diag_template = param_scale * lambda_psi
    for i in range(nr):
        for j in range(nr):
            idx = (slice(i * nc, (i + 1) * nc), slice(j * nc, (j + 1) * nc))
            m_full[idx] += np.diag(diag_template * my[i, j])
    if filter_mat is not None:
        full_filter = np.kron(np.eye(nr), filter_mat)
        m_full = full_filter @ m_full @ full_filter
    p_matrix = p_matrix + m_full
    q_vector = np.concatenate(q_list)

    # Lower bounds (reference resolve.py:314-330)
    if nonneg:
        lb = np.zeros(nr * nc)
    else:
        lb = np.full(nr * nc, -10.0)
    for sp in special_dict.values():
        if sp["nonneg"]:
            for i in range(nr):
                s0 = sp["index"] + i * nc
                lb[s0:s0 + sp.get("size", 1)] = 0.0

    return p_matrix, q_vector, lb, (special_dict, match_tau_indices, nr, nc)


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


def solve_resolve_batch(systems, mesh=None, dtype=None):
    """Solve many resolve-window block QPs as ONE vmapped (optionally
    mesh-sharded) computation instead of a serial python loop — the
    device-parallel replacement for the reference's per-window cvxopt calls
    inside resolve_group (reference drtmd.py:486-560).

    systems: list of (p_matrix, q_vector, lb) of possibly different sizes;
    windows are padded to the largest size with unit-diagonal / unit-cost
    pinned columns (exactly zero in the solution, strictly complementary).
    Returns a list of solution vectors at the original sizes."""
    import jax
    from ..parallel import sharding as sh

    dtype = dtype or jnp.float64
    sizes = [len(q) for (_, q, _) in systems]
    n_max = max(sizes)
    b = len(systems)
    p_b = np.zeros((b, n_max, n_max))
    q_b = np.zeros((b, n_max))
    lb_b = np.zeros((b, n_max))
    for i, (p, q, lb) in enumerate(systems):
        n = len(q)
        p_b[i, :n, :n] = p
        p_b[i, n:, n:] = np.eye(n_max - n)
        q_b[i, :n] = q
        q_b[i, n:] = 1.0  # pinned at lb=0 with dual 1 (non-degenerate)
        lb_b[i, :n] = lb

    arrays = (p_b, q_b, lb_b)
    if mesh is not None:
        arrays = tuple(sh.shard_batch(jnp.asarray(
            sh.pad_batch(a, mesh)[0], dtype=dtype), mesh) for a in arrays)
    else:
        arrays = tuple(jnp.asarray(a, dtype=dtype) for a in arrays)

    x_b = np.asarray(_solve_batch_jit(*arrays))
    return [x_b[i, :n] for i, n in enumerate(sizes)]


# Module-level jitted solver so repeat resolve calls reuse the compiled
# executable instead of retracing per call
@jax.jit
def _solve_batch_jit(p_b, q_b, lb_b):
    return jax.vmap(lambda p, q, lb: solve_qp_box(p, q, lb).x)(p_b, q_b, lb_b)


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
