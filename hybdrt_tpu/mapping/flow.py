"""Optical-flow alignment of DRT maps (reference hybdrt/mapping/flow.py + the
vendored iterative-Lucas-Kanade code in _ilk.py).

Tracks peak movement across the psi axis by solving for a per-pixel
displacement field restricted to chosen axes ("partial flow"), then warps or
aligns frames. Implemented directly with scipy (gaussian windows + normal
equations for ILK; map_coordinates for warping) — no scikit-image dependency.
"""
import numpy as np
from scipy import ndimage


# ------------------------------------------------------------------
# Iterative Lucas-Kanade partial flow (reference _ilk.py:57-216)
# ------------------------------------------------------------------
def partial_flow_ilk(reference_image, moving_image, flow_axes=(-1,), radius=7,
                     num_warp=10, gaussian=True, prefilter=True):
    """Estimate per-pixel displacement along flow_axes only.

    Returns flow with shape (len(flow_axes), *image.shape)."""
    ref = np.asarray(reference_image, dtype=float)
    mov = np.asarray(moving_image, dtype=float)
    ndim = ref.ndim
    axes = [ax % ndim for ax in np.atleast_1d(flow_axes)]

    # radius may be per-image-axis (anisotropic windows; the blended-flow
    # driver uses a small radius on its frame axis as flow "momentum")
    radius = np.broadcast_to(np.asarray(radius, dtype=float), (ndim,))
    if gaussian:
        sigma = tuple(radius / 2.0)
        def window(a):
            return ndimage.gaussian_filter(a, sigma, mode="mirror")
    else:
        size = tuple((2 * radius + 1).astype(int))
        def window(a):
            return ndimage.uniform_filter(a, size, mode="mirror")

    if prefilter:
        mov_f = ndimage.median_filter(mov, 3)
        ref_f = ndimage.median_filter(ref, 3)
    else:
        mov_f, ref_f = mov, ref

    grid = np.meshgrid(*[np.arange(s, dtype=float) for s in ref.shape], indexing="ij")
    flow = np.zeros((len(axes), *ref.shape))

    for _ in range(num_warp):
        coords = [g.copy() for g in grid]
        for k, ax in enumerate(axes):
            coords[ax] = coords[ax] + flow[k]
        warped = ndimage.map_coordinates(mov_f, coords, order=1, mode="nearest")

        grads = [np.gradient(warped, axis=ax) for ax in axes]
        it = ref_f - warped

        # Normal equations G dflow = b, windowed
        n = len(axes)
        g_mat = np.empty((n, n, *ref.shape))
        b_vec = np.empty((n, *ref.shape))
        for i in range(n):
            b_vec[i] = window(grads[i] * it)
            for j in range(i, n):
                g_mat[i, j] = window(grads[i] * grads[j])
                g_mat[j, i] = g_mat[i, j]
        # Regularize and solve per pixel; pixels with (near-)zero local
        # structure get zero update instead of a blow-up (reference
        # _ilk.py: "Don't consider badly conditioned linear systems")
        eps = 1e-8 * (np.mean([g_mat[i, i] for i in range(n)]) + 1e-30)
        for i in range(n):
            g_mat[i, i] = g_mat[i, i] + eps
        if n == 1:
            bad = np.abs(g_mat[0, 0]) < 1e-14
            dflow = np.where(bad, 0.0, b_vec / np.where(bad, 1.0, g_mat[0, 0]))
        else:
            g_flat = np.moveaxis(g_mat.reshape(n, n, -1), -1, 0)
            b_flat = np.moveaxis(b_vec.reshape(n, -1), -1, 0)
            bad = np.abs(np.linalg.det(g_flat)) < 1e-14
            g_flat[bad] = np.eye(n)
            b_flat[bad] = 0.0
            dflow = np.linalg.solve(g_flat, b_flat).T.reshape(n, *ref.shape)
        flow = flow + dflow
    return flow


# ------------------------------------------------------------------
# Warping / composition (reference flow.py:17-74)
# ------------------------------------------------------------------
def warp_image(image, flow, flow_axes=(-1,), order=1, mode="nearest"):
    """Warp an image by the given partial flow field."""
    image = np.asarray(image, dtype=float)
    ndim = image.ndim
    axes = [ax % ndim for ax in np.atleast_1d(flow_axes)]
    coords = list(np.meshgrid(*[np.arange(s, dtype=float) for s in image.shape],
                              indexing="ij"))
    for k, ax in enumerate(axes):
        coords[ax] = coords[ax] + flow[k]
    return ndimage.map_coordinates(image, coords, order=order, mode=mode)


def compose_flows(flow_ab, flow_bc, flow_axes=(-1,)):
    """Flow a->c from a->b and b->c: f_ac(x) = f_ab(x) + f_bc(x + f_ab(x))."""
    out = np.empty_like(flow_ab)
    for k in range(flow_ab.shape[0]):
        warped_bc = warp_image(flow_bc[k], flow_ab, flow_axes=flow_axes)
        out[k] = flow_ab[k] + warped_bc
    return out


def reverse_flow(flow, flow_axes=(-1,), num_iter=5):
    """Approximate inverse flow: f_inv(x) = -f(x + f_inv(x)), fixed-point."""
    inv = -np.array(flow, copy=True)
    for _ in range(num_iter):
        upd = np.empty_like(inv)
        for k in range(flow.shape[0]):
            upd[k] = -warp_image(flow[k], inv, flow_axes=flow_axes)
        inv = upd
    return inv


def bidirectional_flow(image_a, image_b, flow_axes=(-1,), **ilk_kw):
    """Average of forward and reversed-backward flows (reference flow.py:75-292)."""
    fwd = partial_flow_ilk(image_a, image_b, flow_axes=flow_axes, **ilk_kw)
    bwd = partial_flow_ilk(image_b, image_a, flow_axes=flow_axes, **ilk_kw)
    # reverse_flow(bwd) APPROXIMATES fwd, so the two estimates average with
    # a plus sign (a minus sign cancels them to ~zero)
    return 0.5 * (fwd + reverse_flow(bwd, flow_axes=flow_axes))


# ------------------------------------------------------------------
# Sequential flow solve + alignment (reference flow.py:370-582)
# ------------------------------------------------------------------
def solve_flow_field(frames, flow_axes=(-1,), bidirectional=False, **ilk_kw):
    """Flow between each pair of consecutive frames along a velocity axis.

    frames: array with leading axis = sequence. Returns array of shape
    (n_frames - 1, len(flow_axes), *frame_shape) with frame[i]->frame[i+1]."""
    frames = np.asarray(frames, dtype=float)
    flows = []
    for i in range(frames.shape[0] - 1):
        if bidirectional:
            fl = bidirectional_flow(frames[i + 1], frames[i], flow_axes=flow_axes,
                                    **ilk_kw)
        else:
            fl = partial_flow_ilk(frames[i + 1], frames[i], flow_axes=flow_axes,
                                  **ilk_kw)
        flows.append(fl)
    return np.stack(flows)


def align_to_reference(frames, ref_index=0, flow_axes=(-1,), flows=None, **ilk_kw):
    """Warp every frame onto the reference frame by composing pairwise flows
    (reference flow.py:574)."""
    frames = np.asarray(frames, dtype=float)
    if flows is None:
        flows = solve_flow_field(frames, flow_axes=flow_axes, **ilk_kw)
    n = frames.shape[0]
    aligned = np.empty_like(frames)
    aligned[ref_index] = frames[ref_index]

    # flows[j] satisfies frames[j](x + flows[j](x)) ~= frames[j+1](x):
    # warping frame j by flows[j] advances it to frame j+1.
    # Frames after the reference are carried BACK by reversed flows;
    # frames before it are carried FORWARD by composed flows.
    for i in range(ref_index + 1, n):
        total = reverse_flow(flows[i - 1], flow_axes=flow_axes)
        for j in range(i - 2, ref_index - 1, -1):
            total = compose_flows(total, reverse_flow(flows[j], flow_axes=flow_axes),
                                  flow_axes=flow_axes)
        aligned[i] = warp_image(frames[i], total, flow_axes=flow_axes)
    for i in range(ref_index - 1, -1, -1):
        total = flows[i]
        for j in range(i + 1, ref_index):
            total = compose_flows(total, flows[j], flow_axes=flow_axes)
        aligned[i] = warp_image(frames[i], total, flow_axes=flow_axes)
    return aligned, flows


def warp(x, flow, flow_axes=None, **kw):
    """Warp an array by a full-dimensional flow field (reference flow.py
    warp). `flow` holds one displacement component per axis of x (shape
    (ndim, *x.shape)); with flow_axes given, delegates to warp_image."""
    if flow_axes is not None:
        return warp_image(x, flow, flow_axes=flow_axes, **kw)
    x = np.asarray(x, dtype=float)
    flow = np.asarray(flow)
    grid = np.meshgrid(*[np.arange(n, dtype=float) for n in x.shape],
                       indexing="ij")
    coords = [g + f for g, f in zip(grid, flow)]
    from scipy import ndimage
    return ndimage.map_coordinates(x, coords, order=kw.pop("order", 1),
                                   mode=kw.pop("mode", "nearest"), **kw)


def warp_flow(flow_in, flow_warp):
    """Warp a flow field by another flow so it moves with the warped image.
    Flows are inverse coordinate maps, so the field warps in the opposite
    direction (reference flow.py)."""
    flow_in = np.asarray(flow_in)
    return np.stack([warp(f, -np.asarray(flow_warp)) for f in flow_in])


def sum_flows(flow_sequence, reverse=False):
    """Compose a sequence of frame-to-frame full-dimensional flows into one
    total flow (reference flow.py). With reverse=True, each flow is inverted
    and the sequence order flipped first."""
    if reverse:
        flow_sequence = [reverse_flow_full(f) for f in flow_sequence[::-1]]
    rev = flow_sequence[::-1]
    total = np.array(rev[0], dtype=float)
    for f in rev[1:]:
        total += warp_flow(np.asarray(f, dtype=float), -total)
    return total


def reverse_flow_full(flow, num_iter=5):
    """Approximate inverse of a full-dimensional flow field by fixed-point
    iteration (the flow_axes variant is reverse_flow)."""
    flow = np.asarray(flow, dtype=float)
    inv = -flow
    for _ in range(num_iter):
        inv = -warp_flow(flow, -inv)
    return inv


def blend_frames(reference_image, moving_image, sigma, num=2, replace=False):
    """Interpolate `num` intermediate frames between two images with a
    masked gaussian blend along the new frame axis (reference flow.py)."""
    from ..filters import masked_filter
    from scipy.ndimage import gaussian_filter1d
    output = np.zeros((num + 2, *np.shape(reference_image)))
    output[0] = reference_image
    output[-1] = moving_image
    weights = np.zeros_like(output)
    weights[0] = 1
    weights[-1] = 1
    blended = masked_filter(output, weights, gaussian_filter1d, axis=0,
                            sigma=sigma, mode="nearest")
    # Frames far from both endpoints underflow the masked filter (0/0 when
    # both gaussian weights vanish); rebuild them with the numerically
    # stable two-point blend ratio 1/(1 + exp((d0^2 - d1^2)/(2 sigma^2)))
    bad = ~np.all(np.isfinite(blended), axis=tuple(range(1, blended.ndim)))
    if bad.any():
        n = blended.shape[0]
        d0 = np.arange(n, dtype=float)
        d1 = (n - 1) - d0
        w_mov = 1.0 / (1.0 + np.exp((d1 ** 2 - d0 ** 2) / (2 * sigma ** 2)))
        shape = (-1,) + (1,) * (blended.ndim - 1)
        fixed = ((1 - w_mov).reshape(shape) * np.asarray(reference_image)
                 + w_mov.reshape(shape) * np.asarray(moving_image))
        blended[bad] = fixed[bad]
    if replace:
        return blended
    output[1:-1] = blended[1:-1]
    return output


def partial_flow_blended(reference_image, moving_image, flow_axes=(-1,),
                         blend_sigma=1, blend_num=2, replace=False,
                         momentum=True, momentum_radius=1,
                         post_blend_op=None, op_kwargs=None,
                         radius=7, **ilk_kw):
    """Partial flow between two distant frames via interpolated intermediate
    frames (reference flow.py:93-216 partial_flow_blended).

    Large displacements defeat plain ILK (the true shift exceeds the
    window's capture range); blending ``blend_num`` intermediate frames
    between the endpoints splits the displacement into small per-step flows
    that are summed into the total. With ``momentum=True`` all per-step
    flows are solved as ONE ILK problem over the frame stack with a small
    window radius along the frame axis, coupling neighboring steps
    ("momentum" smoothing); otherwise steps are solved pairwise.

    Returns flow with shape (len(flow_axes), *image.shape), same convention
    as partial_flow_ilk: ``warp_image(moving_image, flow)`` ~ reference.
    """
    blended = blend_frames(reference_image, moving_image, blend_sigma,
                           blend_num, replace=replace)
    if post_blend_op is not None:
        blended = post_blend_op(blended, **(op_kwargs or {}))

    img_ndim = np.ndim(moving_image)
    axes = [ax % img_ndim for ax in np.atleast_1d(flow_axes)]
    if momentum:
        radius = np.broadcast_to(np.asarray(radius, dtype=float), (img_ndim,))
        stack_radius = np.concatenate([[momentum_radius], radius])
        shifted = tuple(ax + 1 for ax in axes)
        # One solve over the whole stack: flow[k, i] maps blended[i+1] back
        # to blended[i]; the frame-axis window couples neighboring steps
        step_flow = partial_flow_ilk(blended[:-1], blended[1:],
                                     flow_axes=shifted, radius=stack_radius,
                                     **ilk_kw)
        return step_flow.sum(axis=1)
    step_flows = [partial_flow_ilk(blended[i], blended[i + 1],
                                   flow_axes=axes, radius=radius, **ilk_kw)
                  for i in range(blended.shape[0] - 1)]
    return np.sum(step_flows, axis=0)


def solve_flow_field_1d(x, velocity_axis, flow_axes, radius=7,
                        bidirectional=False, **kwargs):
    """Frame-to-frame flows along an arbitrary velocity axis of an N-D array
    (reference flow.py solve_flow_field_1d): moves velocity_axis to the
    front and delegates to solve_flow_field. `radius` may be a per-axis
    sequence (reference style; the window radius used is its maximum) or a
    scalar."""
    x = np.asarray(x, dtype=float)
    if not np.isscalar(radius):
        radius = int(np.max(radius))
    frames = np.moveaxis(x, velocity_axis, 0)
    nd = frames.ndim - 1  # frame dims
    axes = tuple(ax % x.ndim for ax in np.atleast_1d(flow_axes))
    v_ax = velocity_axis % x.ndim
    frame_axes = tuple(ax - 1 if ax > v_ax else ax for ax in axes)
    return solve_flow_field(frames, flow_axes=tuple(a - nd for a in frame_axes),
                            bidirectional=bidirectional, radius=radius,
                            **kwargs)


def align_to_reference_1d(x, flow_field, velocity_axis, flow_axes,
                          reference_index):
    """Warp every slice along velocity_axis onto the reference slice using a
    precomputed flow field (reference flow.py align_to_reference_1d)."""
    x = np.asarray(x, dtype=float)
    frames = np.moveaxis(x, velocity_axis, 0)
    axes = tuple(ax % x.ndim for ax in np.atleast_1d(flow_axes))
    v_ax = velocity_axis % x.ndim
    nd = frames.ndim - 1
    frame_axes = tuple((ax - 1 if ax > v_ax else ax) - nd for ax in axes)
    aligned, _ = align_to_reference(frames, ref_index=reference_index,
                                    flow_axes=frame_axes, flows=flow_field)
    return np.moveaxis(aligned, 0, velocity_axis)


# ------------------------------------------------------------------
# Warp-order planning over sparse occupancy grids
# (reference flow.py:294-364: warp_step_cost / warp_path_cost /
# solve_warp_axis_order). When warping through psi-space with missing
# observations, the cost of a unit step along an axis depends on whether
# the destination cell (or, failing that, the cell one step beyond it)
# holds a fitted group; the total cost of an axis-ordered Manhattan path
# ranks candidate warp orders.
# ------------------------------------------------------------------
def warp_step_cost(group_exists, start, direction, axis):
    """Cost of one unit step along ``axis`` from ``start``: 1 if the
    destination cell is occupied, 2 if it is empty but the next cell in the
    same direction is occupied (hop over a gap), inf otherwise."""
    group_exists = np.asarray(group_exists, dtype=bool)
    start = tuple(int(c) for c in start)
    dest = start[axis] + int(direction)
    if not (0 <= dest < group_exists.shape[axis]):
        return np.inf
    dest_coords = start[:axis] + (dest,) + start[axis + 1:]
    if group_exists[dest_coords]:
        return 1.0
    beyond = dest + int(direction)
    if 0 <= beyond < group_exists.shape[axis]:
        beyond_coords = start[:axis] + (beyond,) + start[axis + 1:]
        if group_exists[beyond_coords]:
            return 2.0
    return np.inf


def warp_path_cost(group_exists, start_coords, end_coords, axis_order):
    """Total step cost of the Manhattan path from start to end that
    exhausts each axis fully in the order given; returns
    (cost, step_start_coords)."""
    pos = [int(c) for c in start_coords]
    cost = 0.0
    steps = []
    for axis in axis_order:
        end = int(end_coords[axis])
        direction = int(np.sign(end - pos[axis]))
        while pos[axis] != end:
            steps.append(list(pos))
            cost += warp_step_cost(group_exists, tuple(pos), direction, axis)
            pos[axis] += direction
    return cost, steps


def solve_warp_axis_order(group_exists, start_coords, end_coords):
    """Brute-force the axis permutation with the cheapest Manhattan warp
    path; returns (best_axis_order, cost, step_start_coords)."""
    from itertools import permutations
    best = None
    for order in permutations(range(np.ndim(group_exists))):
        cost, steps = warp_path_cost(group_exists, start_coords, end_coords,
                                     order)
        if best is None or cost < best[1]:
            best = (order, cost, steps)
    return best
