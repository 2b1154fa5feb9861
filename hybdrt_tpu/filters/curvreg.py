"""Curvature-regularizing image filters (reference hybdrt/filters/curvreg.py,
after Gong & Sbalzarini, IEEE TIP 2017, doi:10.1109/TIP.2017.2658954).

Each sweep projects every pixel onto the locally flattest of a family of
minimal-curvature configurations (Gaussian or mean curvature) — the update is
the smallest-magnitude projection distance. The reference iterates over a
4-color checkerboard domain decomposition so updates within a color are
independent; here each color step is a fully vectorized masked stencil update
on the padded image, jitted as one XLA program with a lax.fori_loop over
sweeps (no per-pixel Python).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _domain_masks(nr, nc):
    """Four checkerboard color masks (reference curvreg.py:5-22)."""
    i = np.arange(nr)[:, None]
    j = np.arange(nc)[None, :]
    bt = (i % 2 == 0) & (j % 2 == 0)
    wt = (i % 2 == 0) & (j % 2 == 1)
    bc = (i % 2 == 1) & (j % 2 == 1)
    wc = (i % 2 == 1) & (j % 2 == 0)
    return bt, wt, bc, wc


def decompose_domain(img):
    """Four-color checkerboard domain decomposition as meshgrid index sets
    (bt, wt, bc, wc), enabling parallel red-black curvature updates
    (reference curvreg.py decompose_domain; the jitted filter here uses the
    equivalent boolean masks from _domain_masks)."""
    nr, nc = np.shape(img)
    t_rows, c_rows = np.arange(0, nr, 2), np.arange(1, nr, 2)
    return (np.meshgrid(t_rows, np.arange(0, nc, 2)),
            np.meshgrid(t_rows, np.arange(1, nc, 2)),
            np.meshgrid(c_rows, np.arange(1, nc, 2)),
            np.meshgrid(c_rows, np.arange(0, nc, 2)))


def _neighbors(u):
    """Shifted interior views of the padded image: center and 8 neighbors."""
    c = u[1:-1, 1:-1]
    n = u[:-2, 1:-1]   # i-1, j
    s = u[2:, 1:-1]    # i+1, j
    w = u[1:-1, :-2]   # i, j-1
    e = u[1:-1, 2:]    # i, j+1
    nw = u[:-2, :-2]
    ne = u[:-2, 2:]
    sw = u[2:, :-2]
    se = u[2:, 2:]
    return c, n, s, w, e, nw, ne, sw, se


def min_projection_distance(u_pad, curv_type="gc"):
    """Smallest-|d| projection distance for every interior pixel
    (reference curvreg.py:25-74, vectorized over the full image)."""
    c, n, s, w, e, nw, ne, sw, se = _neighbors(u_pad)
    if curv_type == "gc":
        d = jnp.stack([
            0.5 * (n + s) - c,
            0.5 * (w + e) - c,
            0.5 * (nw + se) - c,
            0.5 * (ne + sw) - c,
            n + w - nw - c,
            n + e - ne - c,
            w + s - sw - c,
            e + s - se - c,
        ])
    elif curv_type == "mc":
        d = jnp.stack([
            (5 / 16) * (n + s) + (5 / 8) * e - (1 / 8) * (ne + se) - c,
            (5 / 16) * (n + s) + (5 / 8) * w - (1 / 8) * (nw + sw) - c,
            (5 / 16) * (w + e) + (5 / 8) * n - (1 / 8) * (nw + ne) - c,
            (5 / 16) * (w + e) + (5 / 8) * s - (1 / 8) * (sw + se) - c,
        ])
    else:
        raise ValueError(f"Invalid curv_type {curv_type}")
    amin = jnp.argmin(jnp.abs(d), axis=0)
    return jnp.take_along_axis(d, amin[None], axis=0)[0]


def pad_image(img, mode="reflect", cval=0.0):
    """One-pixel border pad with corner averaging (reference curvreg.py:77-110)."""
    img = jnp.asarray(img)
    if mode == "reflect":
        pad = jnp.pad(img, 1, mode="reflect")
    elif mode == "nearest":
        pad = jnp.pad(img, 1, mode="edge")
    elif mode == "wrap":
        pad = jnp.pad(img, 1, mode="wrap")
    elif mode == "constant":
        pad = jnp.pad(img, 1, mode="constant", constant_values=cval)
    else:
        raise ValueError(f"Invalid mode {mode}")
    # Corners: average of the two adjacent border pixels
    pad = pad.at[0, 0].set(0.5 * (pad[0, 1] + pad[1, 0]))
    pad = pad.at[-1, 0].set(0.5 * (pad[-1, 1] + pad[-2, 0]))
    pad = pad.at[0, -1].set(0.5 * (pad[0, -2] + pad[1, -1]))
    pad = pad.at[-1, -1].set(0.5 * (pad[-1, -2] + pad[-2, -1]))
    return pad


@partial(jax.jit, static_argnames=("n_iter", "curv_type", "mode"))
def _cr_filter_jit(img, n_iter, curv_type, mode, cval):
    u = pad_image(img, mode, cval)
    masks = [jnp.asarray(m) for m in _domain_masks(*img.shape)]

    def sweep(_, u):
        for mask in masks:
            du = min_projection_distance(u, curv_type=curv_type)
            u = u.at[1:-1, 1:-1].add(jnp.where(mask, du, 0.0))
        return u

    u = jax.lax.fori_loop(0, n_iter, sweep, u)
    return u[1:-1, 1:-1]


def cr_filter(img, n_iter=10, curv_type="gc", mode="reflect", cval=0.0):
    """Curvature-regularizing filter (reference curvreg.py:113-125).

    curv_type 'gc' drives Gaussian curvature toward zero (developable
    surfaces); 'mc' drives mean curvature toward zero (minimal surfaces).
    """
    img = jnp.asarray(np.asarray(img, dtype=float))
    if img.ndim != 2:
        raise ValueError("cr_filter expects a 2-D image")
    return np.asarray(_cr_filter_jit(img, int(n_iter), curv_type, mode, float(cval)))
