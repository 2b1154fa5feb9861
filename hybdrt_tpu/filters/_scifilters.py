"""Center-excluded ("empty") gaussian filters and 1-D gaussian Laplacian.

The empty filter estimates each pixel from its neighborhood *excluding* the
pixel itself, which drives outlier-downweighting in the iterative filters
(reference hybdrt/filters/_scifilters.py, adapted from scipy internals there;
implemented here directly with correlate1d over explicit kernels).
"""
import numpy as np
from scipy import ndimage


def _gaussian_kernel1d(sigma, order, radius, empty=False):
    x = np.arange(-radius, radius + 1, dtype=float)
    phi = np.exp(-0.5 * (x / sigma) ** 2)
    if empty:
        phi[radius] = 0.0
    phi = phi / phi.sum()
    if order == 0:
        return phi
    if order == 1:
        return phi * (-x / sigma ** 2)
    if order == 2:
        return phi * ((x ** 2 / sigma ** 2 - 1) / sigma ** 2)
    raise ValueError(f"order {order} not supported")


def empty_gaussian_filter1d(input, sigma, axis=-1, order=0, output=None, mode="reflect",
                            cval=0.0, truncate=4.0):
    """Gaussian filter along one axis with the center pixel excluded."""
    input = np.asarray(input, dtype=float)
    radius = int(float(sigma) * truncate + 0.5)
    kernel = _gaussian_kernel1d(sigma, order, radius, empty=True)[::-1]
    return ndimage.correlate1d(input, kernel, axis=axis, output=output, mode=mode,
                               cval=cval)


def empty_gaussian_filter(input, sigma, order=0, output=None, mode="reflect", cval=0.0,
                          truncate=4.0):
    """N-D center-excluded gaussian: the full N-D kernel with the single center
    tap removed (NOT separable; computed via correlate with an explicit kernel
    for small radii, falling back to a sequence difference for large ones)."""
    input = np.asarray(input, dtype=float)
    if np.isscalar(sigma):
        sigma = [sigma] * input.ndim
    radii = [int(float(s) * truncate + 0.5) for s in sigma]
    # Build separable kernels and form the dense N-D kernel
    kernels = [np.exp(-0.5 * (np.arange(-r, r + 1) / s) ** 2)
               for s, r in zip(sigma, radii)]
    full = kernels[0]
    for k in kernels[1:]:
        full = np.multiply.outer(full, k)
    center = tuple(r for r in radii)
    full[center] = 0.0
    full = full / full.sum()
    return ndimage.correlate(input, full, output=output, mode=mode, cval=cval)


def generic_laplace1d(input, derivative2, axis=-1, output=None, mode="reflect",
                      cval=0.0, **kwargs):
    return derivative2(input, axis, output, mode, cval, **kwargs)


def laplace1d(input, axis=-1, output=None, mode="reflect", cval=0.0):
    return ndimage.correlate1d(np.asarray(input, dtype=float), np.array([1.0, -2.0, 1.0]),
                               axis=axis, output=output, mode=mode, cval=cval)


def gaussian_laplace1d(input, sigma, axis=-1, output=None, mode="reflect", cval=0.0,
                       **kwargs):
    """Second derivative of a gaussian-smoothed array along one axis."""
    return ndimage.gaussian_filter1d(np.asarray(input, dtype=float), sigma, axis=axis,
                                     order=2, output=output, mode=mode, cval=cval,
                                     **kwargs)
