"""Distribution of capacitive times (DCT): DRT variant for blocking-electrode
(capacitive) data, obtained by sign-inverting the response/impedance matrices
(reference hybdrt/models/dct.py)."""
import numpy as np

from .drt import DRT


def should_invert(m):
    return np.max(np.asarray(m).real) > 0


def invert_mat(m, inplace=False):
    if m is None:
        return m
    m = np.asarray(m)
    if should_invert(m):
        if inplace:
            m *= -1
        else:
            m = m * -1
    return m


class DCT(DRT):
    """DRT subclass for capacitive (blocking) systems."""

    # Predictions must match the inverted fit matrices
    # (reference dct.py:49-66 inverts the prediction matrices)
    _dist_matrix_sign = -1.0

    def _get_impedance_pred_matrix(self, frequencies):
        """Apply the conditional inversion to prediction matrices: the base
        getter's contract is 'caller multiplies by _dist_matrix_sign', which
        is only correct when the matrix was actually inverted at fit time
        (should_invert). A fit-matrix slice already carries the fit-time
        conditional decision; a freshly built (or cached-build) matrix gets
        the conditional inversion here (reference dct.py:49-66)."""
        m = super()._get_impedance_pred_matrix(frequencies)
        if getattr(self, "_pred_from_fit_matrices", False):
            return m
        return -invert_mat(np.asarray(m))

    def _get_response_pred_matrix(self, times, step_times, step_sizes,
                                  tau_rise):
        m = super()._get_response_pred_matrix(times, step_times, step_sizes,
                                              tau_rise)
        if getattr(self, "_pred_from_fit_matrices", False):
            return m
        return -invert_mat(np.asarray(m))

    def _prep_for_fit(self, *args, **kwargs):
        data, mat = super()._prep_for_fit(*args, **kwargs)
        (rm_drt, induc_rv, inf_rv, cap_rv, rm_dop, zm_drt, induc_zv, cap_zv, zm_dop,
         penalty_matrices) = mat
        rm_drt = invert_mat(rm_drt)
        rm_dop = invert_mat(rm_dop)
        zm_drt = invert_mat(zm_drt)
        zm_dop = invert_mat(zm_dop)
        for name in ("response", "impedance", "rm_dop", "zm_dop"):
            if self.fit_matrices.get(name) is not None:
                invert_mat(self.fit_matrices[name], True)
        return data, (rm_drt, induc_rv, inf_rv, cap_rv, rm_dop, zm_drt, induc_zv,
                      cap_zv, zm_dop, penalty_matrices)


def preprocess(frequencies, z, drt: DRT, **kw):
    """Remove inductive/capacitive contributions from the data before a DCT
    fit (reference dct.py:83)."""
    drt.fit_eis(frequencies, z, **kw)
    z_offset = drt.predict_z(frequencies, include_drt=False, include_ohmic=False,
                             include_dop=False)
    return z - z_offset
