"""Discrete equivalent-circuit element models.

Re-design of reference hybdrt/models/elements.py: the element library
(R, L, C, CPE, RC, ZARC/RQ, Havriliak-Negami, RPQ) is written in jnp so model
impedance/response functions are differentiable; fitting uses the JAX
Levenberg-Marquardt solver with autodiff Jacobians and logit constraint
transforms (reference uses scipy least_squares with hand-written Jacobians,
elements.py:2301-2336); LLH/BIC/LML use autodiff Hessians for the Laplace
approximation (reference uses numeric differencing, elements.py:1227-1341).
"""
import re

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..ops.lm import levenberg_marquardt
from ..utils.device import on_host
from ..ops import mittag_leffler as ml


# ------------------------------------------------------------------
# Element library (reference elements.py:1838-2186)
# ------------------------------------------------------------------
ELEMENT_PARAMETERS = {
    "HN": (["R", "lntau", "alpha", "beta"],
           [(-np.inf, np.inf), (-np.inf, np.inf), (0, 1), (0, 1)]),
    "RQ": (["R", "lntau", "beta"],
           [(-np.inf, np.inf), (-np.inf, np.inf), (0, 1)]),
    "RC": (["R", "lntau"], [(-np.inf, np.inf), (-np.inf, np.inf)]),
    "L": (["lnL"], [(-np.inf, np.inf)]),
    "R": (["R"], [(-np.inf, np.inf)]),
    "C": (["Cinv"], [(0, np.inf)]),
    "P": (["P", "nu"], [(0, np.inf), (-1, 1)]),
    "RPQ": (["R", "lnP", "nu", "lnQinv", "beta"],
            [(-np.inf, np.inf), (-np.inf, np.inf), (-1, 1), (-np.inf, np.inf), (-1, 1)]),
}


def element_parameters(element_type):
    try:
        return ELEMENT_PARAMETERS[element_type]
    except KeyError:
        raise ValueError(f"Invalid element {element_type}")


def element_impedance_function(element_type):
    """Differentiable complex impedance Z(f; params)."""
    if element_type == "HN":
        def z_func(freq, r, ln_tau, alpha, beta):
            omega = 2 * jnp.pi * freq
            return r / (1 + (1j * omega * jnp.exp(ln_tau)) ** beta) ** alpha
    elif element_type == "RQ":
        def z_func(freq, r, ln_tau, beta):
            omega = 2 * jnp.pi * freq
            return r / (1 + (1j * omega * jnp.exp(ln_tau)) ** beta)
    elif element_type == "RC":
        def z_func(freq, r, ln_tau):
            omega = 2 * jnp.pi * freq
            return r / (1 + 1j * omega * jnp.exp(ln_tau))
    elif element_type == "L":
        def z_func(freq, ln_induc):
            return 1j * 2 * jnp.pi * freq * jnp.exp(ln_induc)
    elif element_type == "R":
        def z_func(freq, r):
            return r * jnp.ones_like(jnp.asarray(freq)) + 0j
    elif element_type == "C":
        def z_func(freq, c_inv):
            return 1j * c_inv / (2 * jnp.pi * freq)
    elif element_type == "P":
        def z_func(freq, p, nu):
            return p * (1j * 2 * jnp.pi * freq) ** nu
    elif element_type == "RPQ":
        def z_func(freq, r, lnp, nu, lnqinv, beta):
            omega = 2 * jnp.pi * freq
            z_rp = r + jnp.exp(lnp) * (1j * omega) ** nu
            z_q = jnp.exp(lnqinv) * (1j * omega) ** (-beta)
            return 1 / (1 / z_q + 1 / z_rp)
    else:
        raise ValueError(f"Invalid element {element_type}")
    return z_func


def element_distribution_function(element_type):
    """gamma(tau) of the element (reference elements.py:1870-1906)."""
    if element_type == "HN":
        def gamma(tau, r, ln_tau, alpha, beta):
            tr = (jnp.asarray(tau) / jnp.exp(ln_tau)) ** beta
            theta = jnp.arctan2(jnp.sin(jnp.pi * beta), tr + jnp.cos(jnp.pi * beta))
            nume = r * tr ** alpha * jnp.sin(alpha * theta)
            deno = jnp.pi * (1 + 2 * jnp.cos(jnp.pi * beta) * tr + tr ** 2) ** (alpha / 2)
            return nume / deno
    elif element_type == "RQ":
        def gamma(tau, r, ln_tau, beta):
            y = jnp.log(jnp.asarray(tau)) - ln_tau
            return r * jnp.sin((1 - beta) * jnp.pi) / (
                2 * jnp.pi * (jnp.cosh(beta * y) - jnp.cos((1 - beta) * jnp.pi)))
    elif element_type == "RC":
        def gamma(tau, r, ln_tau):
            tau = jnp.asarray(tau)
            return jnp.where(jnp.log(tau) == ln_tau, jnp.inf * jnp.sign(r), 0.0)
    elif element_type in ("R", "L", "C", "P", "RPQ"):
        def gamma(tau, *args):
            return jnp.zeros_like(jnp.asarray(tau, dtype=float))
    else:
        raise ValueError(f"Invalid element {element_type}")
    return gamma


def element_distribution_is_singular(element_type, *args, return_info=False):
    status, info = False, None
    if element_type in ("HN", "RQ"):
        beta = args[3] if element_type == "HN" else args[2]
        if beta >= 1 - 1e-5:
            status, info = True, (args[0], np.exp(args[1]))
    elif element_type == "RC":
        status, info = True, (args[0], np.exp(args[1]))
    if return_info:
        return status, info
    return status


def element_distribution_integral_function(element_type):
    """Cumulative distribution mass M(tau) = integral of gamma d(ln tau) up
    to tau (reference elements.py). Singular cases use closed forms: RC is
    a step of height r at tau0; singular RQ reduces to RC; singular HN
    (beta ~ 1, Davidson-Cole) uses the hypergeometric closed form."""
    def numeric_integral(el_type, tau, *args):
        if element_distribution_is_singular(el_type, *args):
            raise ValueError(f"Element {el_type} with args {args} is "
                             f"singular; analytical integral required")
        from scipy.integrate import cumulative_trapezoid
        gamma_f = element_distribution_function(el_type)
        gamma = np.asarray(gamma_f(jnp.asarray(tau), *args))
        cum = cumulative_trapezoid(gamma, x=np.log(np.asarray(tau)), initial=0)
        return np.minimum(cum, args[0])  # clamp near-singular overshoot

    def rc_integral(tau, r, ln_tau):
        y = np.log(np.asarray(tau, dtype=float)) - ln_tau
        return np.where(y >= 0, r, 0.0)

    if element_type == "RC":
        return rc_integral
    if element_type == "RQ":
        def integral(tau, r, ln_tau, beta):
            if element_distribution_is_singular("RQ", r, ln_tau, beta):
                return rc_integral(tau, r, ln_tau)
            return numeric_integral("RQ", tau, r, ln_tau, beta)
        return integral
    if element_type == "HN":
        def integral(tau, r, ln_tau, alpha, beta):
            if element_distribution_is_singular("HN", r, ln_tau, alpha, beta):
                # Davidson-Cole: mass below tau0 via 2F1, all mass by tau0
                from scipy import special
                y = np.log(np.asarray(tau, dtype=float)) - ln_tau
                out = np.full(np.shape(y), float(r))
                pre = y < 0
                yp = y[pre]
                factor = -r * np.sin(np.pi * alpha) / (np.pi * alpha)
                out[pre] = (factor * (np.exp(yp) - 1) * np.exp(alpha * yp)
                            * np.abs(np.exp(yp) - 1) ** (-alpha)
                            * special.hyp2f1(1, 1, alpha + 1, np.exp(yp)))
                return out
            return numeric_integral("HN", tau, r, ln_tau, alpha, beta)
        return integral

    def integral(tau, *args):
        return numeric_integral(element_type, tau, *args)
    return integral


def element_relaxation_mass_function(element_type):
    """Incremental relaxation mass per tau-grid interval (zero-padded to
    grid length); robust to singular distributions
    (reference elements.py)."""
    integral_func = element_distribution_integral_function(element_type)

    def mass(tau, *args):
        cum = integral_func(tau, *args)
        return np.concatenate([[0], np.diff(cum)])
    return mass


def model_mass_function(model_string):
    """Summed incremental relaxation mass of all elements in a model
    (reference elements.py)."""
    funcs, slices = [], []
    start = 0
    for name in model_string.split("-"):
        etype, _ = parse_element_string(name)
        p_types, _bounds = element_parameters(etype)
        funcs.append(element_relaxation_mass_function(etype))
        slices.append((start, start + len(p_types)))
        start += len(p_types)

    def mass_model(tau, *args):
        out = np.zeros(len(np.atleast_1d(tau)))
        for f, (i0, i1) in zip(funcs, slices):
            out = out + f(tau, *args[i0:i1])
        return out
    return mass_model


def element_voltage_function(element_type, step_model="ideal"):
    """Unit-current-step response (reference elements.py:2097-2186)."""
    if step_model != "ideal":
        raise ValueError("Element voltage responses require ideal current steps")

    def active(times, vals):
        times = jnp.asarray(times)
        return jnp.where(times > 0, vals, 0.0)

    if element_type == "RQ":
        def v_func(times, r, ln_tau, beta):
            times = jnp.asarray(times)
            tr = jnp.where(times > 0, times, 1.0) / jnp.exp(ln_tau)
            trb = tr ** beta
            return active(times, r * trb * ml.mittag_leffler_neg(trb, beta, beta + 1))
    elif element_type == "RC":
        def v_func(times, r, ln_tau):
            times = jnp.asarray(times)
            tr = jnp.where(times > 0, times, 0.0) / jnp.exp(ln_tau)
            return active(times, r * (1 - jnp.exp(-tr)))
    elif element_type == "L":
        def v_func(times, ln_induc):
            return jnp.zeros_like(jnp.asarray(times, dtype=float))
    elif element_type == "R":
        def v_func(times, r):
            return active(times, r * jnp.ones_like(jnp.asarray(times, dtype=float)))
    elif element_type == "C":
        def v_func(times, c_inv):
            return active(times, c_inv * jnp.asarray(times))
    elif element_type == "P":
        def v_func(times, p, nu):
            times = jnp.asarray(times)
            ts = jnp.where(times > 0, times, 1.0)
            return active(times, p * ts ** (-nu) * jnp.exp(-gammaln(1 - nu)))
    elif element_type == "HN":
        # Z(s) = R/(1+(s tau)^beta)^alpha; the unit-step response follows from
        # the Prabhakar Laplace pair L[t^{B-1} E^g_{b,B}(-l t^b)] =
        # s^{bg-B}/(s^b+l)^g with g=alpha, B=alpha*beta+1, l=tau^-beta:
        # V(t) = R (t/tau)^{alpha beta} E^alpha_{beta, alpha beta + 1}(-(t/tau)^beta).
        # (The reference leaves this unimplemented: elements.py:2102-2107.)
        def v_func(times, r, ln_tau, alpha, beta):
            times = jnp.asarray(times)
            tr = jnp.where(times > 0, times, 1.0) / jnp.exp(ln_tau)
            trb = tr ** beta
            return active(times, r * trb ** alpha
                          * ml.prabhakar_ml_neg(trb, beta, alpha * beta + 1, alpha))
    else:
        raise ValueError(f"Invalid element {element_type}")
    return v_func


# ------------------------------------------------------------------
# Model string parsing (reference elements.py:2188-2260)
# ------------------------------------------------------------------
def parse_element_string(element_string):
    id_match = re.search(r"\d", element_string)
    if id_match is None:
        raise ValueError(f"No ID in element string {element_string}")
    i = id_match.start()
    return element_string[:i], int(element_string[i:])


def parse_model_string(model_string):
    element_names = model_string.split("-")
    if len(element_names) > len(set(element_names)):
        raise ValueError("Model contains duplicate elements")
    parameter_types, parameter_names, parameter_bounds = [], [], []
    element_types, parameter_indices = [], []
    start = 0
    for el in element_names:
        el_type, _ = parse_element_string(el)
        p_types, bounds = element_parameters(el_type)
        parameter_types += p_types
        parameter_names += [f"{pt}_{el}" for pt in p_types]
        parameter_bounds += bounds
        element_types.append(el_type)
        parameter_indices.append((start, start + len(p_types)))
        start += len(p_types)
    return (element_names, element_types, parameter_types, parameter_names,
            parameter_bounds, parameter_indices)


def model_impedance_function(model_string):
    _, el_types, _, _, _, p_idx = parse_model_string(model_string)
    z_funcs = [element_impedance_function(t) for t in el_types]

    def z_model(freq, *args):
        z = 0
        for i, zf in enumerate(z_funcs):
            z = z + zf(freq, *args[p_idx[i][0]:p_idx[i][1]])
        return z
    return z_model


def model_voltage_function(model_string, step_model="ideal"):
    _, el_types, _, _, _, p_idx = parse_model_string(model_string)
    v_funcs = [element_voltage_function(t, step_model) for t in el_types]

    def v_model(times, *args):
        v = 0
        for i, vf in enumerate(v_funcs):
            v = v + vf(times, *args[p_idx[i][0]:p_idx[i][1]])
        return v
    return v_model


def model_distribution_function(model_string):
    _, el_types, _, _, _, p_idx = parse_model_string(model_string)
    g_funcs = [element_distribution_function(t) for t in el_types]

    def gamma_model(tau, *args):
        g = 0
        for i, gf in enumerate(g_funcs):
            g = g + gf(tau, *args[p_idx[i][0]:p_idx[i][1]])
        return g
    return gamma_model


# ------------------------------------------------------------------
# Constraint transforms (reference elements.py:2301-2360)
# ------------------------------------------------------------------
def constraint_transform(x, bounds, inverse):
    """Scalar logit constraint transform (reference elements.py:2278).
    inverse=True maps unbounded -> bounded space."""
    lb = max(bounds[0], -1e6)
    ub = min(bounds[1], 1e6)
    if inverse:
        e = np.exp(x)
        return (ub * e + lb) / (1 + e)
    return np.log((x - lb) / (ub - x))


def scale_parameter_to_data(x, parameter_type, rp_scale, inverse):
    """Scale one parameter between data-normalized and physical units
    (reference elements.py:2357)."""
    if parameter_type in ("R", "P", "Cinv"):
        return x * rp_scale if inverse else x / rp_scale
    if parameter_type == "lnL":
        return x + np.log(rp_scale) if inverse else x - np.log(rp_scale)
    return x


def get_constraint_transforms(bounds, max_bound=1e6):
    """Vectorized logit transform pair mapping bounded params <-> R^n."""
    lb = jnp.asarray([max(b[0], -max_bound) for b in bounds])
    ub = jnp.asarray([min(b[1], max_bound) for b in bounds])

    def transform(x):
        return jnp.log((x - lb) / (ub - x))

    def inverse_transform(y):
        e = jnp.exp(y)
        return (ub * e + lb) / (1 + e)

    return transform, inverse_transform


# ------------------------------------------------------------------
# DiscreteElementModel (reference elements.py:23)
# ------------------------------------------------------------------
class DiscreteElementModel:
    """Equivalent-circuit model described by a string like 'R0-L0-HN1-HN2'."""

    def __init__(self, model_string, step_model="ideal"):
        self.model_string = model_string
        (self.element_names, self.element_types, self.parameter_types,
         self.parameter_names, self.parameter_bounds, self.parameter_indices) = \
            parse_model_string(model_string)
        self.step_model = step_model
        self.z_function = model_impedance_function(model_string)
        self.gamma_function = model_distribution_function(model_string)
        try:
            self.v_function = model_voltage_function(model_string, step_model)
        except (ValueError, NotImplementedError):
            self.v_function = None

        self.parameter_values = None
        self.fit_result = None
        self.f_fit = None
        self.z_fit = None
        self.weights = None
        self.drt_estimates = None
        self.hess_ = None
        # Data-scaling state (reference elements.py:545-612). This
        # implementation fits in physical units with explicit residual
        # weighting, so rp_scale stays 1 unless scale_data() is called.
        self.rp_scale = 1.0
        self.scaled_bounds = None
        self.prior_params = None

    @property
    def num_params(self):
        return len(self.parameter_names)

    # ------------------------------------------------------------------
    @classmethod
    def from_drt(cls, drt, model_string=None, element_types="HN", peak_kw=None,
                 min_peak_r=None, x=None, peak_tau=None, x_raw=None, tau=None,
                 peak_indices=None, drt_element=None):
        """Initialize a discrete model from a DRT fit's peak decomposition
        (reference elements.py:90). Optionally use an explicit raw parameter
        vector ``x`` and/or candidate ``peak_tau`` (dual-inversion path).

        Reference-compatible aliases so ``from_drt(drt, tau=tau_eval,
        peak_indices=..., drt_element="RQ")`` works as in the reference:
        ``x_raw`` = ``x``, ``drt_element`` = ``element_types``; passing
        ``tau`` + ``peak_indices`` (e.g. from ``find_peaks(return_info=True)``)
        skips internal peak finding and uses those peak locations."""
        from .. import peaks as peaks_mod
        if peak_kw is None:
            peak_kw = {}
        if x_raw is not None:
            x = x_raw
        if drt_element is not None:
            element_types = drt_element
        fit_params = drt.fit_parameters if x is None \
            else drt.extract_qphb_parameters(np.asarray(x))
        x_drt = fit_params["x"]
        if tau is not None and peak_indices is not None:
            tau_grid = np.asarray(tau, dtype=float)
            peak_indices = np.asarray(peak_indices)
            peak_tau = tau_grid[peak_indices]
        elif peak_tau is None:
            peak_tau, tau_grid, peak_indices, _ = drt.find_peaks(
                x=x_drt, return_info=True, **peak_kw)
        else:
            tau_grid = drt.get_tau_eval(10) if tau is None \
                else np.asarray(tau, dtype=float)
            peak_indices = None
        if len(peak_tau) == 0:
            raise ValueError("No peaks found to initialize discrete model")
        x_peaks = drt.estimate_peak_coef(tau=tau_grid, peak_indices=peak_indices,
                                         x=x_drt, peak_tau=peak_tau if peak_indices is None else None)
        f_peaks = [drt.predict_distribution(tau_grid, x=xp) for xp in x_peaks]

        n_peaks = len(peak_tau)
        if isinstance(element_types, str):
            element_types = [element_types] * n_peaks
        peak_params = peaks_mod.estimate_peak_params(tau_grid, element_types,
                                                     f_peaks=f_peaks)

        # Optionally drop tiny peaks
        if min_peak_r is not None:
            keep = [i for i, p in enumerate(peak_params) if abs(p[0]) >= min_peak_r]
            peak_params = [peak_params[i] for i in keep]
            element_types = [element_types[i] for i in keep]

        if model_string is None:
            parts = []
            if drt.fit_ohmic:
                parts.append("R0")
            if drt.fit_inductance:
                parts.append("L0")
            parts += [f"{t}{i + 1}" for i, t in enumerate(element_types)]
            model_string = "-".join(parts)

        model = cls(model_string)
        x0 = []
        peak_iter = iter(peak_params)
        for el_name, el_type in zip(model.element_names, model.element_types):
            if el_type == "R":
                x0.append(max(fit_params.get("R_inf", 1e-6), 1e-8))
            elif el_type == "L":
                induc = fit_params.get("inductance", 1e-9)
                x0.append(np.log(max(induc, 1e-12)))
            elif el_type == "C":
                x0.append(max(fit_params.get("C_inv", 1e-6), 1e-10))
            else:
                x0.extend(next(peak_iter))
        model.parameter_values = np.array(x0, dtype=float)
        # Store the DRT's error structure to weight the discrete fit
        z_sigma = drt.fit_parameters.get("z_sigma_tot")
        if z_sigma is not None:
            model.drt_estimates = {"z_sigma": z_sigma,
                                   "f_fit": drt.get_fit_frequencies()}
        return model

    # ------------------------------------------------------------------
    def get_parameter_values(self, x=None):
        x = self.parameter_values if x is None else np.asarray(x)
        if x is None:
            raise ValueError("Model has no parameter values; fit or initialize first")
        return x

    @on_host
    def predict_z(self, frequencies, x=None):
        x = self.get_parameter_values(x)
        return np.asarray(self.z_function(jnp.asarray(frequencies), *x))

    @on_host
    def predict_distribution(self, tau=None, x=None, ppd=20, return_tau=None):
        """Total model DRT gamma(tau). Returns gamma, or (gamma, tau) when the
        grid was auto-generated (tau=None) or return_tau=True."""
        x = self.get_parameter_values(x)
        if return_tau is None:
            return_tau = tau is None
        if tau is None:
            ln_t0 = [np.clip(x[self.parameter_indices[i][0] + 1], -46, 46) for i, t in
                     enumerate(self.element_types) if t in ("HN", "RQ", "RC")]
            lo = (min(ln_t0) if ln_t0 else -5) - 3 * np.log(10)
            hi = (max(ln_t0) if ln_t0 else 0) + 3 * np.log(10)
            tau = np.exp(np.linspace(lo, hi, int((hi - lo) / np.log(10) * ppd) + 1))
        gamma = np.asarray(self.gamma_function(jnp.asarray(tau), *x))
        if return_tau:
            return gamma, np.asarray(tau)
        return gamma

    # Reference-compatible alias (reference elements.py:1180)
    def predict_drt(self, tau, x=None):
        return self.predict_distribution(tau=tau, x=x, return_tau=False)

    def predict_element_drt(self, tau, element, x=None):
        """DRT of a single element (reference elements.py:1185)."""
        if isinstance(element, str):
            element = self.element_names.index(element)
        x = self.get_parameter_values(x)
        i0, i1 = self.parameter_indices[element]
        gf = element_distribution_function(self.element_types[element])
        return np.asarray(gf(jnp.asarray(tau), *x[i0:i1]))

    def predict_element_z(self, element, frequencies, x=None):
        """Impedance of a single element (reference elements.py:1126)."""
        if isinstance(element, str):
            element = self.element_names.index(element)
        x = self.get_parameter_values(x)
        i0, i1 = self.parameter_indices[element]
        zf = element_impedance_function(self.element_types[element])
        return np.asarray(zf(jnp.asarray(frequencies), *x[i0:i1]))

    @on_host
    def predict_response(self, times, step_times, step_sizes, x=None):
        if self.v_function is None:
            raise ValueError(f"Voltage response unavailable for model {self.model_string}")
        x = self.get_parameter_values(x)
        times = np.asarray(times)
        out = np.zeros(len(times))
        for st, sa in zip(np.atleast_1d(step_times), np.atleast_1d(step_sizes)):
            out = out + sa * np.asarray(self.v_function(jnp.asarray(times - st), *x))
        return out

    def predict_r_p(self, x=None):
        x = self.get_parameter_values(x)
        r_p = 0.0
        for i, t in enumerate(self.element_types):
            if t in ("HN", "RQ", "RC"):
                r_p += x[self.parameter_indices[i][0]]
        return r_p

    def predict_r_inf(self, x=None):
        x = self.get_parameter_values(x)
        r_inf = 0.0
        for i, t in enumerate(self.element_types):
            if t == "R":
                r_inf += x[self.parameter_indices[i][0]]
        return r_inf

    # -- singularity handling (reference elements.py:512-541,1202) ------
    def get_element_singular_status_list(self, x=None):
        """Per-element singular-distribution flags at the given (or fitted)
        parameter values (reference elements.py:525)."""
        x = self.get_parameter_values(x)
        return [element_distribution_is_singular(
            t, *x[self.parameter_indices[i][0]:self.parameter_indices[i][1]])
            for i, t in enumerate(self.element_types)]

    @property
    def is_singular(self):
        """True if any element's distribution is singular (delta-like)."""
        return any(self.get_element_singular_status_list())

    def get_singularity_info(self, x=None):
        """List of (mass R, location tau) for singular distribution
        elements; None if no singularities (reference elements.py:518)."""
        x = self.get_parameter_values(x)
        info = []
        for i, t in enumerate(self.element_types):
            i0, i1 = self.parameter_indices[i]
            singular, si = element_distribution_is_singular(
                t, *x[i0:i1], return_info=True)
            if singular:
                info.append(si)
        return info if info else None

    @property
    def singularity_info(self):
        return self.get_singularity_info()

    def predict_mass(self, tau, x=None):
        """Incremental relaxation mass per tau interval — the
        singularity-robust alternative to the distribution for scoring
        (reference elements.py:1202)."""
        x = self.get_parameter_values(x)
        if not hasattr(self, "_mass_function"):
            self._mass_function = model_mass_function(self.model_string)
        return self._mass_function(np.asarray(tau), *x)

    def evaluate_eis_residuals(self, x=None):
        """Complex fit residuals on the fitted spectrum
        (reference elements.py:1207)."""
        if self.f_fit is None or self.z_fit is None:
            raise ValueError("No fitted EIS data")
        return self.predict_z(self.f_fit, x=x) - self.z_fit

    def plot_mass(self, tau=None, x=None, ax=None, ppd=20, **kw):
        """Cumulative-interval relaxation mass plot (reference
        elements.py:1682)."""
        import matplotlib.pyplot as plt
        if tau is None:
            _, tau = self.predict_distribution(x=x, ppd=ppd, return_tau=True)
        mass = self.predict_mass(tau, x=x)
        if ax is None:
            _, ax = plt.subplots(figsize=(4, 3))
        ax.semilogx(tau, mass, **kw)
        ax.set_xlabel(r"$\tau$ (s)")
        ax.set_ylabel(r"mass ($\Omega$)")
        return ax

    # ------------------------------------------------------------------
    def _make_resid_fn(self, freq, z, weights):
        """Weighted complex-residual function over logit-transformed params."""
        transform, inv_transform = get_constraint_transforms(self.parameter_bounds)
        freq_j = jnp.asarray(freq)
        zv = jnp.concatenate([jnp.asarray(z.real), jnp.asarray(z.imag)])
        wv = jnp.asarray(weights)

        z_function = self.z_function

        def resid(y):
            x = inv_transform(y)
            z_hat = z_function(freq_j, *x)
            r = jnp.concatenate([jnp.real(z_hat), jnp.imag(z_hat)]) - zv
            return r * wv
        return resid, transform, inv_transform

    @on_host
    def fit_eis(self, frequencies, z, x0=None, weights=None, from_drt=None,
                max_iter=300, init_values=None, prior=False,
                prior_strength=None, scale_data=True):
        """Weighted nonlinear least-squares fit (LM with autodiff Jacobian).

        Reference-compatible extras (reference elements.py:616): ``init_values``
        aliases ``x0``; ``prior=True`` adds a Gaussian penalty pulling
        parameters toward the initial (from_drt) estimates with per-parameter
        weights ``prior_strength / |x0|`` (strength defaulted from the data
        weights as in the reference); ``scale_data`` is accepted for API
        compatibility — this implementation works in raw data space with
        explicit residual weighting, so it has no separate scaling step."""
        del scale_data  # handled via residual weighting; see docstring
        frequencies = np.asarray(frequencies)
        z = np.asarray(z)
        if x0 is None:
            x0 = init_values if init_values is not None \
                else self.get_parameter_values()
        x0 = np.asarray(x0, dtype=float)

        if weights is None:
            if self.drt_estimates is not None and \
                    len(self.drt_estimates["f_fit"]) == len(frequencies):
                sigma = self.drt_estimates["z_sigma"]
                weights = np.concatenate([1 / sigma.real, 1 / sigma.imag])
            else:
                # modulus weighting
                mod = np.abs(z)
                weights = np.concatenate([1 / mod, 1 / mod])
        elif np.isscalar(weights):
            weights = np.full(2 * len(frequencies), float(weights))

        resid_fn, transform, inv_transform = self._make_resid_fn(frequencies, z, weights)
        if prior:
            # Gaussian prior toward the initial estimates, scaled to the
            # parameter magnitudes (reference elements.py:683-700)
            if prior_strength is None:
                prior_strength = (np.mean(weights) * 0.05) ** 0.5
            prior_w = jnp.asarray(
                prior_strength / np.maximum(np.abs(x0), 1e-8))
            x0_prior = jnp.asarray(x0)
            self.prior_params = {"mu": np.asarray(x0, dtype=float),
                                 "weights": np.asarray(prior_w)}
            data_resid = resid_fn

            def resid_fn(y):
                r_prior = prior_w * (inv_transform(y) - x0_prior)
                return jnp.concatenate([data_resid(y), r_prior])
        # Nudge x0 strictly inside bounds for the logit transform
        lb = np.array([max(b[0], -1e6) for b in self.parameter_bounds])
        ub = np.array([min(b[1], 1e6) for b in self.parameter_bounds])
        margin = 1e-6 * (ub - lb)
        x0 = np.clip(x0, lb + margin, ub - margin)
        y0 = np.asarray(transform(jnp.asarray(x0)))

        result = levenberg_marquardt(resid_fn, jnp.asarray(y0), max_iter=max_iter)
        y_hat = np.asarray(result.x)
        self.parameter_values = np.asarray(inv_transform(jnp.asarray(y_hat)))
        self.fit_result = result
        self.f_fit = frequencies
        self.z_fit = z
        self.weights = np.asarray(weights)
        # Hessian in the *physical* parameter space for Laplace approximations
        resid_phys = self._make_phys_resid(frequencies, z, self.weights)
        jac = np.asarray(jax.jacfwd(resid_phys)(jnp.asarray(self.parameter_values)))
        self.hess_ = jac.T @ jac
        return self

    def _make_phys_resid(self, freq, z, weights):
        freq_j = jnp.asarray(freq)
        zv = jnp.concatenate([jnp.asarray(z.real), jnp.asarray(z.imag)])
        wv = jnp.asarray(weights)
        z_function = self.z_function

        def resid(x):
            z_hat = z_function(freq_j, *x)
            return (jnp.concatenate([jnp.real(z_hat), jnp.imag(z_hat)]) - zv) * wv
        return resid

    # ------------------------------------------------------------------
    # Multi-spectrum co-fit (reference elements.py:802-1016)
    # ------------------------------------------------------------------
    @on_host
    def fit_eis_multi(self, frequencies, z_list, x0=None, similarity_strength=1.0,
                      weights=None, max_iter=300):
        """Co-fit a sequence of neighboring spectra with a smoothness prior
        linking each spectrum's parameters to its neighbors.

        All spectra share the model structure and frequency grid; the joint
        problem (B x n_params) is solved as ONE Levenberg-Marquardt problem
        with autodiff Jacobians (the reference loops scipy least_squares with
        a similarity penalty, elements.py:988-1016).

        Stores parameter_values_multi (B, n_params); parameter_values is set
        to the mean. Returns self."""
        frequencies = np.asarray(frequencies)
        z_arr = np.stack([np.asarray(z) for z in z_list])
        b = z_arr.shape[0]
        n_p = self.num_params

        if x0 is None:
            x0 = self.get_parameter_values()
        x0 = np.asarray(x0, dtype=float)
        if x0.ndim == 1:
            x0 = np.tile(x0, (b, 1))

        if weights is None:
            mod = np.abs(z_arr)
            weights = np.concatenate([1 / mod, 1 / mod], axis=1)  # (B, 2F)

        transform, inv_transform = get_constraint_transforms(self.parameter_bounds)
        lb = np.array([max(bd[0], -1e6) for bd in self.parameter_bounds])
        ub = np.array([min(bd[1], 1e6) for bd in self.parameter_bounds])
        margin = 1e-6 * (ub - lb)
        x0 = np.clip(x0, lb + margin, ub - margin)
        y0 = np.stack([np.asarray(transform(jnp.asarray(row))) for row in x0])

        freq_j = jnp.asarray(frequencies)
        zv = jnp.concatenate([jnp.asarray(z_arr.real), jnp.asarray(z_arr.imag)], axis=1)
        wv = jnp.asarray(weights)
        z_function = self.z_function
        sim_w = jnp.sqrt(similarity_strength)

        def resid(y_flat):
            y = y_flat.reshape(b, n_p)
            x = jax.vmap(inv_transform)(y)
            z_hat = jax.vmap(lambda xi: z_function(freq_j, *xi))(x)
            r_data = (jnp.concatenate([jnp.real(z_hat), jnp.imag(z_hat)], axis=1)
                      - zv) * wv
            # Smoothness prior between neighboring spectra (in logit space)
            r_sim = sim_w * (y[1:] - y[:-1])
            return jnp.concatenate([r_data.ravel(), r_sim.ravel()])

        result = levenberg_marquardt(resid, jnp.asarray(y0.ravel()), max_iter=max_iter)
        y_hat = np.asarray(result.x).reshape(b, n_p)
        self.parameter_values_multi = np.stack(
            [np.asarray(inv_transform(jnp.asarray(row))) for row in y_hat])
        self.parameter_values = self.parameter_values_multi.mean(axis=0)
        self.fit_result = result
        self.f_fit = frequencies
        self.z_fit = z_arr
        self.weights = np.asarray(weights)
        # Gauss-Newton Hessian summed over spectra (each evaluated at its
        # own fitted parameter row), so llh/bic/lml work after a multi fit
        hess = np.zeros((self.num_params, self.num_params))
        for k in range(b):
            resid_k = self._make_phys_resid(frequencies, z_arr[k],
                                            self.weights[k])
            jac = np.asarray(jax.jacfwd(resid_k)(
                jnp.asarray(self.parameter_values_multi[k])))
            hess += jac.T @ jac
        self.hess_ = hess
        return self

    # ------------------------------------------------------------------
    # Model comparison metrics (reference elements.py:1227-1341)
    # ------------------------------------------------------------------
    @on_host
    def evaluate_rss(self, x=None):
        if np.ndim(self.z_fit) == 2:
            # Multi-spectrum co-fit: sum per-spectrum residuals, each at its
            # own fitted parameter row (or the supplied shared x)
            total = 0.0
            for k in range(self.z_fit.shape[0]):
                resid_k = self._make_phys_resid(self.f_fit, self.z_fit[k],
                                                self.weights[k])
                xk = self.parameter_values_multi[k] if x is None else x
                r = np.asarray(resid_k(jnp.asarray(xk)))
                total += float(r @ r)
            return total
        resid = self._make_phys_resid(self.f_fit, self.z_fit, self.weights)
        r = np.asarray(resid(jnp.asarray(self.get_parameter_values(x))))
        return float(r @ r)

    @on_host
    def evaluate_llh(self, x=None, weights=None, marginalize_weights=False,
                     alpha_0=1, beta_0=1, include_constants=False):
        """Gaussian log-likelihood of the fitted spectrum; with
        marginalize_weights=True the noise scale is marginalized under an
        inverse-gamma prior (reference elements.py:1228-1258)."""
        if weights is None:
            weights = self.weights
            rss = self.evaluate_rss(x)
        else:
            weights = np.asarray(weights)
            resid = self._make_phys_resid(self.f_fit, self.z_fit, weights)
            r = np.asarray(resid(jnp.asarray(self.get_parameter_values(x))))
            rss = float(r @ r)
        n = weights.size
        if marginalize_weights:
            from scipy import special
            alpha_n = alpha_0 - 1 + n / 2
            beta_n = beta_0 + 0.5 * rss
            llh = alpha_0 * np.log(beta_0) - alpha_n * np.log(beta_n) \
                + special.loggamma(alpha_n) - special.loggamma(alpha_0)
        else:
            llh = -0.5 * rss
        llh += np.sum(np.log(weights))
        if include_constants:
            llh -= 0.5 * n * np.log(2 * np.pi)
        return llh

    def evaluate_bic(self, x=None):
        llh = self.evaluate_llh(x)
        n = 2 * len(self.f_fit) * (self.z_fit.shape[0]
                                   if np.ndim(self.z_fit) == 2 else 1)
        return self.num_params * np.log(n) - 2 * llh

    @on_host
    def evaluate_lml(self, x=None, prior_scale=10.0):
        """Laplace approximation of the marginal likelihood using the autodiff
        Gauss-Newton Hessian and a broad gaussian prior."""
        x = self.get_parameter_values(x)
        llh = self.evaluate_llh(x, include_constants=True)
        h = self.hess_ + np.eye(self.num_params) / prior_scale ** 2
        h = np.nan_to_num(h, nan=0.0, posinf=1e300, neginf=-1e300)
        sign, logdet = np.linalg.slogdet(h / (2 * np.pi))
        if sign <= 0 or not np.isfinite(logdet):
            return -np.inf
        lp_prior = -0.5 * self.num_params * np.log(2 * np.pi * prior_scale ** 2) \
            - 0.5 * np.sum(x ** 2) / prior_scale ** 2
        return llh + lp_prior - 0.5 * logdet

    @on_host
    def estimate_param_cov(self):
        """Covariance from the Gauss-Newton Hessian."""
        return np.linalg.inv(self.hess_ + 1e-12 * np.eye(self.num_params))

    def get_time_constants(self, x=None):
        """tau_0 of each relaxation element."""
        x = self.get_parameter_values(x)
        taus = [np.exp(np.clip(x[self.parameter_indices[i][0] + 1], -700, 700))
                for i, t in enumerate(self.element_types) if t in ("HN", "RQ", "RC")]
        return np.array(taus)

    def get_peak_tau(self, find_peaks_kw=None, ppd=20):
        """tau locations of peaks in the model distribution."""
        from scipy import signal as sp_signal
        if find_peaks_kw is None:
            find_peaks_kw = {"height": 0}
        gamma, tau = self.predict_distribution(ppd=ppd, return_tau=True)
        gamma = np.nan_to_num(gamma, posinf=np.nanmax(gamma[np.isfinite(gamma)])
                              if np.any(np.isfinite(gamma)) else 1.0)
        peak_idx, _ = sp_signal.find_peaks(np.abs(gamma), **find_peaks_kw)
        if len(peak_idx) == 0:
            return self.get_time_constants()
        return tau[peak_idx]

    def predict_r_tot(self, x=None):
        """R_inf + Rp (reference elements.py:1151)."""
        return self.predict_r_inf(x) + self.predict_r_p(x)

    def predict_v(self, times, step_times, step_sizes, x=None):
        """Voltage-response alias (reference elements.py:1135)."""
        return self.predict_response(times, step_times, step_sizes, x=x)

    def predict_sigma(self, epsilon=0.25, reim_cor=0.25, error_structure=None):
        """Impedance error estimate from the fitted residuals via the EIS
        variance matrix (reference elements.py:1212)."""
        if self.f_fit is None or self.z_fit is None:
            return None
        from ..ops import mat1d
        z_hat = self.predict_z(self.f_fit)
        resid = np.concatenate([(z_hat - self.z_fit).real, (z_hat - self.z_fit).imag])
        vmm = np.asarray(mat1d.construct_eis_var_matrix(
            self.f_fit, epsilon, reim_cor, error_structure))
        s_bar = vmm @ resid ** 2
        sigma = np.sqrt(np.maximum(s_bar, 0))
        n = len(self.f_fit)
        return sigma[:n] + 1j * sigma[n:]

    @property
    def num_elements(self):
        return len(self.element_names)

    @property
    def num_parameters(self):
        return len(self.parameter_names)

    def set_parameter_values(self, values):
        values = np.asarray(values, dtype=float)
        if len(values) != len(self.parameter_names):
            raise ValueError(f"Expected {len(self.parameter_names)} values, "
                             f"got {len(values)}")
        self.parameter_values = values

    def set_bounds(self, bounds, element_name=None):
        """Override parameter bounds, for all parameters or one element
        (reference elements.py:410)."""
        if element_name is None:
            if len(bounds) != len(self.parameter_bounds):
                raise ValueError("bounds must match the full parameter count")
            self.parameter_bounds = list(bounds)
        else:
            i = self.element_names.index(element_name)
            i0, i1 = self.parameter_indices[i]
            if len(bounds) != i1 - i0:
                raise ValueError(f"Expected {i1 - i0} bounds for {element_name}")
            for k, bd in enumerate(bounds):
                self.parameter_bounds[i0 + k] = bd

    # -- plotting (reference elements.py:1352-1800) --------------------
    def plot_distribution(self, tau=None, x=None, ax=None, ppd=20,
                          show_singularities=True, **kw):
        """The model's total DRT gamma(tau) (reference elements.py:1352).

        Ideal elements (RC/R/L/C with beta -> 1) have delta-like
        singularities in gamma; ``show_singularities`` marks them with
        vertical lines, False drops them (reference elements.py:1362)."""
        import matplotlib.pyplot as plt
        gamma = self.predict_distribution(tau=tau, x=x, ppd=ppd,
                                          return_tau=True)
        if isinstance(gamma, tuple):
            gamma, tau = gamma
        gamma = np.asarray(gamma, dtype=float)
        tau = np.asarray(tau, dtype=float)
        if ax is None:
            _, ax = plt.subplots(figsize=(4, 3))
        finite = np.isfinite(gamma)
        line = ax.semilogx(tau[finite], gamma[finite], **kw)
        if show_singularities and not finite.all():
            for t_sing in tau[~finite]:
                ax.axvline(t_sing, ls=":", c=line[0].get_color(), alpha=0.7)
        ax.set_xlabel(r"$\tau$ (s)")
        ax.set_ylabel(r"$\gamma$ ($\Omega$)")
        return ax

    plot_drt = plot_distribution

    @property
    def num_drt_elements(self):
        """Number of elements with a distribution (HN/RQ/RC), reference
        elements.py's num_drt_elements."""
        return sum(t in ("HN", "RQ", "RC") for t in self.element_types)

    def plot_element_drts(self, tau=None, element_names=None, x=None, ax=None,
                          ppd=20, kw_list=None, **kw):
        """Per-element DRT curves (reference elements.py:1464).
        ``kw_list`` gives per-element plot kwargs (reference usage:
        ``kw_list=[{"label": f"RQ{i+1}"} ...]``)."""
        import matplotlib.pyplot as plt
        if tau is None:
            _, tau = self.predict_distribution(x=x, ppd=ppd, return_tau=True)
        if element_names is None:
            element_names = [n for n, t in zip(self.element_names,
                                               self.element_types)
                             if t in ("HN", "RQ", "RC")]
        if kw_list is None:
            kw_list = [{}] * len(element_names)
        if ax is None:
            _, ax = plt.subplots(figsize=(4, 3))
        for name, el_kw in zip(element_names, kw_list):
            ax.semilogx(tau, self.predict_element_drt(tau, name, x=x),
                        **{"label": name, **kw, **el_kw})
        ax.set_xlabel(r"$\tau$ (s)")
        ax.set_ylabel(r"$\gamma$ ($\Omega$)")
        ax.legend()
        return ax

    def plot_eis_fit(self, frequencies=None, axes=None, plot_type=None,
                     plot_data=True, data_kw=None, data_label="data",
                     label="fit", **kw):
        """Fitted vs measured impedance (reference elements.py:1708).

        ``plot_type`` in ('nyquist', 'bode', 'all'); passing a single Axes
        (the reference webinar's usage) implies a Nyquist-only plot.
        ``data_label``/``data_kw`` style the measured-data series."""
        from .. import plotting as plt_mod
        if frequencies is None:
            if self.f_fit is None:
                raise ValueError("No fit data; pass frequencies")
            frequencies = self.f_fit
        import matplotlib.pyplot as plt
        if data_kw is None:
            data_kw = dict(s=20, alpha=0.5)
        if plot_type is None:
            plot_type = "nyquist" if (axes is not None
                                      and np.ndim(axes) == 0) else "all"
        if axes is None and plot_type == "all":
            _, axes = plt.subplots(1, 3, figsize=(11, 3))
        if plot_data and self.z_fit is not None and np.ndim(self.z_fit) == 1:
            axes = plt_mod.plot_eis((self.f_fit, self.z_fit),
                                    plot_type=plot_type, axes=axes,
                                    label=data_label, **data_kw)
        z_hat = self.predict_z(frequencies)
        axes = plt_mod.plot_eis((frequencies, z_hat), plot_type=plot_type,
                                axes=axes, plot_func="plot", label=label, **kw)
        return axes

    def plot_eis_residuals(self, axes=None, part="both", **kw):
        """Weighted fit residuals vs frequency (reference elements.py:1760)."""
        import matplotlib.pyplot as plt
        if self.f_fit is None or self.z_fit is None or np.ndim(self.z_fit) != 1:
            raise ValueError("No single-spectrum fit data to evaluate")
        resid = self.predict_z(self.f_fit) - self.z_fit
        parts = {"real": ("Re", resid.real), "imag": ("Im", resid.imag)}
        keys = ["real", "imag"] if part == "both" else [part]
        if axes is None:
            _, axes = plt.subplots(1, len(keys), figsize=(4 * len(keys), 3),
                                   squeeze=False)
            axes = axes[0]
        axes = np.atleast_1d(axes)
        for ax, key in zip(axes, keys):
            label, r = parts[key]
            ax.semilogx(self.f_fit, r, "o", ms=3, **kw)
            ax.axhline(0, color="k", lw=0.5)
            ax.set_xlabel("$f$ (Hz)")
            ax.set_ylabel(rf"${label}(\hat{{Z}} - Z)$ ($\Omega$)")
        return axes

    def get_parameter_dict(self, x=None):
        x = self.get_parameter_values(x)
        return dict(zip(self.parameter_names, x))

    @property
    def parameter_dict(self):
        """name -> fitted value mapping (reference elements.py:325)."""
        return self.get_parameter_dict()

    @property
    def drt_elements(self):
        """Names of elements with a relaxation distribution
        (reference elements.py:329)."""
        return [n for n, t in zip(self.element_names, self.element_types)
                if element_has_distribution(t)]

    # -- per-element parameter introspection (reference elements.py:338-470)
    def _element_param_slice(self, element_name):
        try:
            i = self.element_names.index(element_name)
        except ValueError:
            raise ValueError(f"No element named {element_name} in model")
        return self.parameter_indices[i]

    def get_element_parameter_values(self, element_name, x=None):
        """Parameter values belonging to one element (reference
        elements.py:338)."""
        i0, i1 = self._element_param_slice(element_name)
        return self.get_parameter_values(x)[i0:i1]

    def get_element_parameter_types(self, element_name):
        """Parameter type strings for one element (reference
        elements.py:346)."""
        i0, i1 = self._element_param_slice(element_name)
        return self.parameter_types[i0:i1]

    def get_element_bounds(self, element_name):
        """Bounds tuples for one element's parameters (reference
        elements.py:435)."""
        i0, i1 = self._element_param_slice(element_name)
        return [self.parameter_bounds[k] for k in range(i0, i1)]

    # -- parameter/data scaling (reference elements.py:351-612) --------
    def transform_parameters(self, x, inverse, num_spectra: int = 1):
        """Map parameters between bounded (physical) and unbounded (logit)
        space, vectorized over stacked spectra (reference elements.py:351;
        the reference loops a scalar constraint_transform per parameter)."""
        x = np.asarray(x, dtype=float)
        if len(x) != self.num_parameters * num_spectra:
            raise ValueError(f"Expected {self.num_parameters * num_spectra} "
                             f"parameters, received {len(x)}")
        bounds = self.scaled_bounds if self.scaled_bounds is not None \
            else self.parameter_bounds
        transform, inv_transform = get_constraint_transforms(bounds)
        fn = inv_transform if inverse else transform
        xr = x.reshape(num_spectra, self.num_parameters)
        return np.concatenate([np.asarray(fn(jnp.asarray(row))) for row in xr])

    def scale_parameters_to_data(self, x, inverse, apply_scaling,
                                 num_spectra: int = 1):
        """Scale resistance-like parameters by rp_scale (reference
        elements.py:366). inverse=True maps scaled -> physical."""
        x = np.asarray(x, dtype=float)
        if len(x) != self.num_parameters * num_spectra:
            raise ValueError(f"Expected {self.num_parameters * num_spectra} "
                             f"parameters, received {len(x)}")
        if not apply_scaling:
            return x
        types = np.tile(np.array(self.parameter_types), num_spectra)
        out = x.copy()
        rlike = np.isin(types, ("R", "P", "Cinv"))
        out[rlike] = x[rlike] * self.rp_scale if inverse \
            else x[rlike] / self.rp_scale
        lnl = types == "lnL"
        out[lnl] = x[lnl] + (np.log(self.rp_scale) if inverse
                             else -np.log(self.rp_scale))
        return out

    def scale_bounds_to_data(self, bounds, inverse, apply_scaling):
        """Scale bound tuples the same way as the parameters they bound
        (reference elements.py:378)."""
        if len(bounds) != self.num_parameters:
            raise ValueError(f"Expected {self.num_parameters} bounds, "
                             f"received {len(bounds)}")
        if not apply_scaling:
            return bounds
        lo = self.scale_parameters_to_data(
            np.array([b[0] for b in bounds]), inverse, True)
        hi = self.scale_parameters_to_data(
            np.array([b[1] for b in bounds]), inverse, True)
        return [(float(a), float(b)) for a, b in zip(lo, hi)]

    def get_parameter_scales(self, parameter_values, num_spectra: int = 1):
        """Magnitude scales per parameter for optimizer/Hessian conditioning
        (reference elements.py:393)."""
        types = np.tile(np.array(self.parameter_types), num_spectra)
        scales = np.abs(np.asarray(parameter_values, dtype=float))
        scales[types == "alpha"] = 2
        scales[np.isin(types, ("beta", "lntau", "lnL"))] = 1
        scales[types == "R"] *= 2
        return scales

    def scale_data(self, times, i_signal, v_signal, chrono_weights,
                   step_times, step_sizes, z, eis_weights, apply_scaling,
                   chrono_mode="galv"):
        """Estimate rp_scale from the data and return scaled copies of the
        inputs (reference elements.py:545-612). Sets self.rp_scale and
        self.scaled_bounds; this implementation's own fitters work in
        physical units, so this is only engaged when a reference-style
        scaled workflow calls it explicitly."""
        from .. import preprocessing as pp
        from ..utils import chrono as chrono_utils
        if apply_scaling:
            if times is not None:
                _, response_signal = chrono_utils.get_input_and_response(
                    i_signal, v_signal, chrono_mode)
            else:
                response_signal = None
            self.rp_scale = pp.estimate_rp(times, step_times, step_sizes,
                                           response_signal, self.step_model, z)
        else:
            self.rp_scale = 1.0

        if times is not None:
            input_signal, response_signal = chrono_utils.get_input_and_response(
                i_signal, v_signal, chrono_mode)
            if apply_scaling:
                input_scale = np.mean(np.abs(step_sizes)) \
                    if step_sizes is not None and len(step_sizes) else 1.0
                response_scale = input_scale * self.rp_scale
            else:
                input_scale = response_scale = 1.0
            scaled_input = input_signal / input_scale
            scaled_response = response_signal / response_scale
            scaled_chrono_weights = None if chrono_weights is None \
                else chrono_weights * response_scale
            if chrono_mode == "galv":
                scaled_i, scaled_v = scaled_input, scaled_response
            else:
                scaled_i, scaled_v = scaled_response, scaled_input
        else:
            scaled_i = scaled_v = scaled_chrono_weights = None

        if z is not None:
            z_scaled = z / self.rp_scale
            scaled_eis_weights = None if eis_weights is None \
                else eis_weights * self.rp_scale
        else:
            z_scaled = scaled_eis_weights = None

        self.scaled_bounds = self.scale_bounds_to_data(
            self.parameter_bounds, False, apply_scaling)
        return scaled_i, scaled_v, scaled_chrono_weights, z_scaled, \
            scaled_eis_weights

    # -- error-structure weights / Laplace machinery -------------------
    def estimate_eis_weights(self, epsilon=0.25, reim_cor=0.25,
                             error_structure=None):
        """Concatenated [re; im] residual weights 1/sigma from the fitted
        error structure (reference elements.py:1221)."""
        sigma = self.predict_sigma(epsilon, reim_cor, error_structure)
        if sigma is None:
            raise ValueError("No fitted EIS data to estimate weights from")
        sigma_flat = np.concatenate([sigma.real, sigma.imag])
        return 1.0 / np.maximum(sigma_flat, 1e-300)

    @on_host
    def evaluate_hessian(self, weights=None, include_prior=False, x=None):
        """Hessian of the log-likelihood wrt the physical parameters via
        autodiff (reference elements.py:1265 assembles it from hand-written
        per-element second derivatives). Negative-definite near an optimum."""
        if self.f_fit is None or self.z_fit is None or np.ndim(self.z_fit) != 1:
            raise ValueError("No single-spectrum fit data")
        if weights is None:
            weights = self.weights
        x = self.get_parameter_values(x)
        resid = self._make_phys_resid(self.f_fit, self.z_fit,
                                      np.asarray(weights))

        def llh(xv):
            r = resid(xv)
            return -0.5 * jnp.sum(r ** 2)

        hess = np.asarray(jax.hessian(llh)(jnp.asarray(x)))
        if include_prior and self.prior_params is not None:
            hess -= np.diag(np.asarray(self.prior_params["weights"]) ** 2)
        return hess

    @on_host
    def estimate_lml(self, weights=None, scale_hessian=False,
                     include_prior=True, **kw):
        """Laplace marginal likelihood from the autodiff Hessian
        (reference elements.py:1279). evaluate_lml remains the simpler
        Gauss-Newton variant with an explicit broad prior."""
        if weights is None:
            weights = self.weights
        llh = self.evaluate_llh(weights=weights, **kw)
        hess = self.evaluate_hessian(weights, include_prior)
        if scale_hessian:
            sm = np.diag(self.get_parameter_scales(self.parameter_values))
            hess = sm @ hess @ sm
        prec = -hess
        if include_prior and self.prior_params is not None:
            mu = np.asarray(self.prior_params["mu"])
            pw = np.asarray(self.prior_params["weights"])
            lp_theta = -0.5 * np.sum((pw * (self.parameter_values - mu)) ** 2)
        else:
            lp_theta = 0.0
        diag = np.diag(prec).copy()
        prec[np.diag_indices_from(prec)] = np.where(diag == 0, 1e-15, diag)
        sign, log_det = np.linalg.slogdet(2 * np.pi * prec)
        if sign < 0:
            import warnings
            warnings.warn("Precision-matrix determinant is negative; the "
                          "solution may be suboptimal. Check the fit and LML")
        return llh + lp_theta - 0.5 * log_det

    # -- element-distribution plotting tail (reference elements.py:1456-1676)
    def plot_element_distributions(self, tau=None, **kw):
        """Deprecated reference name for plot_element_drts
        (reference elements.py:1456)."""
        import warnings
        warnings.warn("plot_element_distributions is deprecated; use "
                      "plot_element_drts", DeprecationWarning)
        return self.plot_element_drts(tau=tau, **kw)

    def fill_element_drts(self, tau=None, element_names=None, x=None, ax=None,
                          ppd=20, y_offset=0, normalize=False,
                          return_patches=False, kw_list=None, **common_kw):
        """Filled per-element DRT areas (reference elements.py:1582)."""
        import matplotlib.pyplot as plt
        if tau is None:
            _, tau = self.predict_distribution(x=x, ppd=ppd, return_tau=True)
        tau = np.asarray(tau, dtype=float)
        if element_names is None:
            element_names = self.drt_elements
        if kw_list is None:
            kw_list = [{} for _ in element_names]
        if len(kw_list) != len(element_names):
            raise ValueError(f"Length of kw_list ({len(kw_list)}) must match "
                             f"number of elements ({len(element_names)})")
        norm = self.predict_r_p(x=x) if normalize else 1.0
        if ax is None:
            _, ax = plt.subplots(figsize=(4, 3))
        patches = []
        for name, el_kw in zip(element_names, kw_list):
            g = np.asarray(self.predict_element_drt(tau, name, x=x)) / norm
            g = np.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0)
            patches.append(ax.fill_between(tau, y_offset, g + y_offset,
                                           **{**common_kw, **el_kw}))
        ax.set_xscale("log")
        ax.set_xlabel(r"$\tau$ (s)")
        ax.set_ylabel(r"$\gamma \, / \, R_p$" if normalize
                      else r"$\gamma$ ($\Omega$)")
        return (ax, patches) if return_patches else ax

    def fill_element_distributions(self, tau=None, **kw):
        """Deprecated reference name for fill_element_drts
        (reference elements.py:1574)."""
        import warnings
        warnings.warn("fill_element_distributions is deprecated; use "
                      "fill_element_drts", DeprecationWarning)
        return self.fill_element_drts(tau=tau, **kw)

    def plot_singularities(self, ax, scale_factor=1, scale=None, x=None,
                           y_offset=0, **kw):
        """Vertical markers at delta-like (singular) element locations
        (reference elements.py:1656)."""
        info = self.get_singularity_info(x)
        if not info:
            return ax
        for r, tau_s in info:
            y_start = (float(np.asarray(
                self.predict_drt(np.array([tau_s * (1 + 1e-3)]), x=x))[0])
                + y_offset) / scale_factor
            if scale is not None:
                y_end = (np.sign(r) * scale + y_offset) / scale_factor
            elif abs(r) > 0:
                y_end = ax.get_ylim()[int(0.5 * (1 + np.sign(r)))]
            else:
                y_end = y_start
            ax.plot([tau_s, tau_s], [y_start, y_end], **kw)
        return ax

    def __repr__(self):
        return f"DiscreteElementModel({self.model_string!r})"


def element_has_distribution(element_type):
    """True for element types carrying a DRT contribution
    (reference elements.py)."""
    return element_type in ("HN", "RQ", "RC")


def parse_parameter_string(parameter_string):
    """'R_RQ1' -> ('R', 'RQ1') (reference elements.py)."""
    param_type, element_name = parameter_string.split("_")
    return param_type, element_name
