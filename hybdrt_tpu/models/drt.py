"""The DRT model: self-tuning hierarchical-Bayesian DRT/DOP estimation.

API-compatible re-design of the reference's central class
(reference hybdrt/models/drt1d.py:38 `DRT`, hybdrt/models/drtbase.py:20
`DRTBase`). Host-side python handles data prep and bookkeeping; all numerics
run through the jitted QPHB core (hybdrt_tpu.solver.fitcore) with the
JAX-native QP solver (hybdrt_tpu.ops.qp).
"""
import warnings
from copy import deepcopy

import numpy as np
import jax.numpy as jnp

from .. import preprocessing as pp
from ..ops import basis, lookup, mat1d, phasance
from ..solver import hypers as hyp_mod
from ..solver import qphb as qphb_mod
from ..solver import fitcore
from ..solver.qphb import QPHBConfig
from ..utils import chrono as chrono_utils
from ..utils.device import on_host
from ..utils import eis as eis_utils
from ..utils import validation
from . import kk as kk_mod
from . import background as bkg_mod


SPECIAL_PARAM_OPTIONS = ["R_inf", "v_baseline", "inductance", "C_inv", "vz_offset",
                         "background_scale", "x_dop"]


class DRT:
    """Distribution of relaxation times model with QPHB self-tuning fits.

    Constructor arguments mirror the reference (drtbase.py:21-27).
    """

    # Sign applied to DRT/DOP matrix products in predictions; the DCT
    # subclass (capacitive systems) flips it to match its inverted fit
    # matrices (reference dct.py:49-66)
    _dist_matrix_sign = 1.0

    def __init__(self, fixed_basis_tau=None, tau_supergrid=None, tau_basis_type="gaussian",
                 tau_epsilon=None, basis_tau_ppd=10, extend_basis_decades=1,
                 step_model="ideal", chrono_mode="galv", interpolate_integrals=True,
                 chrono_tau_rise=None, fixed_basis_nu=None, nu_basis_type="gaussian",
                 nu_epsilon=None, fit_dop=False, normalize_dop=True,
                 fit_inductance=True, fit_ohmic=True, fit_capacitance=False,
                 time_precision=10, input_signal_precision=10, frequency_precision=10,
                 print_diagnostics=False, warn=True):
        validation.check_basis_type(tau_basis_type)
        validation.check_step_model(step_model)
        validation.check_ctrl_mode(chrono_mode)

        self.fixed_basis_tau = None if fixed_basis_tau is None else np.asarray(fixed_basis_tau)
        self.tau_supergrid = None if tau_supergrid is None else np.asarray(tau_supergrid)
        self.basis_tau = None
        self.tau_basis_type = tau_basis_type
        self.tau_epsilon = tau_epsilon
        self.extend_basis_decades = extend_basis_decades
        self.step_model = step_model
        self.chrono_mode = chrono_mode
        self.frequency_precision = frequency_precision
        self.time_precision = time_precision
        self.input_signal_precision = input_signal_precision
        self.zga_params = None

        self.fit_inductance = fit_inductance
        self.fit_ohmic = fit_ohmic
        self.fit_capacitance = fit_capacitance

        # Distribution of phasances
        self.fixed_basis_nu = None if fixed_basis_nu is None else np.asarray(fixed_basis_nu)
        self.basis_nu = None
        self.nu_epsilon = nu_epsilon
        self.nu_basis_type = nu_basis_type
        self.fit_dop = fit_dop
        self.normalize_dop = normalize_dop
        self.dop_scale_vector = None

        # Chrono state
        self.step_times = None
        self.step_sizes = None
        self.tau_rise = None
        self.nonconsec_step_times = None
        self.sample_index = None
        self.raw_input_signal = None
        self.raw_response_signal = None
        self.raw_response_background = None
        self.scaled_input_signal = None
        self.scaled_response_signal = None
        self.scaled_response_offset = None
        self.v_baseline_deg = None
        self.v_baseline_sqrt = None
        self.v_baseline_scale = None

        # EIS state
        self.z_fit = None
        self.z_fit_scaled = None

        # Scales
        self.input_signal_scale = 1.0
        self.response_signal_scale = 1.0
        self.coefficient_scale = 1.0
        self.impedance_scale = 1.0
        self.inductance_scale = None
        self.capacitance_scale = None

        # Fit state
        self.t_fit = []
        self.f_fit = []
        self.special_qp_params = {}
        self.series_neg = None
        self.fit_parameters = None
        self.fit_type = None
        self.fit_kwargs = None
        self.fit_matrices = {}
        self._pred_mat_cache = {}
        self.qphb_params = None
        self.qphb_history = None
        self.background_gp = None
        self.pfrt_result = None
        self.map_samples = None
        self.map_sample_kw = None
        self.candidate_dict = None
        self.candidate_df = None
        self.best_candidate_dict = None
        self.best_candidate_df = None
        self.discrete_candidate_dict = None
        self.discrete_candidate_df = None
        self.pfrt_candidate_dict = None
        self.pfrt_candidate_df = None

        # Outlier state
        self.eis_outlier_index = None
        self.eis_outliers = None
        self.chrono_outlier_index = None
        self.chrono_outliers = None

        self.print_diagnostics = print_diagnostics
        self.warn = warn

        # Default epsilon from grid spacing (reference drtbase.py:126-136)
        if self.tau_epsilon is None:
            if self.fixed_basis_tau is not None:
                self.tau_epsilon = 1 / np.mean(np.diff(np.log(self.fixed_basis_tau)))
            elif self.tau_supergrid is not None:
                self.tau_epsilon = 1 / np.mean(np.diff(np.log(self.tau_supergrid)))
            elif basis_tau_ppd is not None:
                self.tau_epsilon = pp.get_epsilon_from_ppd(basis_tau_ppd)

        # Integral lookups for interpolation-based matrix assembly
        # (reference drtbase.py:137-159). Cached by (basis_type, epsilon).
        self.integrate_method = "interp" if interpolate_integrals else "trapz"
        self.chrono_tau_rise = chrono_tau_rise
        self._refresh_lookups()

    # ------------------------------------------------------------------
    # Lookup + config helpers
    # ------------------------------------------------------------------
    @on_host
    def _refresh_lookups(self):
        if self.integrate_method == "interp" and self.tau_basis_type not in \
                ("Cole-Cole", "zga", "delta"):
            zre, zim = lookup.generate_impedance_lookup(self.tau_basis_type, float(self.tau_epsilon))
            tr = self.chrono_tau_rise if self.step_model != "ideal" else None
            resp = lookup.generate_response_lookup(self.tau_basis_type, self.chrono_mode,
                                                   self.step_model, float(self.tau_epsilon),
                                                   tau_rise=tr)
            self.interpolate_lookups = {"z_real": zre, "z_imag": zim, "response": resp}
        else:
            self.interpolate_lookups = {"z_real": None, "z_imag": None, "response": None}

    def _add_special_qp_param(self, name, nonneg, size=1):
        if name not in SPECIAL_PARAM_OPTIONS:
            raise ValueError(f"Invalid special QP parameter {name}")
        self.special_qp_params[name] = {"index": self.get_qp_mat_offset(), "nonneg": nonneg,
                                        "size": size}

    def get_qp_mat_offset(self):
        return int(np.sum([v.get("size", 1) for v in self.special_qp_params.values()])) \
            if self.special_qp_params else 0

    def get_special_indices(self, name):
        sp = self.special_qp_params[name]
        return sp["index"], sp["index"] + sp.get("size", 1)

    @property
    def dop_indices(self):
        if self.fit_dop and "x_dop" in self.special_qp_params:
            return self.get_special_indices("x_dop")
        return None, None

    @property
    def num_drt_params(self):
        n = len(self.basis_tau)
        return 2 * n if self.series_neg else n

    # Reference-compatible accessor pairs (reference drtbase.py:615-1086
    # manages matrix-recalc flags through these; here the prediction-matrix
    # cache keys on basis/protocol signatures, so they are attribute views).

    def get_basis_tau(self):
        return self.basis_tau

    def set_basis_tau(self, value):
        self.basis_tau = value

    def get_tau_basis_type(self):
        return self.tau_basis_type

    def set_tau_basis_type(self, value):
        self.tau_basis_type = value

    def get_tau_epsilon(self):
        return self.tau_epsilon

    def set_tau_epsilon(self, value):
        self.tau_epsilon = value

    def get_nu_basis_type(self):
        return self.nu_basis_type

    def set_nu_basis_type(self, value):
        self.nu_basis_type = value

    def get_zga_params(self):
        return self.zga_params

    def set_zga_params(self, value=None, approx_func_epsilon=None, num_bases=7,
                       basis_extent=2, curvature_penalty=None, nonneg=False):
        """Set the ZGA (ZARC-gaussian-approximation) parameters. Pass a
        precomputed (x_basis, coef, epsilon) tuple to store it directly, or
        no value to optimize the Cole-Cole approximation of the gaussian RBF
        at this model's tau_epsilon (reference drtbase.py:684-700 →
        basis.get_basis_approx_params)."""
        if value is not None:
            self.zga_params = value
            return
        if self.tau_epsilon is None:
            if self.basis_tau is None:
                raise ValueError(
                    "Set basis_tau or tau_epsilon before computing ZGA params")
            self.tau_epsilon = 1 / np.mean(np.diff(np.log(self.basis_tau)))
        self.zga_params = basis.get_basis_approx_params(
            "gaussian", "Cole-Cole", self.tau_epsilon, approx_func_epsilon,
            num_bases=num_bases, basis_extent=basis_extent,
            curvature_penalty=curvature_penalty, nonneg=nonneg)

    def get_step_model(self):
        return self.step_model

    def set_step_model(self, value):
        self.step_model = value

    def get_chrono_mode(self):
        return self.chrono_mode

    def set_chrono_mode(self, value):
        self.chrono_mode = value

    def get_fit_inductance(self):
        return self.fit_inductance

    def set_fit_inductance(self, value):
        self.fit_inductance = value

    def get_f_fit(self):
        return self.f_fit

    def set_f_fit(self, value):
        self.f_fit = value

    def get_t_fit(self):
        return self.t_fit

    def set_t_fit(self, value):
        self.t_fit = value

    def get_raw_input_signal(self):
        return self.raw_input_signal

    def set_raw_input_signal(self, value):
        self.raw_input_signal = value

    # Prediction-grid accessors (reference drtbase.py:828-1105). The
    # reference routes these through matrix-recalc flags; here prediction
    # matrices are cached by grid signature, so they are simple views that
    # set the default grids predict_response/predict_z use when called
    # without explicit times/frequencies.
    def get_t_predict(self):
        return getattr(self, "_t_predict", None)

    def set_t_predict(self, times):
        self._t_predict = None if times is None else np.asarray(times)

    def get_f_predict(self):
        return getattr(self, "_f_predict", None)

    def set_f_predict(self, frequencies):
        self._f_predict = None if frequencies is None \
            else np.asarray(frequencies)

    def get_chrono_mode_predict(self):
        return getattr(self, "_chrono_mode_predict", self.chrono_mode)

    def set_chrono_mode_predict(self, chrono_mode):
        from ..utils import validation
        validation.check_ctrl_mode(chrono_mode)
        if self.chrono_mode is not None and chrono_mode != self.chrono_mode:
            raise ValueError("Use of different operation modes for fitting "
                             "and predicting is not supported")
        self._chrono_mode_predict = chrono_mode

    def get_raw_prediction_input_signal(self):
        return getattr(self, "_raw_prediction_input_signal", None)

    def set_raw_prediction_input_signal(self, input_signal):
        self._raw_prediction_input_signal = None if input_signal is None \
            else np.array(input_signal, copy=True)

    def get_fit_frequencies(self, return_none=False):
        if len(np.atleast_1d(self.f_fit)) == 0:
            return None if return_none else np.array([])
        return np.asarray(self.f_fit)

    def get_fit_times(self, return_none=False):
        if self.t_fit is None or len(np.atleast_1d(self.t_fit)) == 0:
            return None if return_none else np.array([])
        return np.asarray(self.t_fit)

    @property
    def num_data(self):
        nt = len(np.atleast_1d(self.get_fit_times()))
        nf = len(np.atleast_1d(self.get_fit_frequencies()))
        return nt + 2 * nf

    @property
    def num_independent_data(self):
        return len(np.atleast_1d(self.get_fit_times())) + len(np.atleast_1d(self.get_fit_frequencies()))

    # ------------------------------------------------------------------
    # Chrono signal processing (reference drtbase.py:285-373)
    # ------------------------------------------------------------------
    def process_chrono_signals(self, times, i_signal, v_signal, step_times, step_sizes,
                               offset_steps, step_offset_size, downsample, downsample_kw):
        if times is None:
            self.step_times = None
            self.step_sizes = None
            self.tau_rise = None
            return None, None, None, None, None, None

        input_signal = i_signal if self.chrono_mode == "galv" else v_signal
        if step_times is None:
            step_times, step_sizes, tau_rise = pp.process_input_signal(
                times, input_signal, self.step_model, offset_steps, offset_size=step_offset_size)
        else:
            if step_sizes is None:
                step_sizes = pp.get_step_sizes(times, input_signal, step_times)
            tau_rise = None

        if len(step_times) > 1:
            step_diff = np.diff(step_times)
            t_sample = np.min(np.diff(times))
            nonconsec = step_times[1:][step_diff > 1.1 * t_sample]
            self.nonconsec_step_times = np.insert(nonconsec, 0, step_times[0])
        else:
            self.nonconsec_step_times = np.asarray(step_times)

        if downsample:
            if downsample_kw is None:
                downsample_kw = {"prestep_samples": 10, "target_times": None}
            sample_index, (sample_times, sample_i, sample_v) = pp.downsample_data(
                times, i_signal, v_signal, step_times=self.nonconsec_step_times,
                op_mode=self.chrono_mode, **downsample_kw)
            self.sample_index = sample_index
        else:
            self.sample_index = np.arange(len(times), dtype=int)
            sample_times = np.array(times, dtype=float)
            sample_i = np.array(i_signal, dtype=float)
            sample_v = np.array(v_signal, dtype=float)

        self.t_fit = sample_times
        input_signal, response_signal = chrono_utils.get_input_and_response(
            sample_i, sample_v, self.chrono_mode)
        self.raw_input_signal = input_signal.copy()
        self.raw_response_signal = response_signal.copy()

        self.step_times = deepcopy(step_times)
        self.step_sizes = deepcopy(step_sizes)
        self.tau_rise = deepcopy(tau_rise)
        return sample_times, sample_i, sample_v, step_times, step_sizes, tau_rise

    # ------------------------------------------------------------------
    # Data scaling (reference drtbase.py:439-536)
    # ------------------------------------------------------------------
    def scale_data(self, times, i_signal, v_signal, step_times, step_sizes, z,
                   apply_scaling, rp_scale):
        if apply_scaling:
            _, response_signal = chrono_utils.get_input_and_response(i_signal, v_signal,
                                                                     self.chrono_mode)
            rp_est = pp.estimate_rp(times, step_times, step_sizes, response_signal,
                                    self.step_model, z)
            self.coefficient_scale = rp_est / rp_scale
        else:
            rp_est = 1.0
            self.coefficient_scale = 1.0

        if times is not None:
            if apply_scaling:
                self.input_signal_scale = np.max(np.abs(step_sizes))
                self.response_signal_scale = self.input_signal_scale * rp_est / rp_scale
            else:
                self.input_signal_scale = 1.0
                self.response_signal_scale = 1.0
            self.scaled_input_signal = self.raw_input_signal / self.input_signal_scale
            self.scaled_response_signal = self.raw_response_signal / self.response_signal_scale
            if self.chrono_mode == "galv":
                scaled_i = self.scaled_input_signal.copy()
                scaled_v = self.scaled_response_signal.copy()
            else:
                scaled_i = self.scaled_response_signal.copy()
                scaled_v = self.scaled_input_signal.copy()
        else:
            scaled_i, scaled_v = None, None
            self.input_signal_scale = None
            self.response_signal_scale = None
            self.raw_input_signal = None
            self.raw_response_signal = None
            self.scaled_input_signal = None
            self.scaled_response_signal = None

        if z is not None:
            self.impedance_scale = deepcopy(self.coefficient_scale)
            z_scaled = z / self.impedance_scale
            self.z_fit = z.copy()
            self.z_fit_scaled = z_scaled.copy()
        else:
            z_scaled = None
            self.z_fit = None
            self.z_fit_scaled = None

        return scaled_i, scaled_v, z_scaled

    def update_data_scale(self, factor):
        if self.scaled_response_signal is not None:
            self.response_signal_scale /= factor
            self.scaled_response_offset *= factor
            self.scaled_response_signal *= factor
        if self.z_fit_scaled is not None:
            self.z_fit_scaled *= factor
        if self.chrono_mode == "galv":
            self.coefficient_scale /= factor
            self.impedance_scale /= factor
        else:
            self.coefficient_scale *= factor
            self.impedance_scale /= factor

    # ------------------------------------------------------------------
    # Fit preparation (reference drt1d.py:5439-5963)
    # ------------------------------------------------------------------
    @on_host
    def _prep_for_fit(self, times, i_signal, v_signal, frequencies, z, step_times, step_sizes,
                      downsample, downsample_kw, offset_steps, step_offset_size,
                      smooth_inf_response, scale_data, rp_scale):
        self.fit_kwargs = {"smooth_inf_response": smooth_inf_response,
                           "offset_steps": offset_steps,
                           "step_offset_size": step_offset_size}

        sample_times, sample_i, sample_v, step_times, step_sizes, tau_rise = \
            self.process_chrono_signals(times, i_signal, v_signal, step_times, step_sizes,
                                        offset_steps, step_offset_size, downsample, downsample_kw)

        # Basis grid (reference drt1d.py:5470-5485)
        if self.fixed_basis_tau is not None:
            self.basis_tau = self.fixed_basis_tau
        else:
            self.basis_tau = pp.get_basis_tau(frequencies, times, step_times,
                                              tau_grid=self.tau_supergrid,
                                              extend_decades=self.extend_basis_decades)
        if self.tau_epsilon is None:
            if self.tau_basis_type in ("gaussian", "zga"):
                self.tau_epsilon = 1 / np.mean(np.diff(np.log(self.basis_tau)))
            elif self.tau_basis_type == "Cole-Cole":
                self.tau_epsilon = 0.95

        if sample_times is not None:
            rm_drt, inf_rv, induc_rv, cap_rv, rm_dop = self._prep_chrono_fit_matrix(
                sample_times, step_times, step_sizes, tau_rise, smooth_inf_response)
            if self.series_neg:
                rm_drt = np.hstack((rm_drt, -rm_drt))
        else:
            self.t_fit = []
            rm_drt, inf_rv, induc_rv, cap_rv, rm_dop = None, None, None, None, None

        if frequencies is not None:
            zm_drt, induc_zv, cap_zv, zm_dop = self._prep_impedance_fit_matrix(frequencies)
            if self.series_neg:
                zm_drt = np.hstack((zm_drt, -zm_drt))
        else:
            self.f_fit = []
            zm_drt, induc_zv, cap_zv, zm_dop = None, None, None, None

        penalty_matrices = self._prep_penalty_matrices()
        if self.series_neg:
            for key in list(penalty_matrices.keys()):
                if "dop" not in key:
                    penalty_matrices[key] = np.kron(np.eye(2), penalty_matrices[key])

        i_scaled, v_scaled, z_scaled = self.scale_data(sample_times, sample_i, sample_v,
                                                       step_times, step_sizes, z,
                                                       scale_data, rp_scale)

        if sample_times is not None:
            if self.chrono_mode == "galv":
                response_baseline = np.median(v_scaled[sample_times < step_times[0]])
            else:
                response_baseline = np.median(i_scaled[sample_times < step_times[0]])
            rm_drt = np.asarray(rm_drt) / self.input_signal_scale
            induc_rv = np.asarray(induc_rv) / self.input_signal_scale
            inf_rv = np.asarray(inf_rv) / self.input_signal_scale
            cap_rv = np.asarray(cap_rv) / self.input_signal_scale
            if rm_dop is not None:
                rm_dop = np.asarray(rm_dop) / self.input_signal_scale
        else:
            response_baseline = None

        return (sample_times, i_scaled, v_scaled, response_baseline, z_scaled), \
            (rm_drt, induc_rv, inf_rv, cap_rv, rm_dop, zm_drt, induc_zv, cap_zv, zm_dop,
             penalty_matrices)

    @on_host
    def _prep_chrono_fit_matrix(self, times, step_times, step_sizes, tau_rise,
                                smooth_inf_response):
        key = ("rm", self._basis_signature(), self.step_model, self.chrono_mode,
               np.asarray(times).tobytes(),
               np.atleast_1d(step_times).astype(float).tobytes(),
               np.atleast_1d(step_sizes).astype(float).tobytes(),
               None if tau_rise is None
               else np.atleast_1d(tau_rise).astype(float).tobytes(),
               None if self.raw_input_signal is None
               else np.asarray(self.raw_input_signal).tobytes(),
               bool(smooth_inf_response), self.fit_dop)
        hit = self._assembly_cache_get(key)
        if hit is not None:
            rm, rm_layered, induc_rv, cap_rv, inf_rv, rm_dop, sig = hit
            self.fit_matrices["response"] = rm.copy()
            self.fit_matrices["rm_layered"] = rm_layered
            self.fit_matrices["inductance_response"] = induc_rv
            self.fit_matrices["capacitance_response"] = cap_rv
            self.fit_matrices["inf_response"] = inf_rv.copy()
            self.fit_matrices["rm_dop"] = None if rm_dop is None \
                else rm_dop.copy()
            self._fit_rm_signature = sig
            return (rm.copy(), inf_rv, induc_rv, cap_rv,
                    None if rm_dop is None else rm_dop.copy())
        rm, rm_layered = mat1d.construct_response_matrix(
            self.basis_tau, times, self.step_model, step_times, step_sizes,
            basis_type=self.tau_basis_type, epsilon=self.tau_epsilon, tau_rise=tau_rise,
            op_mode=self.chrono_mode, integrate_method=self.integrate_method,
            zga_params=self.zga_params, interpolate_grids=self.interpolate_lookups["response"])
        rm = np.asarray(rm)
        self.fit_matrices["response"] = rm.copy()
        self.fit_matrices["rm_layered"] = np.asarray(rm_layered)

        induc_rv = np.asarray(mat1d.construct_inductance_response_vector(
            times, self.step_model, step_times, step_sizes, tau_rise, self.chrono_mode))
        cap_rv = np.asarray(mat1d.construct_capacitance_response_vector(
            times, self.step_model, step_times, step_sizes, tau_rise, self.chrono_mode))
        self.fit_matrices["inductance_response"] = induc_rv
        self.fit_matrices["capacitance_response"] = cap_rv

        inf_rv = np.asarray(mat1d.construct_ohmic_response_vector(
            times, self.step_model, step_times, step_sizes, tau_rise, self.raw_input_signal,
            smooth_inf_response, self.chrono_mode))
        self.fit_matrices["inf_response"] = inf_rv.copy()

        # Signature for prediction-matrix reuse (see _get_response_pred_matrix)
        self._fit_rm_signature = self._basis_signature() + (
            self.step_model, self.chrono_mode,
            None if tau_rise is None else float(np.atleast_1d(tau_rise)[0]),
            tuple(np.round(np.atleast_1d(step_times).astype(float), 12).tolist()),
            tuple(np.round(np.atleast_1d(step_sizes).astype(float), 12).tolist()))

        if self.fit_dop:
            rm_dop, _ = phasance.construct_phasor_v_matrix(times, self.basis_nu,
                                                           self.nu_basis_type, self.nu_epsilon,
                                                           self.step_model, step_times,
                                                           step_sizes, self.chrono_mode)
            rm_dop = np.asarray(rm_dop)
            self.fit_matrices["rm_dop"] = rm_dop.copy()
        else:
            rm_dop = None
        self._assembly_cache_put(
            key, (rm.copy(), np.asarray(rm_layered), induc_rv, cap_rv,
                  inf_rv.copy(), None if rm_dop is None else rm_dop.copy(),
                  self._fit_rm_signature))
        return rm, inf_rv, induc_rv, cap_rv, rm_dop

    def _assembly_cache_get(self, key):
        cache = getattr(self, "_assembly_cache", None)
        return None if cache is None else cache.get(key)

    def _assembly_cache_put(self, key, value):
        if not hasattr(self, "_assembly_cache"):
            self._assembly_cache = {}
        if len(self._assembly_cache) > 32:
            self._assembly_cache.clear()
        self._assembly_cache[key] = value

    @on_host
    def _prep_impedance_fit_matrix(self, frequencies):
        self.f_fit = np.asarray(frequencies)
        # Fit-matrix reuse on repeated grids (the reference's matrix-recalc
        # flags, drtbase.py:615; here keyed by basis signature + grid bytes).
        # Copies are returned because DCT sign-inverts fit_matrices in place.
        key = ("zm", self._basis_signature(), self.f_fit.tobytes(),
               self.fit_dop)
        hit = self._assembly_cache_get(key)
        if hit is not None:
            zm, induc_zv, cap_zv, zm_dop = hit
            self.fit_matrices["impedance"] = zm.copy()
            self.fit_matrices["zm_dop"] = None if zm_dop is None \
                else zm_dop.copy()
            self._fit_zm_signature = self._basis_signature()
            return (zm.copy(), induc_zv,
                    cap_zv, None if zm_dop is None else zm_dop.copy())
        zmr = np.asarray(mat1d.construct_impedance_matrix(
            frequencies, "real", tau=self.basis_tau, basis_type=self.tau_basis_type,
            epsilon=self.tau_epsilon, integrate_method=self.integrate_method,
            zga_params=self.zga_params, interpolate_grids=self.interpolate_lookups["z_real"]))
        zmi = np.asarray(mat1d.construct_impedance_matrix(
            frequencies, "imag", tau=self.basis_tau, basis_type=self.tau_basis_type,
            epsilon=self.tau_epsilon, integrate_method=self.integrate_method,
            zga_params=self.zga_params, interpolate_grids=self.interpolate_lookups["z_imag"]))
        zm = zmr + 1j * zmi
        self.fit_matrices["impedance"] = zm.copy()
        # Signature for prediction-matrix reuse (see _get_impedance_pred_matrix)
        self._fit_zm_signature = self._basis_signature()

        induc_zv = np.asarray(mat1d.construct_inductance_impedance_vector(frequencies))
        cap_zv = np.asarray(mat1d.construct_capacitance_impedance_vector(frequencies))

        if self.fit_dop:
            zm_dop = np.asarray(phasance.construct_phasor_z_matrix(
                frequencies, self.basis_nu, self.nu_basis_type, self.nu_epsilon))
        else:
            zm_dop = None
        self.fit_matrices["zm_dop"] = zm_dop
        self._assembly_cache_put(key, (zm.copy(), induc_zv, cap_zv,
                                       None if zm_dop is None
                                       else zm_dop.copy()))
        return zm, induc_zv, cap_zv, zm_dop

    @on_host
    def _prep_penalty_matrices(self):
        """Integral penalty matrices for orders 0..2 (reference drt1d.py:5673)."""
        key = ("pen", self._basis_signature(), self.fit_dop,
               None if not self.fit_dop
               else (self.nu_basis_type, float(self.nu_epsilon or 0),
                     np.asarray(self.basis_nu).tobytes()))
        hit = self._assembly_cache_get(key)
        if hit is not None:
            penalty_matrices = {k: v.copy() for k, v in hit.items()}
            self.fit_matrices.update(penalty_matrices)
            return penalty_matrices
        penalty_matrices = {}
        for k in range(3):
            dk = np.asarray(mat1d.construct_integrated_derivative_matrix(
                np.log(self.basis_tau), basis_type=self.tau_basis_type, order=k,
                epsilon=self.tau_epsilon, zga_params=self.zga_params))
            penalty_matrices[f"m{k}"] = dk

            if self.fit_dop:
                if self.nu_basis_type == "delta":
                    dnu = np.median(np.diff(np.sort(self.basis_nu)))
                    dk_dop = mat1d.construct_integrated_derivative_matrix(
                        self.basis_nu, basis_type="gaussian", order=k, epsilon=1 / dnu)
                else:
                    dk_dop = mat1d.construct_integrated_derivative_matrix(
                        self.basis_nu, basis_type=self.nu_basis_type, order=k,
                        epsilon=self.nu_epsilon)
                penalty_matrices[f"m{k}_dop"] = np.asarray(dk_dop)
                if k == 0:
                    dnu = np.mean(np.abs(np.diff(self.basis_nu)))
                    gmat = mat1d.construct_integrated_derivative_matrix(
                        self.basis_nu, basis_type="gaussian", order=1, epsilon=1 / dnu)
                    penalty_matrices[f"gmat{k}_dop"] = np.asarray(gmat)
        self.fit_matrices.update(penalty_matrices)
        self._assembly_cache_put(key, {k: v.copy()
                                       for k, v in penalty_matrices.items()})
        return penalty_matrices

    def _format_qp_matrices(self, rm_drt, inf_rv, induc_rv, cap_rv, rm_dop, zm_drt, induc_zv,
                            cap_zv, zm_dop, base_penalty_matrices, v_baseline_penalty,
                            ohmic_penalty, inductance_penalty, capacitance_penalty,
                            vz_offset_scale, background_penalty, inductance_scale,
                            capacitance_scale):
        """Pad matrices with special-parameter columns (reference drt1d.py:5736)."""
        num_special = self.get_qp_mat_offset()
        special_indices = {k: v["index"] for k, v in self.special_qp_params.items()}
        self.inductance_scale = inductance_scale
        self.capacitance_scale = capacitance_scale

        if self.fit_dop:
            if self.normalize_dop:
                dop_eval_tau = self.tau_supergrid if self.tau_supergrid is not None \
                    else self.basis_tau
                dsv = np.asarray(phasance.phasor_scale_vector(self.basis_nu, dop_eval_tau))
                dsv = dsv / basis.get_basis_func_area(
                    self.nu_basis_type, self.nu_epsilon) if self.nu_basis_type != "delta" else dsv
                self.dop_scale_vector = dsv
            else:
                self.dop_scale_vector = np.ones(len(self.basis_nu))
        else:
            self.dop_scale_vector = None
        dop_start, dop_end = self.dop_indices

        # Chrono matrix with special columns
        if rm_drt is not None:
            rm = np.empty((rm_drt.shape[0], rm_drt.shape[1] + num_special))
            if "v_baseline" in special_indices:
                from .background import get_baseline_matrix
                vb_start, vb_end = self.get_special_indices("v_baseline")
                rm[:, vb_start:vb_end], vbase_scale = get_baseline_matrix(
                    self.get_fit_times(), self.v_baseline_deg, normalize=True,
                    sqrt=self.v_baseline_sqrt)
                self.v_baseline_scale = vbase_scale
            if "inductance" in special_indices:
                rm[:, special_indices["inductance"]] = induc_rv * inductance_scale
            if "R_inf" in special_indices:
                rm[:, special_indices["R_inf"]] = inf_rv
            if "C_inv" in special_indices:
                rm[:, special_indices["C_inv"]] = cap_rv * capacitance_scale
            if "vz_offset" in special_indices:
                rm[:, special_indices["vz_offset"]] = 0
            if "background_scale" in special_indices:
                rm[:, special_indices["background_scale"]] = 0
            if self.fit_dop:
                rm[:, dop_start:dop_end] = rm_dop * self.dop_scale_vector
            rm[:, num_special:] = rm_drt
        else:
            rm = None

        # EIS matrix with special columns, stacked [Re; Im]
        if zm_drt is not None:
            zm = np.zeros((zm_drt.shape[0], zm_drt.shape[1] + num_special), dtype=complex)
            if "inductance" in special_indices:
                zm[:, special_indices["inductance"]] = induc_zv * inductance_scale
            if "R_inf" in special_indices:
                zm[:, special_indices["R_inf"]] = 1
            if "C_inv" in special_indices:
                zm[:, special_indices["C_inv"]] = cap_zv * capacitance_scale
            if self.fit_dop:
                zm[:, dop_start:dop_end] = zm_dop * self.dop_scale_vector
            zm[:, num_special:] = zm_drt
            zm = np.vstack([zm.real, zm.imag])
        else:
            zm = None

        # Penalty matrices with special diagonal entries
        penalty_matrices = {}
        for k in range(3):
            m_drt = base_penalty_matrices[f"m{k}"]
            m_k = np.zeros((m_drt.shape[0] + num_special, m_drt.shape[1] + num_special))
            if "v_baseline" in special_indices:
                vb_start, vb_end = self.get_special_indices("v_baseline")
                if np.isscalar(v_baseline_penalty):
                    for vbi in range(vb_start, vb_end):
                        m_k[vbi, vbi] = v_baseline_penalty
                else:
                    for i, vbi in enumerate(range(vb_start, vb_end)):
                        m_k[vbi, vbi] = v_baseline_penalty[i]
            if "inductance" in special_indices:
                i_ = special_indices["inductance"]
                m_k[i_, i_] = inductance_penalty
            if "R_inf" in special_indices:
                i_ = special_indices["R_inf"]
                m_k[i_, i_] = ohmic_penalty
            if "C_inv" in special_indices:
                i_ = special_indices["C_inv"]
                m_k[i_, i_] = capacitance_penalty
            if "vz_offset" in special_indices:
                i_ = special_indices["vz_offset"]
                m_k[i_, i_] = 1 / vz_offset_scale
            if "background_scale" in special_indices:
                i_ = special_indices["background_scale"]
                m_k[i_, i_] = background_penalty
            if self.fit_dop:
                m_k[dop_start:dop_end, dop_start:dop_end] = \
                    base_penalty_matrices.get(f"m{k}_dop", 0)
            m_k[num_special:, num_special:] = m_drt
            penalty_matrices[f"m{k}"] = m_k
        return rm, zm, penalty_matrices

    # ------------------------------------------------------------------
    # Lower-bound vector for the QP (reference qphb.py:521-557)
    # ------------------------------------------------------------------
    def _make_lower_bound(self, n, nonneg, neg_allowed_indices=None):
        if nonneg:
            lb = np.zeros(n)
            for sp in self.special_qp_params.values():
                if not sp["nonneg"]:
                    lb[sp["index"]:sp["index"] + sp.get("size", 1)] = -1000.0
        else:
            if neg_allowed_indices is not None:
                lb = self._make_lower_bound(n, True)
                lb[neg_allowed_indices] = -1e5
            else:
                lb = np.full(n, -1e5)
                for sp in self.special_qp_params.values():
                    if sp["nonneg"]:
                        lb[sp["index"]:sp["index"] + sp.get("size", 1)] = 0.0
        return lb

    def _get_neg_allowed_indices(self, nonneg, neg_allowed_tau_range):
        if nonneg and neg_allowed_tau_range is not None:
            raise ValueError("If nonneg==True, neg_allowed_tau_range cannot be specified")
        if not nonneg and neg_allowed_tau_range is not None:
            tau_min, tau_max = neg_allowed_tau_range
            index = np.where((self.basis_tau >= tau_min) & (self.basis_tau <= tau_max))[0]
            return index + self.get_qp_mat_offset()
        return None

    def _get_vz_strength_vec(self, times=None, frequencies=None, fit_times=None,
                             step_times=None, fit_frequencies=None, vz_offset_eps=1):
        """vz_offset coupling strength: 1 in the chrono/EIS overlap region,
        gaussian decay outside it (reference drt1d.py:6173-6226)."""
        if fit_times is None:
            fit_times = self.get_fit_times(True)
        if step_times is None:
            step_times = self.nonconsec_step_times
        if fit_frequencies is None:
            fit_frequencies = self.get_fit_frequencies(True)

        if fit_times is None or fit_frequencies is None or vz_offset_eps is None:
            chrono_s = np.ones(len(times)) if times is not None else None
            eis_s = np.ones(len(frequencies)) if frequencies is not None else None
            return chrono_s, eis_s

        def rbf(y, eps):
            return np.exp(-(eps * y) ** 2)

        fit_td = pp.get_time_since_step(fit_times, step_times, prestep_value=-1)
        chrono_tau_min = np.min(fit_td[fit_td > 0])
        eis_tau_max = np.max(1 / (2 * np.pi * fit_frequencies))

        if times is not None:
            td = pp.get_time_since_step(times, step_times, prestep_value=-1)
            chrono_s = np.ones(len(td))
            mask = td >= eis_tau_max
            chrono_s[mask] = rbf(np.log(td[mask] / eis_tau_max), vz_offset_eps)
            chrono_s[td == -1] = 0
        else:
            chrono_s = None

        if frequencies is not None:
            f_inv = 1 / (2 * np.pi * frequencies)
            eis_s = np.ones(len(frequencies))
            mask = f_inv <= chrono_tau_min
            eis_s[mask] = rbf(np.log(f_inv[mask] / chrono_tau_min), vz_offset_eps)
        else:
            eis_s = None
        return chrono_s, eis_s

    # ------------------------------------------------------------------
    # Core fit (reference drt1d.py:102-1105)
    # ------------------------------------------------------------------
    def _qphb_fit_core(self, times, i_signal, v_signal, frequencies, z,
                       step_times=None, step_sizes=None,
                       nonneg=True, neg_allowed_tau_range=None, series_neg=False,
                       scale_data=True, update_scale=False, solve_rp=False,
                       offset_steps=True, step_offset_size=None,
                       offset_baseline=True, v_baseline_deg=0, v_baseline_sqrt=False,
                       downsample=False, downsample_kw=None, smooth_inf_response=True,
                       subtract_background=False, background_type="static",
                       background_corr_power=None, estimate_background_kw=None,
                       v_baseline_penalty=1e-6, ohmic_penalty=1e-6,
                       inductance_penalty=1e-6, capacitance_penalty=1e-6,
                       inductance_scale=1e-5, capacitance_scale=1e-3,
                       background_penalty=1,
                       remove_extremes=False, extreme_kw=None,
                       init_weights_separately=False,
                       chrono_error_structure="uniform", eis_error_structure=None,
                       remove_outliers=False, return_outlier_index=False, outlier_thresh=0.75,
                       chrono_vmm_epsilon=4, eis_vmm_epsilon=0.25, eis_reim_cor=0.25,
                       iw_l1_lambda_0=1e-4, iw_l2_lambda_0=1e-4,
                       vz_offset=True, vz_offset_scale=1, vz_offset_eps=1,
                       eis_weight_factor=None, chrono_weight_factor=None,
                       hybrid_weight_factor_method=None,
                       eff_hp=True, weight_factor=1,
                       xtol=1e-2, max_iter=50, jit_loop=True, store_history=False,
                       prep_only=False, **kw):
        validation.check_chrono_data(times, i_signal, v_signal)
        validation.check_eis_data(frequencies, z)
        for err_struct in (chrono_error_structure, eis_error_structure):
            validation.check_error_structure(err_struct)
        if series_neg and not nonneg:
            raise ValueError("Only one of series_neg and nonneg may be True")
        if update_scale:
            warnings.warn("update_scale (mid-fit data-scale refinement) is "
                          "not implemented; the scale is set once up front — "
                          "use solve_rp=True for the refined pre-fit Rp "
                          "estimate instead")
        if remove_outliers and kw.get("outlier_p") is None:
            raise ValueError("If remove_outliers is True, outlier_p must be specified "
                             "(a good starting value might be 0.01-0.05)")

        self.v_baseline_deg = v_baseline_deg
        self.v_baseline_sqrt = v_baseline_sqrt

        if times is not None:
            times = np.array(times, dtype=float)
            i_signal = np.array(i_signal, dtype=float)
            v_signal = np.array(v_signal, dtype=float)
        if frequencies is not None:
            frequencies = np.array(frequencies, dtype=float)
            z = np.array(z, dtype=complex)

        # Rough extreme-value removal (reference drt1d.py:187-216)
        if remove_extremes:
            if extreme_kw is None:
                extreme_kw = {"qr_size": 0.8, "qr_thresh": 1.5}
            if times is not None:
                flag = pp.identify_extreme_values(i_signal, **extreme_kw) | \
                    pp.identify_extreme_values(v_signal, **extreme_kw)
                if flag.any():
                    if self.warn:
                        warnings.warn(f"Removing extreme chrono values at indices "
                                      f"{np.where(flag)[0].tolist()}")
                    times, i_signal, v_signal = times[~flag], i_signal[~flag], v_signal[~flag]
            if frequencies is not None:
                flag = pp.identify_extreme_values(z.real, **extreme_kw) | \
                    pp.identify_extreme_values(z.imag, **extreme_kw)
                if flag.any():
                    if self.warn:
                        warnings.warn(f"Removing extreme EIS values at indices "
                                      f"{np.where(flag)[0].tolist()}")
                    frequencies, z = frequencies[~flag], z[~flag]

        # Precise outlier identification via a pre-fit (reference drt1d.py:218-298)
        if remove_outliers:
            chrono_out_idx, eis_out_idx = self._qphb_fit_core(
                times, i_signal, v_signal, frequencies, z,
                step_times=step_times, step_sizes=step_sizes, nonneg=nonneg,
                neg_allowed_tau_range=neg_allowed_tau_range, series_neg=series_neg,
                scale_data=scale_data, solve_rp=solve_rp, offset_steps=offset_steps,
                step_offset_size=step_offset_size, offset_baseline=offset_baseline,
                v_baseline_deg=v_baseline_deg, v_baseline_sqrt=v_baseline_sqrt,
                downsample=downsample, downsample_kw=downsample_kw,
                smooth_inf_response=smooth_inf_response,
                v_baseline_penalty=v_baseline_penalty, ohmic_penalty=ohmic_penalty,
                inductance_penalty=inductance_penalty, capacitance_penalty=capacitance_penalty,
                background_penalty=background_penalty, inductance_scale=inductance_scale,
                capacitance_scale=capacitance_scale,
                chrono_error_structure=chrono_error_structure,
                eis_error_structure=eis_error_structure,
                remove_outliers=False, return_outlier_index=True,
                outlier_thresh=outlier_thresh, chrono_vmm_epsilon=chrono_vmm_epsilon,
                eis_vmm_epsilon=eis_vmm_epsilon, eis_reim_cor=eis_reim_cor, eff_hp=eff_hp,
                **kw)
            self.eis_outlier_index = eis_out_idx
            step_times = self.step_times
            if times is not None and chrono_out_idx is not None \
                    and len(chrono_out_idx) != len(times):
                # The pre-fit ran on a downsampled grid; map its row mask
                # back onto the original samples before indexing them
                t_fit = np.asarray(self.get_fit_times())
                full_mask = np.zeros(len(times), dtype=bool)
                idx = self._match_indices(t_fit, np.asarray(times))
                if idx is not None:
                    full_mask[np.asarray(idx)[chrono_out_idx]] = True
                chrono_out_idx = full_mask
            self.chrono_outlier_index = chrono_out_idx
            if times is not None and chrono_out_idx is not None and chrono_out_idx.any():
                self.chrono_outliers = (times[chrono_out_idx], i_signal[chrono_out_idx],
                                        v_signal[chrono_out_idx])
                times = times[~chrono_out_idx]
                i_signal = i_signal[~chrono_out_idx]
                v_signal = v_signal[~chrono_out_idx]
            else:
                self.chrono_outliers = None
            if frequencies is not None and eis_out_idx is not None and eis_out_idx.any():
                self.eis_outliers = (frequencies[eis_out_idx], z[eis_out_idx])
                frequencies = frequencies[~eis_out_idx]
                z = z[~eis_out_idx]
            else:
                self.eis_outliers = None
            kw["outlier_p"] = None
        else:
            self.eis_outlier_index = None
            self.eis_outliers = None
            self.chrono_outlier_index = None
            self.chrono_outliers = None

        # Chrono background subtraction (reference drt1d.py:305-357).
        # The flexible GP background is estimated from a preliminary fit's
        # residuals and removed from the response before the main fit.
        if subtract_background and times is not None:
            if background_type not in ("static", "dynamic", "scaled"):
                raise ValueError(f"Invalid background_type {background_type!r}. "
                                 "Options: 'static', 'dynamic', 'scaled'")
            ebk = dict(estimate_background_kw or {})
            ebk.setdefault("nonneg", nonneg)
            drt_bkg, bkg_gps, y_bkg = self.estimate_chrono_background(
                times, i_signal, v_signal, copy_self=True, **ebk)
            self.background_gp = bkg_gps[0]
            y_pred_bkg_full = np.asarray(drt_bkg.predict_response(times))
            # Auto correlation-penalty power: penalize background estimates
            # correlated with the model response (reference drt1d.py:326-336)
            if background_corr_power is None and background_type != "static":
                std_ratio = np.std(y_bkg) / np.std(y_pred_bkg_full)
                background_corr_power = np.log(0.02 / std_ratio + 1) + 0.25
            if background_type == "static":
                if background_corr_power is not None:
                    rm_bkg_est = bkg_mod.get_background_matrix(
                        bkg_gps, np.asarray(times)[:, None], y_drt=y_pred_bkg_full,
                        corr_power=background_corr_power)
                    y_resid = np.asarray(v_signal if self.chrono_mode == "galv"
                                         else i_signal, dtype=float) - y_pred_bkg_full
                    self.raw_response_background = rm_bkg_est @ y_resid
                else:
                    self.raw_response_background = np.asarray(y_bkg)
                if self.chrono_mode == "galv":
                    v_signal = v_signal - self.raw_response_background
                else:
                    i_signal = i_signal - self.raw_response_background
            else:
                # dynamic/scaled: the background is handled inside the QP
                # system (projection / scaled column), not pre-subtracted
                self.raw_response_background = None
        else:
            drt_bkg = None
            bkg_gps = None
            self.background_gp = None
            self.raw_response_background = None

        self.series_neg = series_neg

        # Data type
        if times is None:
            data_type = "eis"
            num_eis = len(frequencies)
        elif frequencies is None:
            data_type = "chrono"
            num_eis = 0
        else:
            data_type = "hybrid"
            num_eis = len(frequencies)

        # Special parameter registration (reference drt1d.py:374-410)
        self.special_qp_params = {}
        if times is not None:
            self._add_special_qp_param("v_baseline", False,
                                       self.v_baseline_deg + 1 + int(self.v_baseline_sqrt))
        if vz_offset and data_type == "hybrid":
            self._add_special_qp_param("vz_offset", False)
        if subtract_background and times is not None and background_type == "scaled":
            self._add_special_qp_param("background_scale", True)
        if self.fit_ohmic:
            self._add_special_qp_param("R_inf", True)
        if self.fit_inductance:
            self._add_special_qp_param("inductance", True)
        if self.fit_capacitance:
            self._add_special_qp_param("C_inv", True)
        if self.fit_dop:
            if self.fixed_basis_nu is None:
                self.basis_nu = np.concatenate([np.linspace(-1, -0.4, 25),
                                                np.linspace(0.4, 1, 25)])
            else:
                self.basis_nu = self.fixed_basis_nu
            if self.nu_epsilon is None and self.nu_basis_type != "delta":
                dnu = np.median(np.diff(np.sort(self.basis_nu)))
                self.nu_epsilon = 1 / dnu
            self._add_special_qp_param("x_dop", True, size=len(self.basis_nu))
        else:
            self.basis_nu = None

        # Hyperparameters
        qphb_hypers = hyp_mod.get_default_hypers(eff_hp, self.fit_dop, self.nu_basis_type)
        for key in kw:
            if key not in qphb_hypers:
                raise ValueError(f"Invalid keyword argument {key}")
        qphb_hypers.update(kw)

        sample_data, matrices = self._prep_for_fit(
            times, i_signal, v_signal, frequencies, z, step_times, step_sizes, downsample,
            downsample_kw, offset_steps, step_offset_size, smooth_inf_response, scale_data,
            qphb_hypers["rp_scale"])
        sample_times, sample_i, sample_v, response_baseline, z_scaled = sample_data
        rm_drt, induc_rv, inf_rv, cap_rv, rm_dop, zm_drt, induc_zv, cap_zv, zm_dop, \
            base_penalty_matrices = matrices

        num_chrono = len(sample_times) if sample_times is not None else 0

        self.fit_kwargs.update(qphb_hypers)
        self.fit_kwargs.update({"nonneg": nonneg, "eff_hp": eff_hp,
                                "penalty_type": "integral",
                                "neg_allowed_tau_range": neg_allowed_tau_range})

        neg_allowed_indices = self._get_neg_allowed_indices(nonneg, neg_allowed_tau_range)

        rm, zm, penalty_matrices = self._format_qp_matrices(
            rm_drt, inf_rv, induc_rv, cap_rv, rm_dop, zm_drt, induc_zv, cap_zv, zm_dop,
            base_penalty_matrices, v_baseline_penalty, ohmic_penalty, inductance_penalty,
            capacitance_penalty, vz_offset_scale, background_penalty, inductance_scale,
            capacitance_scale)

        # GP background projection for dynamic/scaled modes
        # (reference drt1d.py:482-492): rm_bkg = K*K^-1 with correlation
        # penalty vs the preliminary model response at the fit sample times
        if subtract_background and times is not None and background_type != "static":
            y_pred_bkg = np.asarray(drt_bkg.predict_response(sample_times))
            rm_bkg = bkg_mod.get_background_matrix(
                bkg_gps, np.asarray(sample_times)[:, None], y_drt=y_pred_bkg,
                corr_power=background_corr_power)
            if background_type == "dynamic":
                # Project the background component out of the design matrix
                rm_orig = rm.copy()
                rm = rm - rm_bkg @ rm
            else:
                rm_orig = None
        else:
            rm_bkg = None
            rm_orig = None

        # Stack response and impedance
        if rm is None:
            rzm = zm.copy()
        elif zm is None:
            rzm = rm.copy()
        else:
            rzm = np.vstack((rm, zm))

        # vz_offset prep (reference drt1d.py:503-522)
        if data_type == "hybrid" and vz_offset:
            if rm_orig is not None:
                # vz_offset relates z to the raw voltage, not the
                # background-projected voltage (reference drt1d.py:504-507)
                rzm_vz = np.vstack((rm_orig, zm))
            else:
                rzm_vz = rzm.copy()
                # Only the delta from baseline is offset-scaled
                vb_start, vb_end = self.get_special_indices("v_baseline")
                rzm_vz[:, vb_start:vb_end] = 0
            chrono_vz, eis_vz = self._get_vz_strength_vec(
                sample_times, frequencies, fit_times=sample_times,
                fit_frequencies=frequencies, vz_offset_eps=vz_offset_eps)
            vz_strength_vec = np.concatenate([chrono_vz, np.tile(eis_vz, 2)])
        else:
            rzm_vz = np.zeros_like(rzm)
            vz_strength_vec = np.ones(rzm.shape[0])

        # Response vector
        if times is not None:
            self.scaled_response_offset = -response_baseline if offset_baseline else 0.0
            rv = self.scaled_response_signal + self.scaled_response_offset
            if subtract_background and background_type == "dynamic":
                rv_orig = rv.copy()
                rv = rv - rm_bkg @ rv
            else:
                rv_orig = None
        else:
            rv = None
            rv_orig = None
        zv = np.concatenate([z_scaled.real, z_scaled.imag]) if frequencies is not None else None
        if times is None:
            rzv = zv.copy()
        elif frequencies is None:
            rzv = rv.copy()
        else:
            rzv = np.concatenate([rv, zv])

        # L1 vector
        l1_lambda_vector = np.zeros(rzm.shape[1])
        l1_lambda_vector[self.get_qp_mat_offset():] = qphb_hypers["l1_lambda_0"]
        if self.fit_dop:
            ds_, de_ = self.dop_indices
            l1_lambda_vector[ds_:de_] = qphb_hypers["dop_l1_lambda_0"]

        # Initial rho and s at prior modes
        k_range = len(qphb_hypers["derivative_weights"])
        rho_vector = np.array(qphb_hypers["rho_0"], dtype=float).copy()
        s_vectors = np.stack([np.ones(rzm.shape[1]) * qphb_hypers["s_0"][k]
                              for k in range(k_range)])
        dop_rho_vector = np.array(qphb_hypers["dop_rho_0"], dtype=float).copy() \
            if self.fit_dop else np.ones(k_range)

        # QPHB static config
        ds_, de_ = self.dop_indices
        cfg = QPHBConfig(num_special=self.get_qp_mat_offset(),
                         dop_start=ds_ or 0,
                         dop_size=(de_ - ds_) if self.fit_dop else 0,
                         k_range=k_range, eff_hp=eff_hp,
                         has_outlier=qphb_hypers.get("outlier_p") is not None)

        lb = self._make_lower_bound(rzm.shape[1], nonneg, neg_allowed_indices)

        # Penalty stack + hypers pytree for the jitted core
        m_stack = np.stack([penalty_matrices[f"m{k}"] for k in range(k_range)])
        dop_gmat = None
        if self.fit_dop:
            g0 = base_penalty_matrices.get("gmat0_dop")
            zeros = np.zeros((cfg.dop_size, cfg.dop_size))
            dop_gmat = [np.asarray(g0) if (k == 0 and g0 is not None) else zeros
                        for k in range(k_range)]

        # Optional data-scale refinement from a quick solution (reference drt1d.py:574-607)
        if scale_data and solve_rp:
            hyp = _hypers_to_pytree(qphb_hypers)
            x_rp = np.asarray(qphb_mod.estimate_x_rp(
                hyp, jnp.asarray(m_stack), jnp.asarray(rho_vector), jnp.asarray(dop_rho_vector),
                jnp.asarray(s_vectors), jnp.asarray(rzv), jnp.asarray(rzm), jnp.asarray(lb),
                cfg))
            rp_est = self.predict_r_p(absolute=True, x=x_rp, raw=True)
            scale_factor = qphb_hypers["rp_scale"] / rp_est
            for vec in (rv, zv, rzv, rv_orig):
                if vec is not None:
                    vec *= scale_factor
            self.update_data_scale(scale_factor)
            if self.fit_dop and self.normalize_dop:
                x_drt_max = np.max(np.abs(x_rp[self.get_qp_mat_offset():]))
                x_dop_max = np.max(np.abs(x_rp[ds_:de_]))
                dop_rescale = x_drt_max / x_dop_max
                self.dop_scale_vector /= dop_rescale
                for mat in (rm, zm, rzm, rzm_vz, rm_orig):
                    if mat is not None:
                        mat[:, ds_:de_] /= dop_rescale
                for k in range(k_range):
                    m_stack[k][ds_:de_, ds_:de_] /= dop_rescale
        elif scale_data and solve_rp is False:
            pass

        # ---------------- Model-specific QP-system modification hook
        # (NonlinearDRT stacks two coefficient sets here; base DRT is a no-op)
        system = {
            "rzm": rzm, "rzv": rzv, "zm": zm, "rm": rm, "num_chrono": num_chrono,
            "m_stack": m_stack, "l1_lambda_vector": l1_lambda_vector, "lb": lb,
            "s_vectors": s_vectors, "rzm_vz": rzm_vz, "vz_strength_vec": vz_strength_vec,
            "cfg": cfg, "nl_cross": None, "sample_times": sample_times,
            "sample_i": sample_i, "sample_v": sample_v, "frequencies": frequencies,
        }
        system = self._modify_qp_system(system, **self._nonlin_kwargs(kw))
        rzm = system["rzm"]
        zm = system["zm"]
        m_stack = system["m_stack"]
        l1_lambda_vector = system["l1_lambda_vector"]
        lb = system["lb"]
        s_vectors = system["s_vectors"]
        rzm_vz = system["rzm_vz"]
        cfg = system["cfg"]
        nl_cross = system["nl_cross"]
        nl_cross_j = jnp.asarray(nl_cross) if nl_cross is not None else None

        # Variance-estimation matrices (grid-keyed like the fit matrices)
        chrono_vmm = None
        if times is not None:
            ckey = ("vmm_c", np.asarray(sample_times).tobytes(),
                    np.atleast_1d(self.nonconsec_step_times).tobytes(),
                    float(chrono_vmm_epsilon), chrono_error_structure)
            chrono_vmm = self._assembly_cache_get(ckey)
            if chrono_vmm is None:
                chrono_vmm = np.asarray(mat1d.construct_chrono_var_matrix(
                    sample_times, self.nonconsec_step_times,
                    chrono_vmm_epsilon, chrono_error_structure))
                self._assembly_cache_put(ckey, chrono_vmm)
        eis_vmm = None
        if frequencies is not None:
            ekey = ("vmm_e", np.asarray(frequencies).tobytes(),
                    float(eis_vmm_epsilon), float(eis_reim_cor),
                    eis_error_structure)
            eis_vmm = self._assembly_cache_get(ekey)
            if eis_vmm is None:
                eis_vmm = np.asarray(mat1d.construct_eis_var_matrix(
                    frequencies, eis_vmm_epsilon, eis_reim_cor,
                    eis_error_structure))
                self._assembly_cache_put(ekey, eis_vmm)
        if chrono_vmm is None:
            vmm = eis_vmm
        elif eis_vmm is None:
            vmm = chrono_vmm
        else:
            vmm = np.zeros((len(rzv), len(rzv)))
            vmm[:num_chrono, :num_chrono] = chrono_vmm
            vmm[num_chrono:, num_chrono:] = eis_vmm

        # Prep-only exit for the ragged batch fitter: return the fully
        # assembled per-observation QP system (exactly what the serial fit
        # would solve) without running weight init or the outer loop. Used by
        # hybdrt_tpu.parallel.ragged to pad/mask heterogeneous observations
        # into one vmapped computation.
        if prep_only:
            return {
                "rzm": rzm, "rzv": rzv, "vmm": vmm, "m_stack": m_stack,
                "l1_lambda_vector": l1_lambda_vector, "lb": lb,
                "s_vectors": s_vectors, "rho_vector": rho_vector,
                "dop_rho_vector": dop_rho_vector, "cfg": cfg,
                "rzm_vz": rzm_vz, "vz_strength_vec": vz_strength_vec,
                "vz_offset": bool(vz_offset and data_type == "hybrid"),
                "vz_index": self.special_qp_params.get("vz_offset", {}).get("index", -1),
                "data_type": data_type, "num_chrono": num_chrono,
                "num_eis": num_eis, "hypers": qphb_hypers,
                "dop_gmat": dop_gmat,
                "outlier_p": qphb_hypers.get("outlier_p"),
                "basis_tau": np.asarray(self.basis_tau),
                "special_qp_params": dict(self.special_qp_params),
                "coefficient_scale": self.coefficient_scale,
                "input_signal_scale": getattr(self, "input_signal_scale", None),
                "response_signal_scale": getattr(self, "response_signal_scale", None),
                "impedance_scale": self.impedance_scale,
                "v_baseline_scale": getattr(self, "v_baseline_scale", None),
                "dop_scale_vector": self.dop_scale_vector,
                "inductance_scale": inductance_scale,
                "capacitance_scale": capacitance_scale,
                "sample_times": sample_times,
                "frequencies": frequencies,
                "hybrid_weight_factor_method": hybrid_weight_factor_method,
                "eis_weight_factor": eis_weight_factor,
                "chrono_weight_factor": chrono_weight_factor,
                "weight_factor": weight_factor,
                "iw_l1_lambda_0": iw_l1_lambda_0, "iw_l2_lambda_0": iw_l2_lambda_0,
                "scaled_response_offset": getattr(self, "scaled_response_offset", None),
            }

        # ---------------- Weight initialization (reference drt1d.py:638-815)
        # (hyp is built only past the prep_only exit: its device_puts are the
        # dominant cost of a cache-warm prep-only call, parallel/ragged.py)
        hyp = _hypers_to_pytree(qphb_hypers)
        iw_hypers = dict(qphb_hypers)
        iw_hypers["l1_lambda_0"] = iw_l1_lambda_0
        iw_hypers["l2_lambda_0"] = iw_l2_lambda_0
        if "dop_l2_lambda_0" in qphb_hypers:
            iw_hypers["dop_l2_lambda_0"] = qphb_hypers["dop_l2_lambda_0"] \
                / qphb_hypers["l2_lambda_0"] * iw_l2_lambda_0
        iw_hyp = _hypers_to_pytree(iw_hypers)

        outlier_p = qphb_hypers.get("outlier_p")

        def init_w(rv_, rm_, vmm_):
            est, init, x_over, out_t = qphb_mod.initialize_weights(
                iw_hyp, jnp.asarray(m_stack), jnp.asarray(rho_vector),
                jnp.asarray(dop_rho_vector), jnp.asarray(s_vectors), jnp.asarray(rv_),
                jnp.asarray(rm_), jnp.asarray(vmm_), jnp.asarray(lb), cfg,
                outlier_p=outlier_p, nl_cross=nl_cross_j)
            return np.asarray(est), np.asarray(init), np.asarray(x_over), np.asarray(out_t)

        if init_weights_separately and data_type == "hybrid":
            c_est, c_init, x_over_c, c_out_t = init_w(rv, rm, chrono_vmm)
            e_est, e_init, x_over_e, e_out_t = init_w(zv, zm, eis_vmm)
            chrono_weight_scale = np.mean(c_est ** -2) ** -0.5
            eis_weight_scale = np.mean(e_est ** -2) ** -0.5
        else:
            est_weights, init_weights, x_overfit, outlier_t = init_w(rzv, rzm, vmm)
            if num_eis == 0:
                c_est, c_init, x_over_c, c_out_t = est_weights, init_weights, x_overfit, outlier_t
                e_est = e_init = x_over_e = e_out_t = None
                chrono_weight_scale = np.mean(c_est ** -2) ** -0.5
                eis_weight_scale = None
            elif num_chrono == 0:
                e_est, e_init, x_over_e, e_out_t = est_weights, init_weights, x_overfit, outlier_t
                c_est = c_init = x_over_c = c_out_t = None
                eis_weight_scale = np.mean(e_est ** -2) ** -0.5
                chrono_weight_scale = None
            else:
                c_est, e_est = est_weights[:num_chrono], est_weights[num_chrono:]
                c_init, e_init = init_weights[:num_chrono], init_weights[num_chrono:]
                x_over_c, x_over_e = x_overfit[:num_chrono], x_overfit[num_chrono:]
                c_out_t, e_out_t = outlier_t[:num_chrono], outlier_t[num_chrono:]
                chrono_weight_scale = np.mean(c_est ** -2) ** -0.5
                eis_weight_scale = np.mean(e_est ** -2) ** -0.5

        # Hybrid weight factors (reference drt1d.py:744-807)
        if data_type == "hybrid":
            if eis_weight_factor is None or chrono_weight_factor is None:
                if hybrid_weight_factor_method == "weight":
                    ratio = (eis_weight_scale / chrono_weight_scale) ** 0.25
                    if eis_weight_factor is None:
                        eis_weight_factor = 1 / ratio
                    if chrono_weight_factor is None:
                        chrono_weight_factor = ratio
                elif hybrid_weight_factor_method == "rp":
                    rp_eis = pp.estimate_rp(None, None, None, None, None, self.z_fit)
                    rp_chrono = pp.estimate_rp(sample_times, self.step_times, self.step_sizes,
                                               self.raw_response_signal, self.step_model, None)
                    rp_tot = self.coefficient_scale * qphb_hypers["rp_scale"]
                    if eis_weight_factor is None:
                        eis_weight_factor = rp_eis ** 0.75 / (rp_chrono ** 0.25 * rp_tot ** 0.5)
                    if chrono_weight_factor is None:
                        chrono_weight_factor = rp_chrono ** 0.75 / (rp_eis ** 0.25 * rp_tot ** 0.5)
                elif hybrid_weight_factor_method is None:
                    eis_weight_factor = 1.0
                    chrono_weight_factor = 1.0
                else:
                    raise ValueError(f"Invalid hybrid_weight_factor_method "
                                     f"{hybrid_weight_factor_method}; options: 'weight', 'rp', None")
            est_weights = np.concatenate([c_est, e_est])
            init_weights = np.concatenate([c_init, e_init])
            outlier_t = np.concatenate([c_out_t, e_out_t])
        elif data_type == "eis":
            est_weights, init_weights, outlier_t = e_est, e_init, e_out_t
            eis_weight_factor = 1.0
            chrono_weight_factor = 1.0
        else:
            est_weights, init_weights, outlier_t = c_est, c_init, c_out_t
            eis_weight_factor = 1.0
            chrono_weight_factor = 1.0

        # Outlier index request (reference drt1d.py:819-835)
        if return_outlier_index:
            outlier_index = (1 - outlier_t) > outlier_thresh
            if times is None:
                eis_idx, chrono_idx = outlier_index, None
            elif frequencies is None:
                eis_idx, chrono_idx = None, outlier_index
            else:
                chrono_idx = outlier_index[:num_chrono]
                eis_idx = outlier_index[num_chrono:]
            if eis_idx is not None:
                eis_idx = eis_idx[:len(frequencies)] | eis_idx[len(frequencies):]
            return chrono_idx, eis_idx

        # ---------------- Run the QPHB loop
        x0 = np.zeros(rzm.shape[1]) + 1e-6
        fcfg = fitcore.FitConfig(
            cfg=cfg, data_type=data_type, num_chrono=num_chrono,
            vz_offset=bool(vz_offset and data_type == "hybrid"),
            vz_index=self.special_qp_params.get("vz_offset", {}).get("index", -1),
            bkg_scaled=bool(subtract_background and times is not None
                            and background_type == "scaled"),
            bkg_index=self.special_qp_params.get("background_scale", {}).get("index", -1),
            max_iter=max_iter, x_rtol=xtol, max_hp_iter=1)
        rm_bkg_arg = jnp.asarray(rm_bkg) if fcfg.bkg_scaled else None

        dop_gmat_arg = jnp.stack([jnp.asarray(g) for g in dop_gmat]) if dop_gmat is not None \
            else None
        loop_args = (jnp.asarray(rzm), jnp.asarray(rzv), jnp.asarray(vmm),
                     jnp.asarray(m_stack), dop_gmat_arg, jnp.asarray(l1_lambda_vector),
                     jnp.asarray(lb), hyp, jnp.asarray(x0), jnp.asarray(s_vectors),
                     jnp.asarray(rho_vector), jnp.asarray(dop_rho_vector),
                     jnp.asarray(init_weights), jnp.asarray(est_weights),
                     jnp.asarray(outlier_t), jnp.asarray(rzm_vz),
                     jnp.asarray(vz_strength_vec), jnp.asarray(float(chrono_weight_factor)),
                     jnp.asarray(float(eis_weight_factor)),
                     jnp.asarray(np.asarray(weight_factor, dtype=float)))

        nl_cross_arg = nl_cross_j
        if store_history or not jit_loop:
            state, rzm_final, history = fitcore.qphb_fit_eager(*loop_args, fcfg,
                                                               nl_cross=nl_cross_arg,
                                                               rm_bkg=rm_bkg_arg)
            self.qphb_history = history
        else:
            state, rzm_final = fitcore.qphb_fit_loop(*loop_args, fcfg,
                                                     nl_cross=nl_cross_arg,
                                                     rm_bkg=rm_bkg_arg)
            self.qphb_history = None

        x = np.asarray(state.x)
        weights = np.asarray(state.weights) * weight_factor
        s_vectors_out = np.asarray(state.s_vectors)
        rho_out = np.asarray(state.rho_vector)
        dop_rho_out = np.asarray(state.dop_rho_vector)
        rzm = np.asarray(rzm_final)

        if not bool(state.converged) and self.warn:
            warnings.warn(f"Solution did not converge within {max_iter} iterations. "
                          "This is usually not an issue.")

        scaled_weights = weights.copy()
        if data_type == "hybrid":
            scaled_weights[:num_chrono] *= chrono_weight_factor
            scaled_weights[num_chrono:] *= eis_weight_factor

        p_matrix, q_vector = qphb_mod.calculate_pq(
            jnp.asarray(rzm), jnp.asarray(rzv), jnp.asarray(m_stack), hyp,
            jnp.asarray(l1_lambda_vector), jnp.asarray(rho_out), jnp.asarray(dop_rho_out),
            jnp.asarray(s_vectors_out), jnp.asarray(scaled_weights), cfg,
            nl_cross=nl_cross_j)
        p_matrix = np.asarray(p_matrix)
        q_vector = np.asarray(q_vector)

        # Extract the estimated background (reference drt1d.py:1013-1030).
        # Static mode already stored it (raw units, full time grid) pre-fit.
        if subtract_background and times is not None and background_type != "static":
            if background_type == "dynamic":
                resid = rv_orig - rm_orig @ x
                self.raw_response_background = (rm_bkg @ resid) * self.response_signal_scale
            else:  # scaled
                bkg_idx = self.special_qp_params["background_scale"]["index"]
                rzm_resid = rzm.copy()
                rzm_resid[:, bkg_idx] = 0
                resid = (rzv - rzm_resid @ x)[:num_chrono]
                self.raw_response_background = (rm_bkg @ resid) \
                    * self.response_signal_scale * x[bkg_idx]
        elif times is not None and self.raw_response_background is None:
            self.raw_response_background = np.zeros(num_chrono)

        self.qphb_params = {
            "est_weights": est_weights.copy(),
            "init_weights": init_weights.copy(),
            "weights": scaled_weights.copy(),
            "true_weights": weights.copy(),
            "chrono_weight_factor": chrono_weight_factor,
            "eis_weight_factor": eis_weight_factor,
            "xmx_norms": np.asarray(state.xmx_norms),
            "dop_xmx_norms": np.asarray(state.dop_xmx_norms),
            "x_overfit_chrono": x_over_c,
            "x_overfit_eis": x_over_e,
            "p_matrix": p_matrix,
            "q_vector": q_vector,
            "x_raw": np.asarray(x),
            "rho_vector": rho_out,
            "dop_rho_vector": dop_rho_out if self.fit_dop else None,
            "s_vectors": [s_vectors_out[k] for k in range(k_range)],
            "outlier_t": np.asarray(state.outlier_t),
            "vmm": vmm,
            "l1_lambda_vector": l1_lambda_vector,
            "rm": rzm,
            "rv": rzv,
            "penalty_matrices": {f"m{k}": m_stack[k] for k in range(k_range)},
            "hypers": qphb_hypers,
            "num_eis": num_eis,
            "num_chrono": num_chrono,
            "n_iter": int(state.it),
            "converged": bool(state.converged),
            "vz_strength_vec": vz_strength_vec,
            "lb": lb,
            "cfg": cfg,
        }

        # Sigma vectors from unscaled weights
        sigma_vec = weights ** -1
        if data_type == "hybrid":
            v_sigma = sigma_vec[:num_chrono] * self.response_signal_scale
            z_sigma = eis_utils.concat_vector_to_complex(sigma_vec[num_chrono:]) \
                * self.impedance_scale
        elif data_type == "eis":
            v_sigma = None
            z_sigma = eis_utils.concat_vector_to_complex(sigma_vec) * self.impedance_scale
        else:
            v_sigma = sigma_vec * self.response_signal_scale
            z_sigma = None

        self.fit_parameters = self.extract_qphb_parameters(x)
        self.fit_parameters["v_sigma_tot"] = v_sigma
        self.fit_parameters["v_sigma_res"] = None
        self.fit_parameters["z_sigma_tot"] = z_sigma
        self.fit_parameters["vz_offset_eps"] = vz_offset_eps
        self.fit_parameters["p_matrix"] = p_matrix
        self.fit_parameters["q_vector"] = q_vector
        self.fit_type = f"qphb_{data_type}"

    def _modify_qp_system(self, system, **kw):
        """Hook for model variants to restructure the QP system before the
        solver loop (see NonlinearDRT). Base DRT: identity."""
        return system

    def _nonlin_kwargs(self, kw):
        return {}

    # ------------------------------------------------------------------
    # Public fit API (reference drt1d.py:1197-1268)
    # ------------------------------------------------------------------
    def fit_eis(self, frequencies, z, nonneg=True, neg_allowed_tau_range=None,
                scale_data=True, update_scale=False, error_structure=None,
                vmm_epsilon=0.25, vmm_reim_cor=0.25, **kwargs):
        """Self-tuning Bayesian DRT fit of an EIS spectrum."""
        self._qphb_fit_core(None, None, None, frequencies, z, nonneg=nonneg,
                            neg_allowed_tau_range=neg_allowed_tau_range,
                            scale_data=scale_data, update_scale=update_scale,
                            eis_error_structure=error_structure,
                            eis_vmm_epsilon=vmm_epsilon, eis_reim_cor=vmm_reim_cor, **kwargs)
        return self

    def fit_chrono(self, times, i_signal, v_signal, step_times=None, step_sizes=None,
                   nonneg=True, neg_allowed_tau_range=None, scale_data=True,
                   update_scale=False, offset_baseline=True, offset_steps=True,
                   step_offset_size=None, downsample=False, downsample_kw=None,
                   subtract_background=False, estimate_background_kw=None,
                   smooth_inf_response=True, error_structure="uniform", vmm_epsilon=4,
                   **kwargs):
        """Self-tuning Bayesian DRT fit of chronopotentiometry data."""
        self._qphb_fit_core(times, i_signal, v_signal, None, None, step_times=step_times,
                            step_sizes=step_sizes, nonneg=nonneg,
                            neg_allowed_tau_range=neg_allowed_tau_range,
                            scale_data=scale_data, update_scale=update_scale,
                            offset_steps=offset_steps, step_offset_size=step_offset_size,
                            offset_baseline=offset_baseline, downsample=downsample,
                            downsample_kw=downsample_kw,
                            subtract_background=subtract_background,
                            estimate_background_kw=estimate_background_kw,
                            smooth_inf_response=smooth_inf_response,
                            chrono_error_structure=error_structure,
                            chrono_vmm_epsilon=vmm_epsilon, **kwargs)
        return self

    def fit_hybrid(self, times, i_signal, v_signal, frequencies, z, step_times=None,
                   step_sizes=None, nonneg=True, neg_allowed_tau_range=None, scale_data=True,
                   update_scale=False, offset_steps=True, step_offset_size=None,
                   offset_baseline=True, downsample=False, downsample_kw=None,
                   smooth_inf_response=True, vz_offset=True, vz_offset_scale=1,
                   vz_offset_eps=1, chrono_error_structure="uniform",
                   eis_error_structure=None, chrono_vmm_epsilon=4, eis_vmm_epsilon=0.25,
                   eis_reim_cor=0.25, eis_weight_factor=None, chrono_weight_factor=None,
                   **kwargs):
        """Joint time/frequency-domain ("hybrid") DRT fit."""
        self._qphb_fit_core(times, i_signal, v_signal, frequencies, z, step_times=step_times,
                            step_sizes=step_sizes, nonneg=nonneg,
                            neg_allowed_tau_range=neg_allowed_tau_range,
                            scale_data=scale_data, update_scale=update_scale,
                            offset_steps=offset_steps, step_offset_size=step_offset_size,
                            offset_baseline=offset_baseline, downsample=downsample,
                            downsample_kw=downsample_kw,
                            smooth_inf_response=smooth_inf_response,
                            chrono_error_structure=chrono_error_structure,
                            eis_error_structure=eis_error_structure,
                            chrono_vmm_epsilon=chrono_vmm_epsilon,
                            eis_vmm_epsilon=eis_vmm_epsilon, eis_reim_cor=eis_reim_cor,
                            vz_offset=vz_offset, vz_offset_scale=vz_offset_scale,
                            vz_offset_eps=vz_offset_eps, eis_weight_factor=eis_weight_factor,
                            chrono_weight_factor=chrono_weight_factor, **kwargs)
        return self

    # ------------------------------------------------------------------
    # Parameter extraction (reference drt1d.py:6228-6289)
    # ------------------------------------------------------------------
    def extract_qphb_parameters(self, x, rescale=True):
        def scale_value(value, scale):
            return value * scale if rescale else scale

        x = np.asarray(x)
        special_indices = {k: v["index"] for k, v in self.special_qp_params.items()}
        fit_parameters = {"x": scale_value(x[self.get_qp_mat_offset():],
                                           self.coefficient_scale)}

        if "R_inf" in special_indices:
            fit_parameters["R_inf"] = scale_value(x[special_indices["R_inf"]],
                                                  self.coefficient_scale)
        else:
            fit_parameters["R_inf"] = 0

        if "v_baseline" in special_indices:
            vb_start, vb_end = self.get_special_indices("v_baseline")
            vbx = x[vb_start:vb_end].copy()
            vbx = scale_value(vbx, 1.0 / self.v_baseline_scale)
            vbx[0] -= self.scaled_response_offset
            fit_parameters["v_baseline"] = scale_value(vbx, self.response_signal_scale)

        if "vz_offset" in special_indices:
            fit_parameters["vz_offset"] = x[special_indices["vz_offset"]]

        if "inductance" in special_indices:
            fit_parameters["inductance"] = scale_value(
                x[special_indices["inductance"]],
                self.coefficient_scale * self.inductance_scale)
        else:
            fit_parameters["inductance"] = 0

        if "C_inv" in special_indices:
            fit_parameters["C_inv"] = scale_value(
                x[special_indices["C_inv"]],
                self.coefficient_scale * self.capacitance_scale)
        else:
            fit_parameters["C_inv"] = 0

        if "background_scale" in special_indices:
            fit_parameters["background_scale"] = x[special_indices["background_scale"]]

        if self.fit_dop:
            ds_, de_ = self.dop_indices
            fit_parameters["x_dop"] = scale_value(
                x[ds_:de_], self.dop_scale_vector * self.coefficient_scale)

        return fit_parameters

    def get_drt_params(self, x=None, sign=1):
        if x is None:
            x = self.fit_parameters["x"]
        x = np.asarray(x)
        if self.series_neg:
            n = len(self.basis_tau)
            if sign == 1:
                return x[:n]
            elif sign == -1:
                return -x[n:]
            else:
                return x[:n] - x[n:]
        return x

    # ------------------------------------------------------------------
    # Prediction (reference drt1d.py:2962-3694)
    # ------------------------------------------------------------------
    @on_host
    def predict_distribution(self, tau=None, ppd=20, order=0, x=None, sign=None,
                             normalize=False):
        """gamma(ln tau) (and derivatives) on an evaluation grid."""
        if tau is None:
            tau = self.get_tau_eval(ppd)
        em = basis.func_eval_matrix_host(
            np.log(self.basis_tau), np.log(np.asarray(tau)),
            self.tau_basis_type, self.tau_epsilon, order, self.zga_params)
        if sign is None:
            sign = 0 if self.series_neg else 1
        if x is None:
            x = self.get_drt_params(sign=sign) if self.series_neg \
                else self.fit_parameters["x"]
        else:
            x = np.asarray(x)
            n_coef = (2 if self.series_neg else 1) * len(self.basis_tau)
            if len(x) > n_coef:
                # Raw solver-space vector (special params + scaled coefs),
                # e.g. a pfrt_result["step_x"] row or qphb history entry:
                # strip specials and unscale (reference drt1d.plot_drt(x=...))
                x = self.extract_qphb_parameters(x)["x"]
            if len(x) > len(self.basis_tau):
                x = self.get_drt_params(x, sign)
        out = em @ x
        if normalize:
            out = out / self.predict_r_p(absolute=True)
        return out

    predict_drt = predict_distribution

    # ------------------------------------------------------------------
    # Peak analysis (reference drt1d.py:3753-4115)
    # ------------------------------------------------------------------
    def find_peaks(self, tau=None, x=None, normalize=True, ppd=10, prominence=None,
                   height=None, sign=1, return_info=False, method="thresh",
                   prob_thresh=0.25, fxx_var_floor=1e-5, num_peaks=None, **kw):
        """Find peaks in the DRT via curvature minima, optionally filtered by
        posterior peak probability (method='prob')."""
        from scipy import signal as sp_signal
        from scipy.special import ndtr
        if method not in ("thresh", "prob"):
            raise ValueError(f"Invalid method {method}; options: thresh, prob")
        if tau is None:
            tau = self.get_tau_eval(ppd)
        tau = np.asarray(tau)
        fxx = self.predict_distribution(tau=tau, x=x, order=2, sign=sign,
                                        normalize=normalize)
        if prominence is None:
            prominence = 0.05 * np.std(fxx[~np.isinf(fxx)]) + 5e-3 \
                if method == "thresh" else 5e-3
        if height is None:
            height = 0 if method == "thresh" else 1e-3

        if self.fit_kwargs.get("nonneg", True) and sign != 0:
            peak_indices, peak_info = sp_signal.find_peaks(-sign * fxx, height=height,
                                                           prominence=prominence, **kw)
        else:
            f = self.predict_distribution(tau=tau, x=x, order=0, sign=sign,
                                          normalize=normalize)
            idx_list, info_list = [], []
            for peak_sign in (-1, 1):
                p_idx, p_info = sp_signal.find_peaks(-peak_sign * fxx, height=height,
                                                     prominence=prominence, **kw)
                pos = peak_sign * f[p_idx] > 0
                idx_list.append(p_idx[pos])
                info_list.append({k: v[pos] for k, v in p_info.items()})
            peak_indices = np.concatenate(idx_list)
            peak_info = {k: np.concatenate([pi[k] for pi in info_list])
                         for k in info_list[0].keys()}
            order_idx = np.argsort(peak_indices)
            peak_indices = peak_indices[order_idx]
            peak_info = {k: v[order_idx] for k, v in peak_info.items()}

        if method == "prob" and len(peak_indices) > 0:
            min_prom = np.minimum(peak_info["prominences"], peak_info["peak_heights"])
            fxx_cov = self.estimate_distribution_cov(tau=tau, order=2)
            fxx_sigma = np.sqrt(np.maximum(np.diag(fxx_cov), fxx_var_floor))
            if normalize:
                fxx_sigma = fxx_sigma / self.predict_r_p(absolute=True)
            # P(|peak| > 0) from the normal posterior of the curvature
            peak_prob = 2 * ndtr(min_prom / fxx_sigma[peak_indices]) - 1
            if num_peaks is not None:
                prob_sort = np.sort(peak_prob)[::-1]
                prob_thresh = prob_sort[min(num_peaks - 1, len(peak_prob) - 1)]
            keep = peak_prob >= prob_thresh
            peak_info["probs"] = peak_prob
            peak_indices = peak_indices[keep]

        if return_info:
            return tau[peak_indices], tau, peak_indices, peak_info
        return tau[peak_indices]

    def estimate_peak_coef(self, tau=None, peak_indices=None, x=None, sign=1,
                           epsilon_factor=1.25, max_epsilon=1.25, min_epsilon=None,
                           epsilon_uniform=None, peak_tau=None, trough_tau=None,
                           **find_peaks_kw):
        """Split the coefficient vector into per-peak contributions
        (reference drt1d.py:3974)."""
        from .. import peaks as peaks_mod
        if peak_indices is not None and tau is None:
            raise ValueError("If peak_indices are provided, the tau grid must also be provided")
        x = self.get_drt_params(x, sign)
        if peak_indices is None and peak_tau is None:
            _, tau, peak_indices, _ = self.find_peaks(x=x, sign=sign, return_info=True,
                                                      **find_peaks_kw)
        if tau is None:
            tau = self.get_tau_eval(10)
        f = self.predict_distribution(tau, x=x, sign=sign)
        fxx = self.predict_distribution(tau, x=x, sign=sign, order=2)
        peak_weights = peaks_mod.estimate_peak_weight_distributions(
            tau, f, fxx, peak_indices, self.basis_tau, epsilon_factor, max_epsilon,
            min_epsilon, epsilon_uniform, peak_tau=peak_tau, trough_tau=trough_tau)
        return x * peak_weights

    def estimate_peak_distributions(self, tau=None, ppd=10, tau_find_peaks=None,
                                    peak_indices=None, x=None, sign=1,
                                    find_peaks_kw=None, **peak_coef_kw):
        """Per-peak gamma(ln tau) curves on an evaluation grid.
        ``find_peaks_kw`` (reference name) merges into the peak-finding
        kwargs forwarded through estimate_peak_coef."""
        if tau is None:
            tau = self.get_tau_eval(ppd)
        if find_peaks_kw:
            peak_coef_kw = {**find_peaks_kw, **peak_coef_kw}
        x_peaks = self.estimate_peak_coef(tau=tau_find_peaks, peak_indices=peak_indices,
                                          x=x, sign=sign, **peak_coef_kw)
        return np.stack([self.predict_distribution(tau, x=xp) for xp in x_peaks])

    # Reference-compatible alias (reference drt1d.py:3984)
    estimate_peak_drts = estimate_peak_distributions

    def quantify_peaks(self, tau=None, ppd=10, **kw):
        """Per-peak polarization resistance contributions (reference drt1d.py:4101)."""
        x_peaks = self.estimate_peak_coef(tau=tau, **kw)
        return np.array([self.predict_r_p(x=xp) for xp in x_peaks])

    @on_host
    def predict_dop(self, nu=None, x=None, order=0, normalize=False,
                    normalize_tau=None, delta_density=False):
        """DOP distribution over nu (reference drt1d.py:3273-3361)."""
        if not self.fit_dop:
            raise ValueError("DOP was not fitted")
        if nu is None:
            nu = np.linspace(-1, 1, 201)
        if x is None:
            x = self.fit_parameters["x_dop"]
        em = basis.func_eval_matrix_host(
            np.asarray(self.basis_nu), np.asarray(nu), self.nu_basis_type,
            self.nu_epsilon, order)
        out = em @ np.asarray(x)
        if normalize:
            tau_ref = normalize_tau if normalize_tau is not None else self.basis_tau
            sv = np.asarray(phasance.phasor_scale_vector(nu, tau_ref))
            out = out / sv
        return out

    @property
    def tau_basis_area(self):
        """Area of one tau basis function (reference drtbase.py:256)."""
        return basis.get_basis_func_area(self.tau_basis_type, self.tau_epsilon,
                                         self.zga_params)

    @property
    def nu_basis_area(self):
        """Area of one nu (DOP) basis function (reference drtbase.py:260)."""
        return basis.get_basis_func_area(self.nu_basis_type, self.nu_epsilon)

    @property
    def num_chrono(self):
        """Number of fitted chrono data points (reference drtbase.py:599)."""
        t = self.get_fit_times()
        return 0 if t is None else len(t)

    @property
    def num_eis(self):
        """Number of fitted EIS frequencies (reference drtbase.py:608)."""
        return 0 if self.f_fit is None else len(np.atleast_1d(self.f_fit))

    def plot_zga_approximation(self, ax=None):
        """Compare the ZGA (ZARC-Gaussian approximation) basis function to
        the exact gaussian RBF it approximates (reference drtbase.py:549)."""
        import matplotlib.pyplot as plt
        if self.zga_params is None:
            raise ValueError("ZGA parameters have not been set")
        if ax is None:
            _, ax = plt.subplots(figsize=(4, 3))
        y = np.linspace(-3 / self.tau_epsilon, 3 / self.tau_epsilon, 400)
        phi_rbf = basis.get_basis_func("gaussian")
        phi_zga = basis.get_basis_func("zga", self.zga_params)
        ax.plot(y, np.asarray(phi_rbf(jnp.asarray(y), self.tau_epsilon)),
                label="exact RBF")
        ax.plot(y, np.asarray(phi_zga(jnp.asarray(y), self.tau_epsilon)),
                ls="--", label="ZGA")
        ax.set_xlabel(r"$y = \ln(\tau/\tau_0)$")
        ax.set_ylabel(r"$\phi(y)$")
        ax.legend()
        return ax

    def get_tau_eval(self, ppd, extend_decades=0):
        """Evaluation grid spanning basis_tau +- extend_decades."""
        log_min = np.log10(np.min(self.basis_tau)) - extend_decades
        log_max = np.log10(np.max(self.basis_tau)) + extend_decades
        num = int((log_max - log_min) * ppd) + 1
        return np.logspace(log_min, log_max, num)

    # ------------------------------------------------------------------
    # Prediction-matrix caching (reference drtbase.py:716-1086): repeated
    # predictions — PFRT/dual-inversion inner loops call predict_z on the
    # same grid many times — reuse the fit matrices (when the requested grid
    # matches or embeds in the fit grid via rel_round matching) or the last
    # built prediction matrix, instead of re-assembling per call.
    # ------------------------------------------------------------------
    @staticmethod
    def _match_indices(x, y, precision=10):
        """Row indices such that y[idx] == x elementwise (to relative
        precision, any ordering), or None if x is not contained in y."""
        from ..utils.array import rel_round
        xr = np.atleast_1d(rel_round(np.asarray(x, dtype=float), precision))
        yr = np.atleast_1d(rel_round(np.asarray(y, dtype=float), precision))
        lookup = {v: i for i, v in enumerate(yr)}
        idx = np.empty(len(xr), dtype=int)
        for i, v in enumerate(xr):
            j = lookup.get(v)
            if j is None:
                return None
            idx[i] = j
        return idx

    def _basis_signature(self):
        bt = np.asarray(self.basis_tau, dtype=float)
        zga = None
        if self.zga_params is not None:
            zga = tuple(np.asarray(p, dtype=float).tobytes()
                        for p in self.zga_params)
        return (self.tau_basis_type, float(self.tau_epsilon), bt.tobytes(),
                zga, self.integrate_method)

    def _get_impedance_pred_matrix(self, frequencies):
        sig = self._basis_signature()
        f = np.asarray(frequencies, dtype=float)
        # Fit-matrix reuse / subset slicing
        zm_fit = self.fit_matrices.get("impedance")
        if zm_fit is not None and getattr(self, "_fit_zm_signature", None) == sig \
                and np.size(self.f_fit):
            idx = self._match_indices(f, self.f_fit)
            if idx is not None:
                # Stored fit matrices carry the subclass sign (DCT inverts them
                # in _prep_for_fit); callers re-apply _dist_matrix_sign, so
                # un-invert here (sign^2 == 1). The flag lets sign-conditional
                # subclasses (DCT) distinguish this branch from fresh builds.
                self._pred_from_fit_matrices = True
                return self._dist_matrix_sign * zm_fit[idx]
        self._pred_from_fit_matrices = False
        entry = getattr(self, "_pred_mat_cache", {}).get("z")
        if entry is not None and entry[0] == sig:
            idx = self._match_indices(f, entry[1])
            if idx is not None:
                return entry[2][idx]
        zm = np.asarray(mat1d.construct_impedance_matrix(
            f, "real", tau=self.basis_tau, basis_type=self.tau_basis_type,
            epsilon=self.tau_epsilon, integrate_method=self.integrate_method,
            zga_params=self.zga_params,
            interpolate_grids=self.interpolate_lookups["z_real"])) \
            + 1j * np.asarray(mat1d.construct_impedance_matrix(
                f, "imag", tau=self.basis_tau, basis_type=self.tau_basis_type,
                epsilon=self.tau_epsilon, integrate_method=self.integrate_method,
                zga_params=self.zga_params,
                interpolate_grids=self.interpolate_lookups["z_imag"]))
        if not hasattr(self, "_pred_mat_cache"):
            self._pred_mat_cache = {}
        self._pred_mat_cache["z"] = (sig, f.copy(), zm)
        return zm

    def _get_response_pred_matrix(self, times, step_times, step_sizes, tau_rise):
        sig = self._basis_signature() + (
            self.step_model, self.chrono_mode,
            None if tau_rise is None else float(np.atleast_1d(tau_rise)[0]),
            tuple(np.round(np.atleast_1d(step_times).astype(float), 12).tolist()),
            tuple(np.round(np.atleast_1d(step_sizes).astype(float), 12).tolist()))
        times = np.asarray(times, dtype=float)
        rm_fit = self.fit_matrices.get("response")
        t_fit = self.get_fit_times()
        if rm_fit is not None and getattr(self, "_fit_rm_signature", None) == sig \
                and t_fit is not None and np.size(t_fit):
            idx = self._match_indices(times, t_fit)
            if idx is not None:
                # Un-apply the subclass sign stored in the fit matrix (see
                # _get_impedance_pred_matrix).
                self._pred_from_fit_matrices = True
                return self._dist_matrix_sign * rm_fit[idx]
        self._pred_from_fit_matrices = False
        entry = getattr(self, "_pred_mat_cache", {}).get("response")
        if entry is not None and entry[0] == sig:
            idx = self._match_indices(times, entry[1])
            if idx is not None:
                return entry[2][idx]
        rm, _ = mat1d.construct_response_matrix(
            self.basis_tau, times, self.step_model, step_times, step_sizes,
            basis_type=self.tau_basis_type, epsilon=self.tau_epsilon,
            tau_rise=tau_rise, op_mode=self.chrono_mode,
            integrate_method=self.integrate_method, zga_params=self.zga_params,
            interpolate_grids=self.interpolate_lookups["response"])
        rm = np.asarray(rm)
        if not hasattr(self, "_pred_mat_cache"):
            self._pred_mat_cache = {}
        self._pred_mat_cache["response"] = (sig, times.copy(), rm)
        return rm

    @on_host
    def predict_z(self, frequencies=None, include_vz_offset=True, x=None,
                  include_dop=True, include_drt=True, include_inductance=True,
                  include_ohmic=True, include_cap=True):
        if frequencies is None:
            frequencies = self.get_f_predict()
            if frequencies is None:
                frequencies = self.get_fit_frequencies()
        frequencies = np.asarray(frequencies)
        zm = self._get_impedance_pred_matrix(frequencies)

        if x is not None and not isinstance(x, dict):
            fit_parameters = self.extract_qphb_parameters(x)
        elif isinstance(x, dict):
            fit_parameters = x
        else:
            fit_parameters = self.fit_parameters

        x_drt = self.get_drt_params(fit_parameters["x"], sign=0) if self.series_neg \
            else fit_parameters["x"]
        z = np.zeros(len(frequencies), dtype=complex)
        if include_drt:
            z = z + self._dist_matrix_sign * (zm @ x_drt)
        if include_ohmic:
            z = z + fit_parameters.get("R_inf", 0)
        if include_inductance:
            z = z + fit_parameters.get("inductance", 0) * 2j * np.pi * frequencies
        if include_cap:
            c_inv = fit_parameters.get("C_inv", 0)
            z = z + c_inv / (2j * np.pi * frequencies)
        if self.fit_dop and include_dop and fit_parameters.get("x_dop") is not None:
            zm_dop = np.asarray(phasance.construct_phasor_z_matrix(
                frequencies, self.basis_nu, self.nu_basis_type, self.nu_epsilon))
            z = z + self._dist_matrix_sign * (zm_dop @ fit_parameters["x_dop"])
        if include_vz_offset and "vz_offset" in self.special_qp_params:
            _, vz_strength = self._get_vz_strength_vec(
                None, frequencies, vz_offset_eps=self.fit_parameters.get("vz_offset_eps"))
            z = z * (1 - fit_parameters.get("vz_offset", 0) * vz_strength)
        return z

    @on_host
    def predict_response(self, times=None, step_times=None, step_sizes=None, x=None,
                         include_vz_offset=True, subtract_background=False, v_baseline=None):
        """Predicted chrono response (reference drt1d.py:3363-3499)."""
        if times is None:
            times = self.get_t_predict()
            if times is None:
                times = self.get_fit_times()
        times = np.asarray(times)
        step_times = self.step_times if step_times is None else step_times
        step_sizes = self.step_sizes if step_sizes is None else step_sizes
        tau_rise = self.tau_rise

        rm = self._get_response_pred_matrix(times, step_times, step_sizes, tau_rise)

        fit_parameters = self.fit_parameters if x is None else (
            x if isinstance(x, dict) else self.extract_qphb_parameters(x))
        x_drt = self.get_drt_params(fit_parameters["x"], sign=0) if self.series_neg \
            else fit_parameters["x"]

        response = self._dist_matrix_sign * (rm @ x_drt)
        # Special contributions
        inf_rv = np.asarray(mat1d.construct_ohmic_response_vector(
            times, self.step_model, step_times, step_sizes, tau_rise,
            pp.generate_model_signal(times, step_times, step_sizes, tau_rise, self.step_model),
            False, self.chrono_mode))
        response = response + fit_parameters.get("R_inf", 0) * inf_rv
        cap_rv = np.asarray(mat1d.construct_capacitance_response_vector(
            times, self.step_model, step_times, step_sizes, tau_rise, self.chrono_mode)) \
            if self.fit_capacitance else 0
        if self.fit_capacitance:
            response = response + fit_parameters.get("C_inv", 0) * cap_rv
        if self.fit_dop and fit_parameters.get("x_dop") is not None:
            rm_dop, _ = phasance.construct_phasor_v_matrix(
                times, self.basis_nu, self.nu_basis_type, self.nu_epsilon, self.step_model,
                step_times, step_sizes, self.chrono_mode)
            response = response + self._dist_matrix_sign \
                * (np.asarray(rm_dop) @ fit_parameters["x_dop"])

        # Hybrid cross-domain offset: the solver scales chrono rows by
        # (1 + vz_offset * strength); predictions must match (reference
        # predict_response applies it before the baseline)
        if include_vz_offset and "vz_offset" in self.special_qp_params:
            vz_strength, _ = self._get_vz_strength_vec(
                times, None,
                vz_offset_eps=self.fit_parameters.get("vz_offset_eps"))
            response = response * (1 + fit_parameters.get("vz_offset", 0)
                                   * vz_strength)

        if v_baseline is None:
            v_baseline = fit_parameters.get("v_baseline", None)
        if v_baseline is not None:
            from .background import get_baseline_matrix
            vb_mat = get_baseline_matrix(times, self.v_baseline_deg, normalize=False,
                                         sqrt=self.v_baseline_sqrt)
            response = response + vb_mat @ np.atleast_1d(v_baseline)
        return response

    def predict_r_p(self, sign=None, absolute=False, x=None, raw=False):
        basis_area = basis.get_basis_func_area(self.tau_basis_type, self.tau_epsilon,
                                               self.zga_params)
        if sign is None:
            sign = 0 if self.series_neg else 1
        if raw:
            x = np.asarray(x)
            if len(x) > self.num_drt_params:
                x = x[self.get_qp_mat_offset():]
        else:
            x = self.get_drt_params(x, sign)
        sum_x = np.sum(np.abs(x)) if absolute else np.sum(x)
        return sum_x * basis_area

    def predict_r_inf(self):
        r_inf = self.fit_parameters.get("R_inf", 0)
        if self.fit_dop and self.nu_basis_type == "delta":
            zero_index = np.where(self.basis_nu == 0)[0]
            if len(zero_index) == 1:
                r_inf = r_inf + np.sum(self.fit_parameters["x_dop"][zero_index])
        return r_inf

    def predict_r_tot(self):
        return self.predict_r_inf() + self.predict_r_p()

    def integrate_drt(self, tau_min, tau_max, ppd=10, **predict_kw):
        num_decades = np.log10(tau_max) - np.log10(tau_min)
        tau = np.logspace(np.log10(tau_min), np.log10(tau_max), int(num_decades * ppd) + 1)
        gamma = self.predict_distribution(tau, **predict_kw)
        return np.trapezoid(gamma, x=np.log(tau))

    # Reference-compatible alias (reference drt1d.py:3586)
    integrate_distribution = integrate_drt

    def get_dop_norm(self, nu, normalize=False, normalize_tau=None,
                     normalize_quantiles=(0.25, 0.75)):
        """Normalization vector for DOP queries (reference drt1d.py:3349)."""
        if not normalize:
            return 1.0
        if normalize_tau is None:
            normalize_tau = pp.get_tau_lim(self.get_fit_frequencies(True),
                                           self.get_fit_times(True),
                                           self.nonconsec_step_times)
        sv = np.asarray(phasance.phasor_scale_vector(np.asarray(nu),
                                                     np.asarray(normalize_tau),
                                                     normalize_quantiles))
        return sv / basis.get_basis_func_area(self.nu_basis_type, self.nu_epsilon)

    def get_offset_pq(self):
        """(P, q) with data-dependent special params marginalized out
        (delegates to mapping.resolve.get_offset_pq)."""
        from ..mapping.resolve import get_offset_pq
        return get_offset_pq(self)

    def get_drt_norm(self, normalize, normalize_by=None, x=None, absolute=False):
        """Normalization constant for distribution queries
        (reference drt1d.py:3020)."""
        if normalize_by is not None:
            return normalize_by
        if normalize:
            return self.predict_r_p(x=x, absolute=absolute)
        return 1.0

    # ------------------------------------------------------------------
    # Uncertainty (reference drt1d.py:3063-3258, 4116-4146)
    # ------------------------------------------------------------------
    @on_host
    def estimate_param_cov(self, p_matrix=None):
        """Covariance = P^-1 with coefficient rescaling (reference drt1d.py:4116)."""
        if p_matrix is None:
            if self.qphb_params is not None:
                p_matrix = self.qphb_params["p_matrix"]
            else:
                # Rebuilt batched/ragged fits carry (P, q) in fit_parameters
                p_matrix = self.fit_parameters.get("p_matrix")
            if p_matrix is None:
                raise ValueError("No P matrix available; fit first or pass p_matrix")
        p_inv = np.asarray(mat1d.invert_psd(jnp.asarray(p_matrix), use_cholesky=True))
        if p_inv is None:
            return None
        scale_vec = np.ones(p_matrix.shape[0]) * self.coefficient_scale
        for name in self.special_qp_params:
            start, end = self.get_special_indices(name)
            if name == "v_baseline":
                scale_vec[start:end] = self.response_signal_scale / self.v_baseline_scale
            elif name == "inductance":
                scale_vec[start:end] = self.coefficient_scale * self.inductance_scale
            elif name == "C_inv":
                scale_vec[start:end] = self.coefficient_scale * self.capacitance_scale
            elif name == "vz_offset":
                scale_vec[start:end] = 1.0
            elif name == "x_dop":
                scale_vec[start:end] = self.coefficient_scale * self.dop_scale_vector
        return p_inv * scale_vec[:, None] * scale_vec[None, :]

    @on_host
    def generate_map_samples(self, shift_scale=1.5, deltas=(-3, -2, -1, 1, 2, 3),
                             refresh=False):
        """Explore the posterior around the MAP by conditional re-optimization.

        For every DRT coefficient index i and shift delta, coordinate i is
        pinned at x_hat_i + delta*sigma_i*shift_scale (sigma from the Laplace
        covariance P^-1) and the remaining coordinates are re-optimized under
        the converged hyperparameters; the sample's joint log-posterior is
        recorded. ALL pinned-coordinate QPs solve as one vmapped computation.

        Reference parity note: drt1d.py:4147 implements the same sampling
        scheme via qphb.optimize_lp_semi_fixed, which is commented out
        upstream (qphb.py:1424) — the reference method raises AttributeError.
        This is a working TPU-native equivalent: pinning is expressed by
        zeroing row/column i of P (unit diagonal, q_i = -v) so every sample
        is the same static-shape box QP, batchable with vmap.

        Results are cached in ``self.map_samples`` as a dict with raw-space
        ``x`` (n_samples, n_params), ``lp`` (n_samples,), and ``lp_hat``.
        """
        kwargs = {"shift_scale": shift_scale, "deltas": tuple(deltas)}
        if not refresh and getattr(self, "map_samples", None) is not None \
                and self.map_sample_kw == kwargs:
            return self.map_samples
        if self.qphb_params is None or "x_raw" not in self.qphb_params:
            raise ValueError("Fit the model (fit_eis/fit_chrono/fit_hybrid) "
                             "before sampling")
        qp = self.qphb_params
        P = np.asarray(qp["p_matrix"])
        q = np.asarray(qp["q_vector"])
        lb = np.asarray(qp["lb"], dtype=float)
        x_hat = np.asarray(qp["x_raw"], dtype=float)
        n = len(x_hat)
        ns = self.get_qp_mat_offset()

        # Laplace sigma in raw coefficient space
        p_inv = np.asarray(mat1d.invert_psd(jnp.asarray(P), use_cholesky=True))
        sigma_x = np.sqrt(np.maximum(np.diagonal(p_inv), 0))

        import jax
        from ..ops.qp import solve_qp_box
        from ..solver.qphb import evaluate_posterior_lp

        # Refine the MAP against the FINAL hyperparameter system: the stored
        # iterate solved the previous outer iteration's QP, so a pinned
        # sample could otherwise (slightly) beat it. (The reference notes the
        # same effect and re-optimizes first, drt1d.py:4186.)
        x_hat = np.asarray(solve_qp_box(jnp.asarray(P), jnp.asarray(q),
                                        jnp.asarray(lb),
                                        x_init=jnp.asarray(x_hat)).x)

        # Sample grid: (index, delta) pairs over the DRT block
        idx = np.repeat(np.arange(ns, n), len(deltas))
        dlt = np.tile(np.asarray(deltas, dtype=float), n - ns)
        v = x_hat[idx] + dlt * sigma_x[idx] * shift_scale
        v = np.maximum(v, lb[idx])  # respect the nonneg/box constraint

        P_j = jnp.asarray(P)
        q_j = jnp.asarray(q)
        lb_j = jnp.asarray(lb)
        eye = jnp.eye(n)

        def solve_pinned(i, v_i):
            m = 1.0 - eye[i]  # 0 at the pinned coordinate
            P_pin = P_j * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
            q_pin = m * (q_j + P_j[:, i] * v_i) - eye[i] * v_i
            res = solve_qp_box(P_pin, q_pin, lb_j)
            return res.x

        x_samples = jax.jit(jax.vmap(solve_pinned))(jnp.asarray(idx),
                                                    jnp.asarray(v))

        hyp = _hypers_to_pytree(qp["hypers"])
        k_range = qp["cfg"].k_range
        m_stack = jnp.stack([jnp.asarray(qp["penalty_matrices"][f"m{k}"])
                             for k in range(k_range)])
        s_stack = jnp.stack([jnp.asarray(s) for s in qp["s_vectors"]])

        def lp_of(x_s):
            return evaluate_posterior_lp(
                x_s, jnp.asarray(qp["rm"]), jnp.asarray(qp["rv"]), m_stack, hyp,
                jnp.asarray(qp["l1_lambda_vector"]), jnp.asarray(qp["rho_vector"]),
                None if qp["dop_rho_vector"] is None
                else jnp.asarray(qp["dop_rho_vector"]),
                s_stack, jnp.asarray(qp["weights"]),
                jnp.asarray(qp["xmx_norms"]), qp["cfg"])

        lp = np.asarray(jax.jit(jax.vmap(lp_of))(x_samples))
        lp_hat = float(jax.jit(lp_of)(jnp.asarray(x_hat)))

        self.map_samples = {"x": np.asarray(x_samples), "lp": lp,
                            "lp_hat": lp_hat, "x_hat": x_hat,
                            "index": idx, "delta": dlt}
        self.map_sample_kw = kwargs
        return self.map_samples

    def get_parameter_quantile(self, quantile, **sample_kw):
        """Posterior parameter quantiles from lp-weighted MAP samples
        (reference drt1d.py:4403; see generate_map_samples for the parity
        note). `quantile` may be a scalar or a sequence; returns
        (n_quantiles, n_params) raw-space values."""
        from ..utils.array import weighted_quantile_2d
        samples = self.generate_map_samples(**sample_kw)
        x_all = np.vstack([samples["x_hat"][None, :], samples["x"]])
        lp_all = np.concatenate([[samples["lp_hat"]], samples["lp"]])
        w = np.exp(lp_all - np.max(lp_all))
        return weighted_quantile_2d(x_all, np.atleast_1d(quantile),
                                    sample_weight=w)

    def estimate_posterior_mean(self, **sample_kw):
        """Posterior-mean coefficient vector from lp-weighted MAP samples
        (reference drt1d.py:4415; see generate_map_samples for the parity
        note). Returns the raw-space vector including the MAP itself as a
        sample; pass through extract_qphb_parameters for physical values."""
        samples = self.generate_map_samples(**sample_kw)
        x_hat = samples["x_hat"]
        x_all = np.vstack([x_hat[None, :], samples["x"]])
        lp_all = np.concatenate([[samples["lp_hat"]], samples["lp"]])
        w = np.exp(lp_all - np.max(lp_all))
        return np.average(x_all, axis=0, weights=w)

    @on_host
    def estimate_distribution_cov(self, tau=None, ppd=20, order=0, extend_var=True,
                                  p_matrix=None, sign=None, normalize=False,
                                  var_floor=0.0):
        """Covariance of gamma(ln tau) via B Sigma_x B^T (reference drt1d.py:3063)."""
        if tau is None:
            tau = self.get_tau_eval(ppd)
        cov = self.estimate_param_cov(p_matrix=p_matrix)
        if cov is None:
            return None
        ns = self.get_qp_mat_offset()
        cov_drt = cov[ns:, ns:]
        em = basis.func_eval_matrix_host(
            np.log(self.basis_tau), np.log(np.asarray(tau)),
            self.tau_basis_type, self.tau_epsilon, order, self.zga_params)
        if self.series_neg:
            if sign is None:
                sign = 0
            if sign == 0:
                em = np.hstack([em, -em])
            elif sign == 1:
                em = np.hstack([em, np.zeros_like(em)])
            else:
                em = np.hstack([np.zeros_like(em), -em])
        dist_cov = em @ cov_drt @ em.T
        if normalize:
            dist_cov = dist_cov / self.predict_r_p(absolute=True) ** 2
        if var_floor:
            dist_cov[np.diag_indices_from(dist_cov)] = np.maximum(
                np.diag(dist_cov), var_floor)
        if extend_var:
            # Extrapolate uncertainty beyond the basis range (reference drt1d.py:3124)
            tau = np.asarray(tau)
            var = np.diag(dist_cov).copy()
            left = tau < self.basis_tau[0]
            right = tau > self.basis_tau[-1]
            if left.any():
                ref_var = var[~left][0] if (~left).any() else 0
                factor = (np.log(self.basis_tau[0] / tau[left])) ** 2
                var[left] += ref_var * factor
                dist_cov[left, left] = var[left]
            if right.any():
                ref_var = var[~right][-1] if (~right).any() else 0
                factor = (np.log(tau[right] / self.basis_tau[-1])) ** 2
                var[right] += ref_var * factor
                dist_cov[right, right] = var[right]
        return dist_cov

    def predict_drt_ci(self, tau=None, ppd=20, order=0, quantiles=(0.025, 0.975),
                       x=None, sign=None, normalize=False):
        """Credible interval of the DRT from the Laplace posterior."""
        from scipy.special import ndtri
        if tau is None:
            tau = self.get_tau_eval(ppd)
        dist_cov = self.estimate_distribution_cov(tau=tau, order=order, sign=sign,
                                                  normalize=normalize)
        if dist_cov is None:
            return None, None
        sigma = np.sqrt(np.maximum(np.diag(dist_cov), 0))
        mu = self.predict_distribution(tau=tau, order=order, x=x, sign=sign,
                                       normalize=normalize)
        out = [mu + ndtri(q) * sigma for q in quantiles]
        return out[0], out[1]

    # Reference-compatible alias (reference drt1d.py:3200)
    predict_distribution_ci = predict_drt_ci

    @on_host
    def estimate_dop_cov(self, nu=None, p_matrix=None, normalize=False,
                         normalize_tau=None, var_floor=0.0, order=0,
                         delta_density=False):
        """Covariance of the DOP distribution (reference drt1d.py:3153)."""
        if not self.fit_dop:
            raise ValueError("DOP was not fitted")
        if nu is None:
            nu = self.basis_nu
        em = basis.func_eval_matrix_host(
            np.asarray(self.basis_nu), np.asarray(nu), self.nu_basis_type,
            self.nu_epsilon, order)
        x_cov = self.estimate_param_cov(p_matrix=p_matrix)
        if x_cov is None:
            return None
        ds_, de_ = self.dop_indices
        x_cov = x_cov[ds_:de_, ds_:de_]
        if delta_density and self.nu_basis_type == "delta":
            x_cov = x_cov / self.get_nu_basis_spacing()
        dist_cov = em @ x_cov @ em.T
        if normalize:
            tau_ref = normalize_tau if normalize_tau is not None else self.basis_tau
            sv = np.asarray(phasance.phasor_scale_vector(np.asarray(nu), tau_ref))
            dist_cov = dist_cov / (sv[:, None] * sv[None, :])
        if var_floor > 0:
            dist_cov[np.diag_indices_from(dist_cov)] = np.maximum(
                np.diag(dist_cov), var_floor)
        return dist_cov

    def predict_dop_ci(self, nu=None, x=None, normalize=False, normalize_tau=None,
                       quantiles=(0.025, 0.975), order=0, delta_density=False):
        """Credible interval of the DOP (reference drt1d.py:3233)."""
        from scipy.special import ndtri
        if nu is None:
            nu = self.basis_nu
        dist_cov = self.estimate_dop_cov(nu=nu, order=order, normalize=normalize,
                                         normalize_tau=normalize_tau,
                                         delta_density=delta_density)
        if dist_cov is None:
            return None, None
        sigma = np.sqrt(np.maximum(np.diag(dist_cov), 0))
        mu = self.predict_dop(nu=nu, x=x, order=order, normalize=normalize,
                              normalize_tau=normalize_tau,
                              delta_density=delta_density)
        out = [mu + ndtri(q) * sigma for q in quantiles]
        return out[0], out[1]

    def get_nu_basis_spacing(self):
        """Per-point minimum spacing of the nu basis grid (reference
        drt1d.py:3261-3271), used to convert delta magnitudes to densities."""
        basis_nu = self.fixed_basis_nu if self.fixed_basis_nu is not None \
            else self.basis_nu
        dnu = np.diff(np.sort(np.asarray(basis_nu)))
        dnu = np.minimum(dnu[1:], dnu[:-1])
        med = np.median(dnu) if len(dnu) else 1.0
        return np.concatenate([[med], dnu, [med]])

    def get_dop_params(self, x=None):
        if x is None:
            x = self.fit_parameters["x_dop"]
        return np.asarray(x)

    def default_dist_sign(self):
        """Sign convention for distribution queries (reference drt1d.py:2990)."""
        return 0 if self.series_neg else 1

    def get_data_tau_limits(self):
        """(tau_min, tau_max) covered by the measured data
        (reference drt1d.py:93-98)."""
        return pp.get_tau_lim(self.get_fit_frequencies(True), self.get_fit_times(True),
                              self.nonconsec_step_times)

    def predict_v_baseline(self, times, x_vb=None):
        """Fitted baseline polynomial evaluated at times (reference
        drt1d.py:3466)."""
        times = np.asarray(times)
        if "v_baseline" in self.fit_parameters:
            from .background import get_baseline_matrix
            vb_mat = get_baseline_matrix(times, self.v_baseline_deg, normalize=False,
                                         sqrt=self.v_baseline_sqrt)
            if x_vb is None:
                x_vb = np.atleast_1d(self.fit_parameters["v_baseline"])
            return vb_mat @ np.atleast_1d(x_vb)
        return np.zeros_like(times, dtype=float)

    def predict_sigma(self, measurement):
        """Estimated data-space noise level ('chrono' or 'eis')
        (reference drt1d.py:3544)."""
        key = {"chrono": "v_sigma_tot", "eis": "z_sigma_tot"}.get(measurement)
        if key is None:
            raise ValueError(f"Invalid measurement {measurement}; "
                             "options: 'chrono', 'eis'")
        return self.fit_parameters.get(key, None)

    def split_r_p(self, tau_splits, resolve_peaks=False, **predict_kw):
        """Split the polarization resistance into contributions between
        tau_splits boundaries (reference drt1d.py:3596)."""
        from ..utils.array import nearest_index
        tau_splits = sorted(tau_splits)
        if "tau" in predict_kw:
            tau = np.asarray(predict_kw.pop("tau"))
        else:
            tau = self.get_tau_eval(predict_kw.pop("ppd", 20))
        gamma = self.predict_distribution(tau, **predict_kw)
        split_index = [nearest_index(tau, ts) for ts in tau_splits]
        start_index = np.array([0] + split_index)
        end_index = np.array(split_index + [len(tau)]) + 1
        if resolve_peaks:
            fxx = self.predict_distribution(tau, order=2, **predict_kw)
            peak_index = [int(np.argmin(fxx[i:j])) + i
                          for i, j in zip(start_index, end_index)]
            peak_coef = self.estimate_peak_coef(tau, peak_indices=peak_index)
            return np.array([self.predict_r_p(x=pc) for pc in peak_coef])
        return np.array([np.trapezoid(gamma[i:j], x=np.log(tau[i:j]))
                         for i, j in zip(start_index, end_index)])

    def evaluate_chi_sq(self, frequencies=None, z=None, x=None, weights=None,
                        **predict_kw):
        """Chi-squared of the impedance fit (reference drt1d.py:3631)."""
        from .. import evaluation
        if frequencies is None:
            frequencies = self.get_fit_frequencies()
        if z is None:
            z = self.z_fit
        if weights is not None:
            if isinstance(weights, str) and weights == "modulus":
                weights = 1 / np.abs(z)
            elif np.shape(weights) != np.shape(z):
                raise ValueError("Weights must have same shape as z")
        z_hat = self.predict_z(frequencies, x=x, **predict_kw)
        return evaluation.chi_sq(z, z_hat, weights=weights)

    def fisher_matrix(self, weighted=True):
        """Gauss-Newton information matrix of the data fit
        (reference drt1d.py:4140)."""
        rm = np.asarray(self.qphb_params["rm"])
        if weighted:
            rm = rm * np.asarray(self.qphb_params["weights"])[:, None]
        return rm.T @ rm

    def predict_peak_trough_probs(self, tau=None, x=None, bayes_cov=True,
                                  p_matrix=None):
        """Pointwise P(peak), P(trough) from the distribution and its
        derivatives with Laplace uncertainties (reference drt1d.py:3655)."""
        from ..mapping.surface import peak_prob, trough_prob
        if tau is None:
            tau = self.get_tau_eval(10)
        mus, bvar = [], []
        for order in (0, 1, 2):
            mus.append(self.predict_distribution(tau, x=x, order=order))
            if bayes_cov:
                cov = self.estimate_distribution_cov(tau, p_matrix=p_matrix,
                                                     order=order, extend_var=True)
                sigma = np.diag(cov) ** 0.5
                # Floor on sigma (reference drt1d.py:3676-3680)
                iqr = np.percentile(sigma, 75) - np.percentile(sigma, 25)
                sigma = np.maximum(sigma, np.median(sigma) - 1.5 * iqr)
                bvar.append(sigma ** 2)
        f_var, fx_var, fxx_var = bvar if bayes_cov else (None, None, None)
        pp_ = peak_prob(*mus, f_var=f_var, fx_var=fx_var, fxx_var=fxx_var)
        tp_ = trough_prob(*mus, f_var=f_var, fx_var=fx_var, fxx_var=fxx_var)
        return pp_, tp_

    def predict_peak_prob(self, tau=None, x=None, bayes_cov=True, p_matrix=None):
        """Semi-quantitative probability of peak existence over tau
        (reference drt1d.py:3693)."""
        pp_, tp_ = self.predict_peak_trough_probs(tau, x, bayes_cov=bayes_cov,
                                                  p_matrix=p_matrix)
        return pp_ * (1 - tp_)

    def find_peaks_byprob(self, tau=None, x=None, prob=None, height=None,
                          prominence=None, bayes_cov=True, p_matrix=None,
                          return_info=False):
        """Peak finding on the peak-probability function
        (reference drt1d.py:3720)."""
        from scipy import signal as sp_signal
        if tau is None:
            tau = self.get_tau_eval(10)
        tau = np.asarray(tau)
        if prob is None:
            prob = self.predict_peak_prob(tau, x, bayes_cov=bayes_cov,
                                          p_matrix=p_matrix)
        peak_indices, peak_info = sp_signal.find_peaks(prob, height=height,
                                                       prominence=prominence)
        if return_info:
            return tau[peak_indices], tau, peak_indices, peak_info
        return tau[peak_indices]

    # ------------------------------------------------------------------
    # Plotting (reference drt1d.py:4547-5420; rendering in ..plotting)
    # ------------------------------------------------------------------
    def plot_eis_fit(self, ax=None, plot_type="nyquist", tau=None, axes=None,
                     plot_data=True, data_kw=None, data_label="data",
                     label="fit", bode_rep="cartesian", **kw):
        """Measured vs fitted impedance (reference drt1d.plot_eis_fit).

        ``plot_type`` in ('nyquist', 'bode', 'all'); positional-style kwargs
        (``c=...``) style the FIT line, ``data_kw`` styles the measured
        points (reference drt1d.py:4559)."""
        from .. import plotting as plt_mod
        import matplotlib.pyplot as plt
        freq = self.get_fit_frequencies()
        z_hat = self.predict_z(freq)
        if axes is None:
            axes = ax
        if data_kw is None:
            data_kw = dict(s=20, alpha=0.6)
        # rep only reaches plot_bode; the 'all' combo shares kwargs with
        # plot_nyquist, which doesn't take it
        extra = {"rep": bode_rep} if plot_type == "bode" else {}
        if plot_type == "all" and axes is None:
            _, axes = plt.subplots(1, 3, figsize=(11, 3))
        if plot_data and self.z_fit is not None:
            axes = plt_mod.plot_eis((freq, self.z_fit), plot_type=plot_type,
                                    axes=axes, label=data_label,
                                    **extra, **data_kw)
        axes = plt_mod.plot_eis((freq, z_hat), plot_type=plot_type, axes=axes,
                                plot_func="plot", label=label, **extra, **kw)
        if plot_type == "nyquist":
            axes.legend()
        return axes

    def plot_eis_residuals(self, axes=None, norm=None, show_sigma=True, **kw):
        """Real/imag impedance fit residuals with +-3 sigma band
        (reference drt1d.plot_eis_residuals)."""
        import matplotlib.pyplot as plt
        freq = self.get_fit_frequencies()
        z_hat = self.predict_z(freq)
        resid = z_hat - self.z_fit
        if norm == "modulus":
            resid = resid / np.abs(self.z_fit)
        if axes is None:
            _, axes = plt.subplots(1, 2, figsize=(7, 2.75))
        sigma = self.predict_sigma("eis")
        for ax, part, lab in ((axes[0], resid.real, r"$\hat{Z}^{\prime} - Z^{\prime}$"),
                              (axes[1], resid.imag, r"$\hat{Z}^{\prime\prime} - Z^{\prime\prime}$")):
            ax.scatter(freq, part, s=10, **kw)
            if sigma is not None and show_sigma and norm is None:
                s = sigma if np.isrealobj(sigma) else np.abs(sigma)
                ax.fill_between(freq, -3 * s, 3 * s, color="k", alpha=0.15,
                                label=r"$\pm 3\sigma$")
            ax.axhline(0, c="k", lw=0.5)
            ax.set_xscale("log")
            ax.set_xlabel("$f$ (Hz)")
            ax.set_ylabel(lab + (r" ($\Omega$)" if norm is None else " (norm.)"))
        axes[0].get_figure().tight_layout()
        return axes

    def plot_distribution(self, tau=None, ppd=20, ax=None, x=None, sign=None,
                          normalize=False, order=0, show_ci=True, plot_ci=None,
                          quantiles=(0.025, 0.975), mark_peaks=False,
                          mark_peaks_kw=None, return_line=False, **kw):
        """The fitted DRT with optional credible band and peak markers
        (reference drt1d.plot_distribution; ``plot_ci`` is the reference's
        name for ``show_ci``, ``return_line=True`` also returns the Line2D)."""
        from .. import plotting as plt_mod
        if plot_ci is not None:
            show_ci = plot_ci
        if tau is None:
            tau = self.get_tau_eval(ppd)
        gamma = self.predict_distribution(tau, x=x, sign=sign, normalize=normalize,
                                          order=order)
        scale_prefix = kw.pop("scale_prefix", None)
        if scale_prefix is None:
            scale_prefix = plt_mod.get_scale_prefix(gamma)
        ax = plt_mod.plot_distribution(tau, gamma, ax=ax, scale_prefix=scale_prefix,
                                       **kw)
        line = ax.get_lines()[-1] if ax.get_lines() else None
        scale = plt_mod._scale_factor(scale_prefix)
        if show_ci and x is None:
            lo, hi = self.predict_drt_ci(tau=tau, order=order, sign=sign,
                                         normalize=normalize, quantiles=quantiles)
            if lo is not None:
                ax.fill_between(tau, lo / scale, hi / scale, color="k", alpha=0.2)
        if mark_peaks:
            self.mark_peaks(ax, x=x, sign=sign, scale_prefix=scale_prefix,
                            **(mark_peaks_kw or {}))
        if return_line:
            return ax, line
        return ax

    plot_drt = plot_distribution

    def mark_peaks(self, ax, x=None, sign=None, peak_tau=None, scale_prefix="",
                   **kw):
        """Mark peak locations on a distribution plot
        (reference drt1d.mark_peaks)."""
        from .. import plotting as plt_mod
        if peak_tau is None:
            peak_tau = self.find_peaks(x=x, sign=sign if sign is not None else 1)
        gamma = self.predict_distribution(np.asarray(peak_tau), x=x, sign=sign)
        scale = plt_mod._scale_factor(scale_prefix)
        kw = dict({"marker": "v", "c": "k", "s": 40}, **kw)
        ax.scatter(peak_tau, gamma / scale, **kw)
        return ax

    def plot_peak_drts(self, ax=None, tau=None, ppd=10, peak_gammas=None,
                       estimate_peak_drts_kw=None, x=None, sign=None, **kw):
        """Plot the per-peak distributions from the peak decomposition
        (reference drt1d.py:4066)."""
        import matplotlib.pyplot as plt
        from .. import plotting as plt_mod
        if tau is None:
            tau = self.get_tau_eval(ppd)
        if peak_gammas is None:
            peak_gammas = self.estimate_peak_drts(
                tau=tau, x=x, sign=sign if sign is not None else 1,
                **(estimate_peak_drts_kw or {}))
        if ax is None:
            _, ax = plt.subplots(figsize=(4, 3))
        scale_prefix = kw.pop("scale_prefix", None)
        if scale_prefix is None:
            scale_prefix = plt_mod.get_scale_prefix(np.sum(peak_gammas, axis=0))
        scale = plt_mod._scale_factor(scale_prefix)
        for gamma in peak_gammas:
            ax.plot(tau, gamma / scale, **kw)
        ax.set_xscale("log")
        ax.set_xlabel(r"$\tau$ (s)")
        ax.set_ylabel(rf"$\gamma$ ({scale_prefix}$\Omega$)")
        ax.get_figure().tight_layout()
        return ax

    def copy(self):
        """Deep copy of the model, fit state included (reference
        drt1d.py:6392)."""
        import copy as _copy
        return _copy.deepcopy(self)

    def plot_chrono_fit(self, ax=None, transform_time=False, **kw):
        """Measured vs fitted chrono response (reference drt1d.plot_chrono_fit)."""
        from .. import plotting as plt_mod
        times = self.get_fit_times()
        y_hat = self.predict_response()
        ax = plt_mod.plot_chrono((times, None, self.raw_response_signal), ax=ax,
                                 step_times=self.step_times,
                                 transform_time=transform_time, label="data", **kw)
        x_plot = plt_mod.get_transformed_plot_time(times, self.step_times) \
            if transform_time else times
        ax.plot(x_plot, y_hat, c="k", label="fit")
        ax.legend()
        return ax

    def plot_chrono_residuals(self, ax=None, transform_time=False, show_sigma=True,
                              **kw):
        """Chrono fit residuals (reference drt1d.plot_chrono_residuals)."""
        import matplotlib.pyplot as plt
        from .. import plotting as plt_mod
        times = self.get_fit_times()
        resid = self.predict_response() - self.raw_response_signal
        if ax is None:
            _, ax = plt.subplots(figsize=(4, 3))
        x_plot = plt_mod.get_transformed_plot_time(times, self.step_times) \
            if transform_time else times
        ax.scatter(x_plot, resid, s=10, **kw)
        sigma = self.predict_sigma("chrono")
        if sigma is not None and show_sigma:
            ax.fill_between(x_plot, -3 * sigma, 3 * sigma, color="k", alpha=0.15)
        ax.axhline(0, c="k", lw=0.5)
        ax.set_xlabel("$t$ (s)")
        ax.set_ylabel(r"$\hat{v} - v$ (V)")
        return ax

    def plot_chrono_correction(self, ax=None, transform_time=False,
                               show_background=True, **kw):
        """Raw vs background-corrected chrono response, with the estimated
        background (reference drt1d.plot_chrono_correction)."""
        import matplotlib.pyplot as plt
        from .. import plotting as plt_mod
        times = self.get_fit_times()
        y_meas = np.asarray(self.raw_response_signal)
        y_bkg = np.asarray(self.raw_response_background) \
            if self.raw_response_background is not None else np.zeros_like(y_meas)
        if len(y_bkg) != len(y_meas):
            # static mode stores the background on the full input time grid;
            # re-evaluate the fitted GP at the fit times instead
            y_bkg = np.asarray(self.predict_chrono_background(times))
        if ax is None:
            _, ax = plt.subplots(figsize=(4, 2.75))
        x_plot = plt_mod.get_transformed_plot_time(times, self.step_times) \
            if transform_time else times
        ax.plot(x_plot, y_meas, ".", ms=3, label="raw", **kw)
        ax.plot(x_plot, y_meas - y_bkg, ".", ms=3, label="corrected")
        if show_background:
            y_vb = self.predict_v_baseline(times)
            ax.plot(x_plot, y_bkg + y_vb, c="k", lw=1, label="background")
        ax.set_xlabel("$t$ (s)")
        ax.set_ylabel("$v$ (V)")
        ax.legend()
        return ax

    def plot_dop(self, ax=None, nu=None, normalize=True, show_ci=True,
                 quantiles=(0.025, 0.975), **kw):
        """The fitted DOP with optional credible band (reference
        drt1d.plot_dop)."""
        from .. import plotting as plt_mod
        ax = plt_mod.plot_dop(self, ax=ax, nu=nu, normalize=normalize, **kw)
        if show_ci:
            if nu is None:
                nu = np.linspace(-1, 1, 201)
            lo, hi = self.predict_dop_ci(nu=nu, normalize=normalize,
                                         quantiles=quantiles)
            if lo is not None:
                ax.fill_between(nu, lo, hi, color="k", alpha=0.2)
        return ax

    def plot_results(self, axes=None, tau=None, ppd=20, show_ci=True, **kw):
        """Overview: impedance fit + residuals + DRT (reference
        drt1d.plot_results)."""
        from .. import plotting as plt_mod
        return plt_mod.plot_drt_result(self, axes=axes, tau=tau, ppd=ppd,
                                       show_ci=show_ci, **kw)

    def plot_kk_results(self, axes=None, **kw):
        from .. import plotting as plt_mod
        return plt_mod.plot_kk_results(self, axes=axes, **kw)

    def plot_pdrt(self, tau=None, ppd=20, ax=None, criterion="bic",
                  criterion_factor=1, **kw):
        """Probability-weighted discrete DRT (reference drt1d.plot_pdrt)."""
        import matplotlib.pyplot as plt
        if tau is None:
            tau = self.get_tau_eval(ppd)
        pdrt = self.predict_pdrt(tau, criterion=criterion,
                                 criterion_factor=criterion_factor)
        if ax is None:
            _, ax = plt.subplots(figsize=(4, 3))
        ax.plot(tau, pdrt, **kw)
        ax.set_xscale("log")
        ax.set_xlabel(r"$\tau$ (s)")
        ax.set_ylabel(r"$p_{\gamma}$")
        return ax

    def plot_norm_bayes_factors(self, candidate_type="discrete", criterion="bic",
                                ax=None, **kw):
        """Normalized Bayes factors of candidate models (reference
        drt1d.plot_norm_bayes_factors)."""
        import matplotlib.pyplot as plt
        factors = self.evaluate_norm_bayes_factors(
            candidate_type=candidate_type, criterion=criterion, **kw)
        df = self.get_candidate_df(candidate_type)
        num_peaks = df["num_peaks"].values if "num_peaks" in df.columns \
            else df["model_id"].values
        if ax is None:
            _, ax = plt.subplots(figsize=(4, 3))
        ax.scatter(num_peaks, factors)
        ax.set_yscale("log")
        ax.set_xlabel("Number of peaks")
        ax.set_ylabel("Normalized Bayes factor")
        return ax

    def plot_candidate_distribution(self, candidate_num_peaks, candidate_type,
                                    ax=None, **kw):
        """DRT of one stored candidate (reference
        drt1d.plot_candidate_distribution)."""
        info = self.get_candidate(candidate_num_peaks, candidate_type)
        if "x" in info:
            # Candidate x vectors are raw (scaled space, incl. special params)
            x_cand = self.extract_qphb_parameters(np.asarray(info["x"]))["x"]
            return self.plot_distribution(ax=ax, x=x_cand, show_ci=False, **kw)
        # Discrete candidates store a DiscreteElementModel
        import matplotlib.pyplot as plt
        if ax is None:
            _, ax = plt.subplots(figsize=(4, 3))
        tau = kw.pop("tau", self.get_tau_eval(kw.pop("ppd", 20)))
        gamma = np.asarray(info["model"].predict_drt(tau))
        ax.plot(tau, gamma, **kw)
        ax.set_xscale("log")
        ax.set_xlabel(r"$\tau$ (s)")
        ax.set_ylabel(r"$\gamma$ ($\Omega$)")
        return ax

    plot_candidate_drt = plot_candidate_distribution

    def plot_peak_distributions(self, tau=None, ppd=10, ax=None, x_peaks=None,
                                **peak_kw):
        """Individual peak distributions (reference
        drt1d.plot_peak_distributions)."""
        import matplotlib.pyplot as plt
        from .. import plotting as plt_mod
        if tau is None:
            tau = self.get_tau_eval(ppd)
        dists = self.estimate_peak_distributions(tau=tau, **peak_kw) \
            if x_peaks is None \
            else np.stack([self.predict_distribution(tau, x=xp) for xp in x_peaks])
        if ax is None:
            _, ax = plt.subplots(figsize=(4, 3))
        total = self.predict_distribution(tau)
        prefix = plt_mod.get_scale_prefix(total)
        scale = plt_mod._scale_factor(prefix)
        ax.plot(tau, total / scale, c="k", label="total")
        for i, d in enumerate(dists):
            ax.plot(tau, d / scale, ls="--", label=f"peak {i}")
        ax.set_xscale("log")
        ax.set_xlabel(r"$\tau$ (s)")
        ax.set_ylabel(rf"$\gamma$ ({prefix}$\Omega$)")
        ax.legend()
        return ax

    # ------------------------------------------------------------------
    # Goodness of fit (reference drt1d.py:4433-4546)
    # ------------------------------------------------------------------
    def evaluate_rss(self, weights=None):
        if weights is None:
            weights = self.qphb_params["weights"]
        rm, rv = self.qphb_params["rm"], self.qphb_params["rv"]
        x = self._raw_x()
        return float(qphb_mod.evaluate_rss(jnp.asarray(x), jnp.asarray(rm), jnp.asarray(rv),
                                           jnp.asarray(weights)))

    def evaluate_llh(self, weights=None, x=None, marginalize_weights=True, alpha_0=2,
                     beta_0=1):
        if weights is None:
            weights = self.qphb_params["weights"]
        rm, rv = self.qphb_params["rm"], self.qphb_params["rv"]
        x = self._raw_x() if x is None else np.asarray(x)
        return float(qphb_mod.evaluate_llh(jnp.asarray(x), jnp.asarray(rm), jnp.asarray(rv),
                                           jnp.asarray(weights),
                                           marginalize_weights=marginalize_weights,
                                           alpha_0=alpha_0, beta_0=beta_0))

    def evaluate_bic(self, **llh_kw):
        from ..utils.stats import bic
        llh = self.evaluate_llh(**llh_kw)
        num_params = len(self._raw_x())
        return bic(llh, num_params, self.num_data)

    def evaluate_lml(self, **kw):
        qp = self.qphb_params
        hyp = _hypers_to_pytree(qp["hypers"])
        m_stack = jnp.stack([jnp.asarray(qp["penalty_matrices"][f"m{k}"]) for k in range(3)])
        return float(qphb_mod.evaluate_lml(
            jnp.asarray(self._raw_x()), jnp.asarray(qp["rm"]), jnp.asarray(qp["rv"]),
            m_stack, hyp, jnp.asarray(qp["l1_lambda_vector"]), jnp.asarray(qp["rho_vector"]),
            jnp.asarray(qp["dop_rho_vector"]) if qp["dop_rho_vector"] is not None
            else jnp.ones(3), jnp.stack([jnp.asarray(s) for s in qp["s_vectors"]]),
            jnp.asarray(qp["weights"]), qp["cfg"], **kw))

    def _raw_x(self):
        """Reconstruct the scaled (raw) parameter vector from fit_parameters."""
        fp = self.fit_parameters
        n = self.qphb_params["rm"].shape[1]
        x = np.zeros(n)
        x[self.get_qp_mat_offset():] = fp["x"] / self.coefficient_scale
        for name in self.special_qp_params:
            start, end = self.get_special_indices(name)
            if name == "R_inf":
                x[start] = fp["R_inf"] / self.coefficient_scale
            elif name == "inductance":
                x[start] = fp["inductance"] / (self.coefficient_scale * self.inductance_scale)
            elif name == "C_inv":
                x[start] = fp["C_inv"] / (self.coefficient_scale * self.capacitance_scale)
            elif name == "vz_offset":
                x[start] = fp["vz_offset"]
            elif name == "v_baseline":
                vb = np.atleast_1d(fp["v_baseline"]) / self.response_signal_scale
                vb = vb * self.v_baseline_scale
                vb[0] += self.scaled_response_offset * self.v_baseline_scale[0] \
                    if np.ndim(self.v_baseline_scale) else self.scaled_response_offset
                x[start:end] = vb
            elif name == "x_dop":
                x[start:end] = fp["x_dop"] / (self.dop_scale_vector * self.coefficient_scale)
            elif name == "background_scale":
                x[start] = fp["background_scale"]
        return x

    # ------------------------------------------------------------------
    # Chrono background estimation (reference drt1d.py:6291, background.py:101)
    # ------------------------------------------------------------------
    def estimate_chrono_background(self, times, i_signal, v_signal, bkg_iter=1,
                                   kernel_type="gaussian", copy_self=False,
                                   gp_kw=None, **fit_kw):
        """Iteratively fit the DRT and a GP to the residual drift; returns
        (drt_bkg if copy_self, [gp], y_bkg)."""
        from .background import GPBackground
        drt_bkg = deepcopy(self) if copy_self else self
        drt_bkg.warn = False
        times = np.asarray(times)
        y_bkg = np.zeros(len(times))
        gp = None
        resp = np.asarray(v_signal if self.chrono_mode == "galv" else i_signal,
                          dtype=float)
        other = np.asarray(i_signal if self.chrono_mode == "galv" else v_signal)
        for _ in range(max(bkg_iter, 1)):
            resp_corr = resp - y_bkg
            if self.chrono_mode == "galv":
                drt_bkg.fit_chrono(times, other, resp_corr, **fit_kw)
            else:
                drt_bkg.fit_chrono(times, resp_corr, other, **fit_kw)
            y_pred = drt_bkg.predict_response(times)
            resid = resp - y_bkg - y_pred
            gp = GPBackground(kernel_type=kernel_type, **(gp_kw or {}))
            gp.fit(times, resid)
            y_bkg = y_bkg + gp.predict(times)
        if copy_self:
            return drt_bkg, [gp], y_bkg
        return [gp], y_bkg

    def predict_chrono_background(self, times):
        if self.background_gp is None:
            return np.zeros(len(np.atleast_1d(times)))
        return self.background_gp.predict(times)

    # ------------------------------------------------------------------
    # Kramers-Kronig test (reference drt1d.py:1370-1496, models/kk.py)
    # ------------------------------------------------------------------
    def kk_fit(self, frequencies, z, nonneg=False, l2_lambda_0=1e-2,
               extend_basis_decades=2, outlier_index=None, **kw):
        """Overfitted DRT used as a KK-consistency representation."""
        extend_orig = self.extend_basis_decades
        self.extend_basis_decades = extend_basis_decades
        try:
            if outlier_index is not None:
                weight_factor = np.ones(len(frequencies) * 2)
                weight_factor[np.asarray(outlier_index)] = 1e-10
                weight_factor[np.asarray(outlier_index) + len(frequencies)] = 1e-10
            else:
                weight_factor = 1
            self.fit_eis(frequencies, z, nonneg=nonneg, l2_lambda_0=l2_lambda_0,
                         weight_factor=weight_factor, **kw)
        finally:
            self.extend_basis_decades = extend_orig
        return self

    def eval_kk_residuals(self, norm="modulus"):
        f_fit = self.get_fit_frequencies()
        y_hat = self.predict_z(f_fit)
        return kk_mod.normalize_residuals(self.z_fit, y_hat, norm=norm)

    def get_kk_outliers(self, norm="modulus", n_iter=2, p_thresh=1e-4, n_sigma=None,
                        std_sample_fraction=0.6):
        y_err = self.eval_kk_residuals(norm=norm)
        return kk_mod.get_outliers(y_err, n_iter, p_thresh, n_sigma=n_sigma,
                                   std_sample_fraction=std_sample_fraction)

    def get_kk_limits(self, outlier_index, max_num_outliers=2):
        return kk_mod.get_limits(self.get_fit_frequencies(), outlier_index,
                                 max_num_outliers=max_num_outliers)

    def kk_test(self, frequencies, z, nonneg=False, l2_lambda_0=1e-2,
                extend_basis_decades=2, norm="modulus", max_num_outliers=2,
                p_thresh=1e-4, n_sigma=None, std_sample_fraction=0.6, n_iter=2,
                n_outlier_iter=2, show_plot=False):
        """Iterative KK test: overfit -> flag outliers -> refit with outliers
        downweighted -> valid frequency window (reference drt1d.py:1370)."""
        frequencies = np.asarray(frequencies)
        z = np.asarray(z)
        outlier_index = None
        for _ in range(n_iter):
            self.kk_fit(frequencies, z, nonneg=nonneg, l2_lambda_0=l2_lambda_0,
                        extend_basis_decades=extend_basis_decades,
                        outlier_index=outlier_index)
            outlier_index = self.get_kk_outliers(
                norm=norm, p_thresh=p_thresh, n_iter=n_outlier_iter, n_sigma=n_sigma,
                std_sample_fraction=std_sample_fraction)
            f_min, f_max = self.get_kk_limits(outlier_index,
                                              max_num_outliers=max_num_outliers)
            fz_clean = kk_mod.trim_data(frequencies, z, f_min, f_max)
        if show_plot:
            from ..plotting import plot_kk_results
            plot_kk_results(self, outlier_index=outlier_index, f_lim=(f_min, f_max))
        return outlier_index, (f_min, f_max), fz_clean

    # ------------------------------------------------------------------
    # Warm continuation (reference drt1d.py:1270)
    # ------------------------------------------------------------------
    def _continue_from_init(self, x_init, rho_vector, dop_rho_vector, s_vectors,
                            weights, outlier_t, max_iter=10, min_iter=2, xtol=1e-2,
                            weight_factor=1.0, eis_weight_factor=None,
                            chrono_weight_factor=None, **hyper_updates):
        """Continue the QPHB loop from a given state with updated hypers.

        Returns the final QPHBState. Uses stored fit matrices (qphb_params)."""
        qp = self.qphb_params
        hypers = dict(qp["hypers"])
        hypers.update(hyper_updates)
        hyp = _hypers_to_pytree(hypers)
        cfg = qp["cfg"]
        k_range = cfg.k_range
        m_stack = np.stack([qp["penalty_matrices"][f"m{k}"] for k in range(k_range)])

        data_type = self.fit_type.split("_")[-1] if self.fit_type else "eis"
        if eis_weight_factor is None:
            eis_weight_factor = qp.get("eis_weight_factor", 1.0)
        if chrono_weight_factor is None:
            chrono_weight_factor = qp.get("chrono_weight_factor", 1.0)

        if "vz_offset" in self.special_qp_params:
            rzm_vz = np.array(qp["rm"], copy=True)
            vb_start, vb_end = self.get_special_indices("v_baseline")
            rzm_vz[:, vb_start:vb_end] = 0
            vz_strength_vec = qp["vz_strength_vec"]
            vz_index = self.special_qp_params["vz_offset"]["index"]
            use_vz = True
        else:
            rzm_vz = np.zeros_like(qp["rm"])
            vz_strength_vec = np.ones(qp["rm"].shape[0])
            vz_index = -1
            use_vz = False

        fcfg = fitcore.FitConfig(
            cfg=cfg, data_type=data_type, num_chrono=qp["num_chrono"],
            vz_offset=use_vz and data_type == "hybrid", vz_index=vz_index,
            max_iter=max_iter, x_rtol=xtol, max_hp_iter=1,
            continue_mode=True, min_iter=min_iter)

        dop_gmat_arg = None
        state0 = fitcore.QPHBState(
            x=jnp.asarray(x_init), s_vectors=jnp.asarray(np.asarray(s_vectors)),
            rho_vector=jnp.asarray(rho_vector),
            dop_rho_vector=jnp.asarray(dop_rho_vector if dop_rho_vector is not None
                                       else np.ones(k_range)),
            weights=jnp.asarray(weights), outlier_t=jnp.asarray(outlier_t),
            xmx_norms=jnp.asarray(qp["xmx_norms"]),
            dop_xmx_norms=jnp.asarray(qp["dop_xmx_norms"]),
            it=jnp.array(0, dtype=jnp.int32), converged=jnp.array(False))

        carry = fitcore.FitCarry(state=state0, rzm=jnp.asarray(qp["rm"]))
        args = (jnp.asarray(qp["rv"]), jnp.asarray(qp["vmm"]), jnp.asarray(m_stack),
                dop_gmat_arg, jnp.asarray(qp["l1_lambda_vector"]), jnp.asarray(qp["lb"]),
                jnp.asarray(qp["est_weights"]), jnp.asarray(rzm_vz),
                jnp.asarray(vz_strength_vec), jnp.asarray(float(chrono_weight_factor)),
                jnp.asarray(float(eis_weight_factor)), jnp.asarray(float(weight_factor)),
                hyp, fcfg)
        while int(carry.state.it) < max_iter and not bool(carry.state.converged):
            carry = fitcore._loop_body(carry, *args)
        return carry.state

    # ------------------------------------------------------------------
    # PFRT: probability function of relaxation times (reference drt1d.py:2558)
    # ------------------------------------------------------------------
    def _pfrt_fit_core(self, times, i_signal, v_signal, frequencies, z, factors=None,
                       max_iter_per_step=10, max_init_iter=20, xtol=1e-2, nonneg=True,
                       series_neg=False, **kw):
        hypers_default = hyp_mod.get_default_hypers(True, self.fit_dop, self.nu_basis_type)
        if factors is None:
            factors = np.logspace(-1, 1, 11)
        factors = np.asarray(factors)

        def prep_step_hypers(step_factor):
            return {"s_0": hypers_default["s_0"] * step_factor,
                    "l2_lambda_0": hypers_default["l2_lambda_0"] / step_factor}

        init_kw = dict(kw)
        init_kw.update(prep_step_hypers(factors[0]))

        if times is None:
            self.fit_eis(frequencies, z, nonneg=nonneg, series_neg=series_neg,
                         max_iter=max_init_iter, xtol=xtol, **init_kw)
        elif frequencies is None:
            self.fit_chrono(times, i_signal, v_signal, nonneg=nonneg,
                            series_neg=series_neg, max_iter=max_init_iter, xtol=xtol,
                            **init_kw)
        else:
            self.fit_hybrid(times, i_signal, v_signal, frequencies, z, nonneg=nonneg,
                            series_neg=series_neg, max_iter=max_init_iter,
                            xtol=xtol, **init_kw)

        qp = self.qphb_params
        cfg = qp["cfg"]
        k_range = cfg.k_range
        m_stack = np.stack([qp["penalty_matrices"][f"m{k}"] for k in range(k_range)])

        step_x, step_llh, step_p_mat, step_hypers = [], [], [], []

        def record_step(x, rho, dop_rho, s_vectors, hypers_used):
            x = np.asarray(x)
            weights, _, _ = qphb_mod.estimate_weights(
                jnp.asarray(x), jnp.asarray(qp["rv"]), jnp.asarray(qp["vmm"]),
                jnp.asarray(qp["rm"]))
            weights = np.asarray(weights)
            step_x.append(x)
            step_llh.append(self.evaluate_llh(weights=weights, x=x,
                                              marginalize_weights=True))
            hyp_eval = _hypers_to_pytree(dict(qp["hypers"], **hypers_used))
            p_matrix, _ = qphb_mod.calculate_pq(
                jnp.asarray(qp["rm"]), jnp.asarray(qp["rv"]), jnp.asarray(m_stack),
                hyp_eval, jnp.asarray(qp["l1_lambda_vector"]), jnp.asarray(rho),
                jnp.asarray(dop_rho if dop_rho is not None else np.ones(k_range)),
                jnp.asarray(np.asarray(s_vectors)), jnp.asarray(weights), cfg)
            step_p_mat.append(np.asarray(p_matrix))
            step_hypers.append(hypers_used)

        # Initial fit result
        x_cur = self._raw_x()
        rho_cur = qp["rho_vector"]
        dop_rho_cur = qp["dop_rho_vector"]
        s_cur = np.stack(qp["s_vectors"])
        weights_cur = qp["true_weights"]
        outlier_t_cur = qp["outlier_t"]
        record_step(x_cur, rho_cur, dop_rho_cur, s_cur, prep_step_hypers(factors[0]))

        for factor in factors[1:]:
            upd = prep_step_hypers(factor)
            state = self._continue_from_init(
                x_cur, rho_cur, dop_rho_cur if dop_rho_cur is not None else None,
                s_cur, weights_cur, outlier_t_cur, max_iter=max_iter_per_step,
                xtol=xtol, **upd)
            x_cur = np.asarray(state.x)
            rho_cur = np.asarray(state.rho_vector)
            dop_rho_cur = np.asarray(state.dop_rho_vector)
            s_cur = np.asarray(state.s_vectors)
            weights_cur = np.asarray(state.weights)
            outlier_t_cur = np.asarray(state.outlier_t)
            record_step(x_cur, rho_cur, dop_rho_cur, s_cur, upd)

        self.pfrt_result = {
            "factors": factors,
            "step_x": step_x,
            "step_llh": step_llh,
            "step_p_mat": step_p_mat,
            "step_hypers": step_hypers,
        }
        return self

    def pfrt_fit_eis(self, frequencies, z, factors=None, max_iter_per_step=10,
                     max_init_iter=20, xtol=1e-2, nonneg=True, **kw):
        return self._pfrt_fit_core(None, None, None, frequencies, z, factors=factors,
                                   max_iter_per_step=max_iter_per_step,
                                   max_init_iter=max_init_iter, xtol=xtol,
                                   nonneg=nonneg, **kw)

    def pfrt_fit_chrono(self, times, i_signal, v_signal, factors=None,
                        max_iter_per_step=10, max_init_iter=20, xtol=1e-2, nonneg=True,
                        **kw):
        return self._pfrt_fit_core(times, i_signal, v_signal, None, None,
                                   factors=factors, max_iter_per_step=max_iter_per_step,
                                   max_init_iter=max_init_iter, xtol=xtol,
                                   nonneg=nonneg, **kw)

    def pfrt_fit_hybrid(self, times, i_signal, v_signal, frequencies, z, factors=None,
                        max_iter_per_step=10, max_init_iter=20, xtol=1e-2, nonneg=True,
                        **kw):
        return self._pfrt_fit_core(times, i_signal, v_signal, frequencies, z,
                                   factors=factors, max_iter_per_step=max_iter_per_step,
                                   max_init_iter=max_init_iter, xtol=xtol,
                                   nonneg=nonneg, **kw)

    def predict_pfrt(self, tau=None, tau_pfrt=None, sign=1, prior_mu=-4, prior_sigma=0.5,
                     find_peaks_kw=None, n_eff_factor=0.5, fxx_var_floor=1e-5,
                     extend_var=True, smooth=True, smooth_kw=None, integrate=False,
                     integrate_threshold=1e-6, normalize=True):
        """Aggregate per-factor peak probabilities into the total PFRT
        (reference drt1d.py:2716-2860)."""
        from scipy import signal as sp_signal
        from scipy.special import ndtr
        from ..utils import stats as stats_mod

        factors = self.pfrt_result["factors"]
        step_llh = np.asarray(self.pfrt_result["step_llh"])
        step_x = self.pfrt_result["step_x"]
        step_p_mat = self.pfrt_result["step_p_mat"]

        log_prior = np.asarray(stats_mod.log_pdf_normal(
            jnp.asarray(np.log(factors)), prior_mu, prior_sigma))
        log_post = log_prior + step_llh
        log_post_eff = (log_post - np.max(log_post)) * n_eff_factor
        if len(factors) > 1:
            post_area = np.trapezoid(np.exp(log_post_eff), x=np.log(factors))
        else:
            post_area = np.exp(log_post_eff[0])
        post_prob_eff = np.exp(log_post_eff) / post_area

        if find_peaks_kw is None:
            find_peaks_kw = {"height": 1e-3, "prominence": 5e-3}
        for k in ("height", "prominence"):
            find_peaks_kw.setdefault(k, 0)

        if tau_pfrt is None:
            tau_pfrt = self.get_tau_eval(10)
        if tau is None:
            tau = tau_pfrt

        tot_pfrt = np.zeros(len(tau_pfrt))
        step_pfrt = np.zeros((len(factors), len(tau_pfrt)))
        for i, x_raw in enumerate(step_x):
            x_drt = self.extract_qphb_parameters(x_raw)["x"]
            fxx = self.predict_distribution(tau_pfrt, x=x_drt, sign=sign, order=2,
                                            normalize=True)
            fxx_cov = self.estimate_distribution_cov(
                tau_pfrt, p_matrix=step_p_mat[i], order=2, sign=sign, normalize=True,
                var_floor=fxx_var_floor, extend_var=extend_var)
            fxx_sigma = np.sqrt(np.maximum(np.diag(fxx_cov), 0))
            f = self.predict_distribution(tau_pfrt, x=x_drt, sign=sign, order=0,
                                          normalize=True)
            f_cov = self.estimate_distribution_cov(
                tau_pfrt, p_matrix=step_p_mat[i], order=0, sign=sign, normalize=True,
                var_floor=fxx_var_floor, extend_var=extend_var)
            f_sigma = np.sqrt(np.maximum(np.diag(f_cov), 0))

            peak_index, peak_info = sp_signal.find_peaks(-sign * fxx, **find_peaks_kw)
            if len(peak_index) == 0:
                continue
            min_prom = np.minimum(peak_info["prominences"], peak_info["peak_heights"])
            # P(curvature peak is real) and P(function height > 0)
            fxx_prob = 2 * ndtr(min_prom / fxx_sigma[peak_index]) - 1
            heights = f[peak_index]
            f_prob = 2 * ndtr(np.abs(heights) / f_sigma[peak_index]) - 1
            peak_prob = np.minimum(f_prob, fxx_prob)
            step_pfrt[i, peak_index] = peak_prob
            tot_pfrt[peak_index] += post_prob_eff[i] * peak_prob

        tot_pfrt /= np.sum(post_prob_eff)
        self.pfrt_result["tau_pfrt"] = np.asarray(tau_pfrt)
        self.pfrt_result["raw_pfrt"] = tot_pfrt.copy()
        self.pfrt_result["step_pfrt"] = step_pfrt

        if smooth:
            # Aggregate neighboring peak probabilities that shift slightly
            # with the hyperparameter factor
            if smooth_kw is None:
                smooth_kw = {"epsilon": 5}
            ln_b = np.log(np.asarray(tau_pfrt))
            ln_e = np.log(np.asarray(tau))
            d = ln_e[:, None] - ln_b[None, :]
            basis_matrix = np.exp(-(smooth_kw["epsilon"] * d) ** 2)
            tot_pfrt = basis_matrix @ tot_pfrt

        if integrate:
            from . import pfrt as pfrt_mod
            peak_index, peak_prob = pfrt_mod.integrate_peaks(tot_pfrt, integrate_threshold)
            out = np.zeros_like(tot_pfrt)
            out[peak_index] = peak_prob
            tot_pfrt = out

        if normalize and np.max(tot_pfrt) > 0:
            tot_pfrt = tot_pfrt / np.max(tot_pfrt)
        return tot_pfrt

    def select_pfrt_candidates(self, start_thresh=0.99, end_thresh=0.01,
                               peak_thresh=1e-6):
        from . import pfrt as pfrt_mod
        return pfrt_mod.select_candidates(
            self.pfrt_result["raw_pfrt"], self.pfrt_result["step_pfrt"],
            self.pfrt_result["step_llh"], start_thresh, end_thresh, peak_thresh)

    # ------------------------------------------------------------------
    # Dual inversion: candidate generation + discrete model selection
    # (reference drt1d.py:1497-2557)
    # ------------------------------------------------------------------
    def _candidate_state(self):
        qp = self.qphb_params
        return (self._raw_x(), qp["rho_vector"],
                qp["dop_rho_vector"], np.stack(qp["s_vectors"]),
                qp["true_weights"], qp["outlier_t"])

    def _generate_candidates_s0(self, multiplier, steps, xtol, max_iter, **kw):
        """Sweep the local regularization mode s_0 up (or down) from the
        baseline fit, warm-starting each step (reference drt1d.py:1497)."""
        x_in, rho_in, dop_rho_in, s_base, weights_in, out_t_in = self._candidate_state()
        s_in = s_base.copy()
        cands, hypers_list = [], []
        for i in range(1, steps + 1):
            s0_factor = multiplier ** i
            if multiplier > 1:
                s_in = s_base * s0_factor
            else:
                s_in = s_in * multiplier
            new_hypers = {"s_0": np.asarray(self.fit_kwargs["s_0"]) * s0_factor,
                          "l2_lambda_0": self.fit_kwargs["l2_lambda_0"] / s0_factor}
            state = self._continue_from_init(x_in, rho_in, dop_rho_in, s_in, weights_in,
                                             out_t_in, max_iter=max_iter, xtol=xtol,
                                             **new_hypers, **kw)
            x_in = np.asarray(state.x)
            rho_in = np.asarray(state.rho_vector)
            dop_rho_in = np.asarray(state.dop_rho_vector)
            s_in = np.asarray(state.s_vectors)
            weights_in = np.asarray(state.weights)
            out_t_in = np.asarray(state.outlier_t)
            cands.append(x_in.copy())
            hypers_list.append(new_hypers)
        return cands, hypers_list

    def _generate_candidates_weights(self, multiplier, steps, xtol, max_iter, **kw):
        """Sweep a global data-weight factor to suppress peaks
        (reference drt1d.py:1567)."""
        x_in, rho_in, dop_rho_in, s_base, weights_in, out_t_in = self._candidate_state()
        cands, hypers_list = [], []
        for i in range(1, steps + 1):
            weight_factor = multiplier ** i
            state = self._continue_from_init(x_in, rho_in, dop_rho_in, s_base.copy(),
                                             weights_in, out_t_in, max_iter=max_iter,
                                             xtol=xtol, weight_factor=weight_factor, **kw)
            x_in = np.asarray(state.x)
            rho_in = np.asarray(state.rho_vector)
            dop_rho_in = np.asarray(state.dop_rho_vector)
            weights_in = np.asarray(state.weights)
            out_t_in = np.asarray(state.outlier_t)
            cands.append(x_in.copy())
            hypers_list.append({"weight_factor": weight_factor})
        return cands, hypers_list

    def generate_candidates(self, s0_multiplier=4, s0_steps=2, weight_multiplier=0.5,
                            weight_steps=3, include_qphb_history=True, fill=True,
                            min_fill_num=None, xtol=1e-2, max_iter=10, llh_kw=None,
                            find_peaks_kw=None, **kw):
        """Generate candidate DRT solutions by sweeping regularization up/down
        around the baseline fit (reference drt1d.py:1632)."""
        import pandas as pd
        from ..utils.stats import bic as bic_fn

        if include_qphb_history and self.qphb_history is not None:
            qphb_x = [np.asarray(h["x"]) for h in self.qphb_history]
        else:
            qphb_x = [self._raw_x()]

        down_x, down_hypers = self._generate_candidates_weights(
            weight_multiplier, weight_steps, xtol, max_iter, **kw)
        up_x, up_hypers = self._generate_candidates_s0(
            s0_multiplier, s0_steps, xtol, max_iter, **kw)

        hypers_keys = set()
        for h in down_hypers + up_hypers:
            hypers_keys |= set(h.keys())
        default_hypers = [{k: self.fit_kwargs.get(k) for k in hypers_keys}] * len(qphb_x)

        candidate_x = np.array(qphb_x + up_x + down_x)
        candidate_hypers = default_hypers + up_hypers + down_hypers

        if llh_kw is None:
            llh_kw = {}
        qp = self.qphb_params
        cand_weights = [np.asarray(qphb_mod.estimate_weights(
            jnp.asarray(x), jnp.asarray(qp["rv"]), jnp.asarray(qp["vmm"]),
            jnp.asarray(qp["rm"]))[0]) for x in candidate_x]
        candidate_llh = np.array([self.evaluate_llh(weights=w, x=x, **llh_kw)
                                  for x, w in zip(candidate_x, cand_weights)])

        if find_peaks_kw is None:
            find_peaks_kw = {}
        peak_results = [self.find_peaks(x=self.extract_qphb_parameters(x)["x"],
                                        return_info=True, **find_peaks_kw)
                        for x in candidate_x]
        candidate_peak_tau = [pr[0] for pr in peak_results]
        candidate_peak_info = [pr[3] for pr in peak_results]
        candidate_num_peaks = np.array([len(pt) for pt in candidate_peak_tau])

        num_special = self.get_qp_mat_offset()
        candidate_bic = np.array([
            bic_fn(llh, num_special + int(npk) * 4, self.num_independent_data)
            for npk, llh in zip(candidate_num_peaks, candidate_llh)])

        # Drop candidates whose likelihood evaluation failed (non-finite llh
        # — e.g. an f32 candidate fit that diverged on TPU) instead of
        # poisoning the max/argmax ranking below with NaNs
        finite = np.isfinite(candidate_llh)
        if not finite.all():
            if finite.sum() == 0:
                raise RuntimeError(
                    "all candidate likelihoods are non-finite; the candidate "
                    "fits diverged (if running in float32, refit in float64)")
            warnings.warn(f"dropping {int((~finite).sum())} candidate(s) "
                          "with non-finite likelihood")
            candidate_x = candidate_x[finite]
            candidate_hypers = [h for h, f in zip(candidate_hypers, finite) if f]
            candidate_llh = candidate_llh[finite]
            candidate_bic = candidate_bic[finite]
            candidate_peak_tau = [p for p, f in
                                  zip(candidate_peak_tau, finite) if f]
            candidate_peak_info = [p for p, f in
                                   zip(candidate_peak_info, finite) if f]
            candidate_num_peaks = candidate_num_peaks[finite]

        self.candidate_dict = {
            "x": candidate_x, "peak_tau": candidate_peak_tau,
            "peak_info": candidate_peak_info, "num_peaks": candidate_num_peaks,
            "llh": candidate_llh, "bic": candidate_bic, "hypers": candidate_hypers,
        }
        best_llh = np.max(candidate_llh)
        best_bic = np.min(candidate_bic)
        self.candidate_df = pd.DataFrame({
            "num_peaks": candidate_num_peaks, "llh": candidate_llh,
            "bic": candidate_bic, "rel_llh": candidate_llh - best_llh,
            "rel_bic": candidate_bic - best_bic})

        # Best candidate per peak count
        self.best_candidate_dict = {}
        best_rows = []
        for npk in np.unique(candidate_num_peaks):
            mask = candidate_num_peaks == npk
            best = np.where(mask & (candidate_llh == np.max(candidate_llh[mask])))[0][0]
            self.best_candidate_dict[int(npk)] = {
                "x": candidate_x[best], "llh": candidate_llh[best],
                "bic": candidate_bic[best], "peak_tau": candidate_peak_tau[best],
                "peak_info": candidate_peak_info[best], "hypers": candidate_hypers[best]}
            best_rows.append((int(npk), int(npk), candidate_llh[best], candidate_bic[best],
                              candidate_llh[best] - best_llh, candidate_bic[best] - best_bic))

        if fill:
            # Fill missing peak counts by subsetting the most prominent peaks
            # of the next-larger candidate (reference drt1d.py:1756-1808)
            nums = sorted(self.best_candidate_dict.keys())
            if min_fill_num is not None:
                target_min = max(1, nums[0] + min_fill_num) if min_fill_num < 0 \
                    else min_fill_num
                if target_min < nums[0]:
                    nums = [target_min - 1] + nums
            new_cands = {}
            for lo_num, hi_num in zip(nums[:-1], nums[1:]):
                if hi_num - lo_num <= 1:
                    continue
                hi = self.best_candidate_dict[hi_num]
                info = hi["peak_info"]
                min_prom = np.minimum(info["prominences"], info["peak_heights"])
                order = np.argsort(min_prom)[::-1]
                for j in range(lo_num + 1, hi_num):
                    new_cands[j] = dict(hi, peak_tau=hi["peak_tau"][order[:j]],
                                        peak_info={k: v[order[:j]] for k, v in info.items()})
            self.best_candidate_dict.update(new_cands)
            self.best_candidate_dict = dict(sorted(self.best_candidate_dict.items()))

        self.best_candidate_df = pd.DataFrame(
            best_rows, columns=["model_id", "num_peaks", "llh", "bic", "rel_llh", "rel_bic"])
        return dict(self.candidate_dict)

    def convert_candidate_to_discrete(self, candidate_num_peaks, model_init_kw=None,
                                      **fit_kw):
        """Candidate DRT -> initialized + refined discrete element model
        (reference drt1d.py:1823)."""
        from .elements import DiscreteElementModel
        info = self.get_candidate(candidate_num_peaks, "continuous")
        if model_init_kw is None:
            model_init_kw = {}
        dem = DiscreteElementModel.from_drt(self, x=info["x"], peak_tau=info["peak_tau"],
                                            **model_init_kw)
        dem.fit_eis(self.get_fit_frequencies(), self.z_fit, **fit_kw)
        return dem

    def create_discrete_models(self, candidates=None, max_num_peaks=10,
                               model_init_kw=None, llh_kw=None, lml_kw=None, **fit_kw):
        """Fit discrete models for each candidate peak count and rank by
        LLH/BIC/LML (reference drt1d.py:1853)."""
        import pandas as pd
        if max_num_peaks is None:
            max_num_peaks = np.inf
        if candidates is None:
            candidates = [k for k in self.best_candidate_dict if 0 < k <= max_num_peaks]
        llh_kw = llh_kw or {}
        lml_kw = lml_kw or {}

        self.discrete_candidate_dict = {}
        rows = []
        for cand in candidates:
            try:
                dem = self.convert_candidate_to_discrete(cand, model_init_kw, **fit_kw)
            except Exception as err:
                if self.warn:
                    warnings.warn(f"Discrete model for {cand} peaks failed: {err}")
                continue
            llh = dem.evaluate_llh(**llh_kw)
            lml = dem.evaluate_lml(**lml_kw)
            bic = dem.evaluate_bic()
            self.discrete_candidate_dict[cand] = {
                "model": dem, "llh": llh, "bic": bic, "lml": lml,
                "lml-bic": 0.5 * (lml - 0.5 * bic),
                "peak_tau": dem.get_peak_tau(),
                "time_constants": dem.get_time_constants()}
            rows.append((cand, cand, llh, bic, lml, 0.5 * (lml - 0.5 * bic)))

        if not rows:
            raise RuntimeError("No discrete candidates could be fitted")
        arr = np.array([r[2:] for r in rows])
        best = {"llh": arr[:, 0].max(), "bic": arr[:, 1].min(), "lml": arr[:, 2].max(),
                "lml-bic": arr[:, 3].max()}
        for i, cand in enumerate([r[0] for r in rows]):
            d = self.discrete_candidate_dict[cand]
            d["rel_llh"] = d["llh"] - best["llh"]
            d["rel_bic"] = d["bic"] - best["bic"]
            d["rel_lml"] = d["lml"] - best["lml"]
            d["rel_lml-bic"] = d["lml-bic"] - best["lml-bic"]
        self.discrete_candidate_df = pd.DataFrame(
            [(r[0], r[1], r[2], r[3], r[4], r[5], r[2] - best["llh"], r[3] - best["bic"],
              r[4] - best["lml"], r[5] - best["lml-bic"]) for r in rows],
            columns=["model_id", "num_peaks", "llh", "bic", "lml", "lml-bic",
                     "rel_llh", "rel_bic", "rel_lml", "rel_lml-bic"])
        return dict(self.discrete_candidate_dict)

    def _dual_fit_core(self, times, i_signal, v_signal, frequencies, z, generate_kw=None,
                       discrete_kw=None, **qphb_kw):
        qphb_kw.setdefault("store_history", True)
        if times is None:
            self.fit_eis(frequencies, z, **qphb_kw)
        elif frequencies is None:
            self.fit_chrono(times, i_signal, v_signal, **qphb_kw)
        else:
            self.fit_hybrid(times, i_signal, v_signal, frequencies, z, **qphb_kw)
        self.generate_candidates(**(generate_kw or {}))
        self.create_discrete_models(**(discrete_kw or {}))
        return self

    def dual_fit_eis(self, frequencies, z, generate_kw=None, discrete_kw=None, **qphb_kw):
        return self._dual_fit_core(None, None, None, frequencies, z,
                                   generate_kw=generate_kw, discrete_kw=discrete_kw,
                                   **qphb_kw)

    def dual_fit_chrono(self, times, i_signal, v_signal, generate_kw=None,
                        discrete_kw=None, **qphb_kw):
        return self._dual_fit_core(times, i_signal, v_signal, None, None,
                                   generate_kw=generate_kw, discrete_kw=discrete_kw,
                                   **qphb_kw)

    def dual_fit_hybrid(self, times, i_signal, v_signal, frequencies, z, generate_kw=None,
                        discrete_kw=None, **qphb_kw):
        return self._dual_fit_core(times, i_signal, v_signal, frequencies, z,
                                   generate_kw=generate_kw, discrete_kw=discrete_kw,
                                   **qphb_kw)

    def continuous_to_discrete(self, x, tau_find_peaks=None, peak_indices=None,
                               model_init_kw=None, **fit_kw):
        """Convert a candidate DRT solution to a refined discrete model
        (reference drt1d.py:2863)."""
        from .elements import DiscreteElementModel
        if tau_find_peaks is None:
            tau_find_peaks = self.get_tau_eval(10)
        peak_tau = np.asarray(tau_find_peaks)[np.asarray(peak_indices, dtype=int)] \
            if peak_indices is not None else None
        dem = DiscreteElementModel.from_drt(self, x=x, peak_tau=peak_tau,
                                            **(model_init_kw or {}))
        dem.fit_eis(self.get_fit_frequencies(), self.z_fit, **fit_kw)
        return dem

    def create_discrete_from_pfrt(self, start_thresh=0.99, end_thresh=0.01,
                                  peak_thresh=1e-6, max_num_peaks=10,
                                  model_init_kw=None, llh_kw=None, lml_kw=None,
                                  **fit_kw):
        """Discrete models from PFRT candidate selection
        (reference drt1d.py:2889-2961)."""
        import pandas as pd
        target_peak_indices, step_indices = self.select_pfrt_candidates(
            start_thresh, end_thresh, peak_thresh)
        llh_kw = llh_kw or {}
        lml_kw = lml_kw or {}

        self.pfrt_candidate_dict = {}
        rows = []
        for targets, step_i in zip(target_peak_indices, step_indices):
            if len(targets) > max_num_peaks:
                continue
            cand_x = self.pfrt_result["step_x"][step_i]
            try:
                dem = self.continuous_to_discrete(
                    cand_x, self.pfrt_result["tau_pfrt"], targets, model_init_kw,
                    **fit_kw)
            except Exception as err:
                if self.warn:
                    warnings.warn(f"PFRT discrete model with {len(targets)} peaks "
                                  f"failed: {err}")
                continue
            llh = dem.evaluate_llh(**llh_kw)
            lml = dem.evaluate_lml(**lml_kw)
            bic = dem.evaluate_bic()
            n_pk = len(targets)
            self.pfrt_candidate_dict[n_pk] = {
                "model": dem, "llh": llh, "bic": bic, "lml": lml,
                "peak_tau": dem.get_peak_tau(),
                "time_constants": dem.get_time_constants()}
            rows.append((n_pk, n_pk, llh, bic, lml))
        if not rows:
            raise RuntimeError("No PFRT discrete candidates could be fitted")
        arr = np.array([r[2:] for r in rows])
        best_llh, best_bic, best_lml = arr[:, 0].max(), arr[:, 1].min(), arr[:, 2].max()
        for (n_pk, _, llh, bic, lml) in rows:
            d = self.pfrt_candidate_dict[n_pk]
            d["rel_llh"] = llh - best_llh
            d["rel_bic"] = bic - best_bic
            d["rel_lml"] = lml - best_lml
        self.pfrt_candidate_df = pd.DataFrame(
            [(r[0], r[1], r[2], r[3], r[4], r[2] - best_llh, r[3] - best_bic,
              r[4] - best_lml) for r in rows],
            columns=["model_id", "num_peaks", "llh", "bic", "lml", "rel_llh",
                     "rel_bic", "rel_lml"])
        return dict(self.pfrt_candidate_dict)

    def sort_discrete_by_llh(self, start_from_model=None):
        """Rank discrete candidates by per-peak LLH improvement
        (reference drt1d.py:1970)."""
        df = self.discrete_candidate_df.sort_values("num_peaks").reset_index(drop=True)
        if start_from_model is not None:
            start_idx = int(df.index[df["model_id"] == start_from_model][0])
            df = df.loc[start_idx:].reset_index(drop=True)
        model_ids = df["model_id"].values
        llh = df["llh"].values
        num_peaks = df["num_peaks"].values
        if len(df) < 2:
            return num_peaks, [np.arange(int(num_peaks[0]))], \
                [self.discrete_candidate_dict[model_ids[0]]["time_constants"]], \
                np.array([np.inf])
        delta_llh = np.diff(llh) / np.diff(num_peaks)
        from .. import peaks as peaks_mod
        ln_taus = [np.log(self.discrete_candidate_dict[mid]["time_constants"])
                   for mid in model_ids]
        added_idx = [peaks_mod.find_new_peaks(ln_taus[i], ln_taus[i - 1])
                     for i in range(1, len(ln_taus))]
        added_tau = [np.exp(np.atleast_1d(ln_taus[i + 1][idx]).ravel())
                     for i, idx in enumerate(added_idx)]
        added_idx = [np.arange(int(num_peaks[0]), dtype=int)] + list(added_idx)
        added_tau = [np.exp(ln_taus[0])] + added_tau
        delta_llh = np.insert(delta_llh, 0, np.max(delta_llh) + 1)
        order = np.argsort(delta_llh)[::-1]
        return (num_peaks[order], [added_idx[i] for i in order],
                [added_tau[i] for i in order], delta_llh[order])

    def search_for_better_discrete(self, min_num_peaks=1, max_num_peaks=None,
                                   start_from_best=True, model_init_kw=None, **fit_kw):
        """Build recombined discrete models by adding peaks in order of their
        per-peak LLH value (reference drt1d.py:2006, simplified recombination:
        peaks are re-fit jointly from aggregated peak positions)."""
        if max_num_peaks is None:
            max_num_peaks = int(self.discrete_candidate_df["num_peaks"].max())
        _, added_idx, added_tau, _ = self.sort_discrete_by_llh(
            self.get_best_candidate_id("discrete") if start_from_best
            else None)
        # Aggregate peak taus in ranked order
        ranked_taus = []
        for taus in added_tau:
            for t in np.atleast_1d(taus):
                if not np.isfinite(t) or t <= 0:
                    continue
                if not any(abs(np.log(t) - np.log(rt)) < 0.3 for rt in ranked_taus):
                    ranked_taus.append(float(t))
        improved = {}
        for n_pk in range(max(min_num_peaks, 1), max_num_peaks + 1):
            if n_pk > len(ranked_taus):
                break
            peak_tau = np.sort(ranked_taus[:n_pk])
            try:
                from .elements import DiscreteElementModel
                dem = DiscreteElementModel.from_drt(self, peak_tau=peak_tau,
                                                    **(model_init_kw or {}))
                dem.fit_eis(self.get_fit_frequencies(), self.z_fit, **fit_kw)
            except Exception:
                continue
            llh = dem.evaluate_llh()
            existing = self.discrete_candidate_dict.get(n_pk)
            if existing is None or llh > existing["llh"]:
                improved[n_pk] = {"model": dem, "llh": llh,
                                  "bic": dem.evaluate_bic(),
                                  "lml": dem.evaluate_lml(),
                                  "peak_tau": dem.get_peak_tau(),
                                  "time_constants": dem.get_time_constants()}
        # Merge improvements and refresh relative metrics/df
        if improved:
            for k, v in improved.items():
                v["lml-bic"] = 0.5 * (v["lml"] - 0.5 * v["bic"])
                self.discrete_candidate_dict[k] = v
            self._refresh_discrete_df()
        return improved

    def _refresh_discrete_df(self):
        import pandas as pd
        rows = [(k, k, v["llh"], v["bic"], v["lml"],
                 v.get("lml-bic", 0.5 * (v["lml"] - 0.5 * v["bic"])))
                for k, v in sorted(self.discrete_candidate_dict.items())]
        arr = np.array([r[2:] for r in rows])
        best = {"llh": arr[:, 0].max(), "bic": arr[:, 1].min(), "lml": arr[:, 2].max(),
                "lml-bic": arr[:, 3].max()}
        for (k, *_vals) in rows:
            d = self.discrete_candidate_dict[k]
            d["rel_llh"] = d["llh"] - best["llh"]
            d["rel_bic"] = d["bic"] - best["bic"]
            d["rel_lml"] = d["lml"] - best["lml"]
            d["rel_lml-bic"] = d.get("lml-bic") - best["lml-bic"]
        self.discrete_candidate_df = pd.DataFrame(
            [(r[0], r[1], r[2], r[3], r[4], r[5], r[2] - best["llh"],
              r[3] - best["bic"], r[4] - best["lml"], r[5] - best["lml-bic"])
             for r in rows],
            columns=["model_id", "num_peaks", "llh", "bic", "lml", "lml-bic",
                     "rel_llh", "rel_bic", "rel_lml", "rel_lml-bic"])

    def get_candidate_df(self, candidate_type):
        if candidate_type == "continuous":
            return self.best_candidate_df
        if candidate_type == "discrete":
            return self.discrete_candidate_df
        if candidate_type == "pfrt":
            return self.pfrt_candidate_df
        raise ValueError(f"Invalid candidate_type {candidate_type}")

    def get_candidate(self, candidate_num_peaks, candidate_type):
        source = {"continuous": self.best_candidate_dict,
                  "discrete": self.discrete_candidate_dict,
                  "pfrt": getattr(self, "pfrt_candidate_dict", None)}.get(candidate_type)
        if source is None:
            raise ValueError(f"Invalid candidate_type {candidate_type}")
        if candidate_num_peaks not in source:
            raise ValueError(f"No candidate with {candidate_num_peaks} peaks exists")
        return source[candidate_num_peaks]

    def get_best_candidate_id(self, candidate_type, criterion=None):
        directions = {"bic": -1, "lml": 1, "lml-bic": 1}
        df = self.get_candidate_df(candidate_type)
        if criterion is None:
            criterion = "lml-bic" if candidate_type == "discrete" else "bic"
        vals = df[criterion].values * directions[criterion]
        return df.loc[df.index[np.argmax(vals)], "model_id"]

    def predict_candidate_drt(self, candidate_id, candidate_type, tau=None, **kw):
        """DRT of one stored candidate (reference drt1d.py:2359)."""
        info = self.get_candidate(candidate_id, candidate_type)
        if candidate_type == "continuous":
            x_cand = self.extract_qphb_parameters(np.asarray(info["x"]))["x"]
            return self.predict_distribution(tau=tau, x=x_cand, **kw)
        dem = info["model"]
        if tau is None:
            tau = self.get_tau_eval(20)
        return np.asarray(dem.predict_drt(np.asarray(tau), **kw))

    # Reference-compatible alias (reference drt1d.py:2355)
    predict_candidate_distribution = predict_candidate_drt

    def plot_candidate_eis_fit(self, candidate_id, candidate_type, ax=None, **kw):
        """Impedance fit of one stored candidate (reference drt1d.py:2374)."""
        from .. import plotting as plt_mod
        info = self.get_candidate(candidate_id, candidate_type)
        freq = self.get_fit_frequencies()
        if candidate_type == "continuous":
            x_raw = np.asarray(info["x"])
            fp = self.extract_qphb_parameters(x_raw)
            z_hat = self.predict_z(freq, x=fp["x"])
        else:
            z_hat = np.asarray(info["model"].predict_z(freq))
        ax = plt_mod.plot_nyquist((freq, self.z_fit), ax=ax, label="data", **kw)
        plt_mod.plot_nyquist((freq, z_hat), ax=ax, plot_func="plot", c="k", label="fit")
        ax.legend()
        return ax

    def evaluate_bayes_factor(self, candidate_id_1, candidate_id_2,
                              candidate_type="discrete", criterion="bic"):
        """Pairwise Bayes factor of candidate 2 over candidate 1
        (reference drt1d.py:2399)."""
        c1 = self.get_candidate(candidate_id_1, candidate_type)
        c2 = self.get_candidate(candidate_id_2, candidate_type)
        if criterion == "bic":
            from ..utils.stats import bayes_factor
            return bayes_factor(c1["bic"], c2["bic"])
        # llh/lml-style criteria: larger is better
        return float(np.exp(c2[criterion] - c1[criterion]))

    def create_reordered_discrete_models(self, min_num_peaks=None, max_num_peaks=None,
                                         start_from_best=True, search_kw=None):
        """Re-fit discrete models over a peak-count range built from the
        ranked peak pool and keep any that improve on the stored candidates
        (reference drt1d.py:2221)."""
        if min_num_peaks is None:
            min_num_peaks = 1
        if max_num_peaks is None:
            best_num = int(self.discrete_candidate_df.loc[
                self.discrete_candidate_df["lml"].idxmax(), "num_peaks"])
            max_num_peaks = best_num + 3
        return self.search_for_better_discrete(
            min_num_peaks=min_num_peaks, max_num_peaks=max_num_peaks,
            start_from_best=start_from_best, **(search_kw or {}))

    def get_chrono_transforms(self, include_outliers=True):
        """Time-transform functions for chrono plotting
        (reference drt1d.py:4547)."""
        times = self.get_fit_times()
        if include_outliers and getattr(self, "chrono_outliers", None) is not None:
            times = np.unique(np.concatenate([times, self.chrono_outliers[0]]))
        return chrono_utils.get_time_transforms(times, self.nonconsec_step_times)

    def evaluate_norm_bayes_factors(self, candidate_type="discrete", criterion="bic",
                                    candidate_id=None):
        """Bayes factors of each candidate relative to the best
        (reference drt1d.py:2383)."""
        df = self.get_candidate_df(candidate_type)
        vals = df[criterion].values
        if criterion == "bic":
            bf = np.exp(-0.5 * (vals - np.min(vals)))
        else:
            bf = np.exp(vals - np.max(vals))
        if candidate_id is not None:
            idx = np.where(df["model_id"].values == candidate_id)[0]
            return bf[idx]
        return bf

    def predict_pdrt(self, tau=None, ppd=20, criterion="bic", criterion_factor=1):
        """BIC/LML-weighted model-averaged peak-probability density over tau
        (reference drt1d.py:2502)."""
        if tau is None:
            tau = self.get_tau_eval(ppd)
        tau = np.asarray(tau)
        pdrt = np.zeros(len(tau))
        for cand_id, info in self.discrete_candidate_dict.items():
            peak_tau = info["model"].get_peak_tau(find_peaks_kw={"height": 0})
            if criterion == "bic":
                peak_prob = np.exp(-0.5 * criterion_factor * info["rel_bic"])
            elif criterion == "lml":
                peak_prob = np.exp(criterion_factor * info["rel_lml"])
            elif criterion is None:
                peak_prob = 1.0
            else:
                raise ValueError(f"Invalid criterion {criterion}")
            for pt in peak_tau:
                pdrt += peak_prob * np.exp(-(self.tau_epsilon * np.log(tau / pt)) ** 2)
        if np.max(pdrt) > 0:
            pdrt /= np.max(pdrt)
        return pdrt

    # ------------------------------------------------------------------
    # Attribute persistence (reference drt1d.py:6325-6391)
    # ------------------------------------------------------------------
    @property
    def attribute_categories(self):
        return {
            "config": [
                "fixed_basis_tau", "tau_supergrid", "basis_tau", "tau_basis_type",
                "tau_epsilon", "extend_basis_decades", "step_model", "chrono_mode",
                "fixed_basis_nu", "basis_nu", "nu_basis_type", "nu_epsilon", "fit_dop",
                "normalize_dop", "fit_inductance", "fit_ohmic", "fit_capacitance",
                "series_neg", "integrate_method", "v_baseline_deg", "v_baseline_sqrt",
            ],
            "fit_core": [
                "fit_parameters", "fit_type", "fit_kwargs", "special_qp_params",
                "coefficient_scale", "impedance_scale", "input_signal_scale",
                "response_signal_scale", "inductance_scale", "capacitance_scale",
                "dop_scale_vector", "v_baseline_scale", "scaled_response_offset",
                "qphb_params", "step_times", "step_sizes", "tau_rise",
                "nonconsec_step_times", "t_fit", "f_fit", "z_fit", "z_fit_scaled",
                "raw_input_signal", "raw_response_signal",
            ],
            "detail": ["qphb_history", "pfrt_result", "fit_matrices"],
        }

    def get_attributes(self, which=None):
        """Collect attributes by category into a dict (reference drt1d.py:6361)."""
        cats = self.attribute_categories
        if which is None:
            which = ["config", "fit_core"]
        if isinstance(which, str):
            which = [which]
        out = {}
        for cat in which:
            for name in cats[cat]:
                out[name] = deepcopy(getattr(self, name, None))
        return out

    def set_attributes(self, att_dict):
        for k, v in att_dict.items():
            setattr(self, k, v)
        return self

    def save_attributes(self, which, dest):
        import pickle
        with open(dest, "wb") as f:
            pickle.dump(self.get_attributes(which), f)

    def load_attributes(self, source):
        import pickle
        if isinstance(source, dict):
            return self.set_attributes(source)
        with open(source, "rb") as f:
            return self.set_attributes(pickle.load(f))

    # ------------------------------------------------------------------
    def copy(self):
        return deepcopy(self)


def _hypers_to_pytree(hypers):
    """Convert the hypers dict to a jit-friendly pytree of arrays/floats.

    None-valued optional hypers are kept as None (static)."""
    out = {}
    for k, v in hypers.items():
        if v is None:
            out[k] = None
        elif np.isscalar(v):
            out[k] = float(v)
        else:
            out[k] = jnp.asarray(np.asarray(v, dtype=float))
    return out
