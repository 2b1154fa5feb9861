"""Accuracy evaluation of DRT estimates against exact models
(reference hybdrt/evaluation.py): regression metrics (R^2, chi^2, RSS, KL/JS
divergence with singularity discretization), classification metrics on matched
peaks (precision/recall/F1), and combined scores."""
import numpy as np
from scipy.stats import hmean



# ------------------------------------------------------------------
# Regression metrics (reference evaluation.py:807-987)
# ------------------------------------------------------------------
def r2_score(y_true, y_est, weights=None):
    y_true = np.asarray(y_true)
    y_est = np.asarray(y_est)
    if weights is None:
        weights = np.ones_like(y_true)
    ss_res = np.sum(weights * (y_true - y_est) ** 2)
    ss_tot = np.sum(weights * (y_true - np.average(y_true, weights=weights)) ** 2)
    return 1 - ss_res / ss_tot


def chi_sq(y_true, y_est, weights=None):
    y_true = np.asarray(y_true)
    y_est = np.asarray(y_est)
    resid = y_est - y_true
    if np.iscomplexobj(resid):
        resid = np.concatenate([resid.real, resid.imag])
        if weights is not None and np.iscomplexobj(weights):
            weights = np.concatenate([weights.real, weights.imag])
        elif weights is not None:
            weights = np.tile(weights, 2)
    if weights is None:
        weights = np.ones_like(resid)
    return np.sum((resid * weights) ** 2) / len(resid)


def rss(p, q, weights=None, sigma_uniform=None, normalize=False):
    p = np.asarray(p)
    q = np.asarray(q)
    resid = p - q
    if sigma_uniform is not None:
        resid = resid / sigma_uniform
    elif weights is not None:
        resid = resid * weights
    out = np.sum(resid ** 2)
    if normalize:
        out = out / len(p)
    return out


def normalize_distributions(x, *distributions, common_norm=False, discrete=False):
    """Normalize distributions to unit area (or unit sum for discrete)."""
    out = []
    if common_norm:
        norms = [np.sum(np.abs(d)) if discrete
                 else np.trapezoid(np.abs(d), x=x) for d in distributions]
        norm = max(norms)
        return [d / norm for d in distributions]
    for d in distributions:
        norm = np.sum(np.abs(d)) if discrete else np.trapezoid(np.abs(d), x=x)
        out.append(d / norm if norm > 0 else d)
    return out


def kl_div_array(x, p, q, pad=1e-5, normalize=False, discrete=False):
    """Pointwise KL divergence contribution p*log(p/q)."""
    p = np.asarray(p, dtype=float)
    q = np.asarray(q, dtype=float)
    if normalize:
        p, q = normalize_distributions(x, p, q, discrete=discrete)
    p = np.abs(p) + pad
    q = np.abs(q) + pad
    return p * np.log(p / q)


def kl_divergence(x, p, q, pad=1e-5, normalize=False, discrete=False):
    div = kl_div_array(x, p, q, pad, normalize, discrete)
    return np.sum(div) if discrete else np.trapezoid(div, x=x)


def js_div_array(x, p, q, **kl_kw):
    # Normalize BEFORE forming the mixture: m must be the midpoint of the
    # normalized densities, else different total masses skew the mixture
    # toward the heavier distribution and the result is not the JS
    # divergence (it can exceed ln 2 or go negative)
    if kl_kw.get("normalize"):
        p, q = normalize_distributions(x, p, q,
                                       discrete=kl_kw.get("discrete", False))
        kl_kw = dict(kl_kw, normalize=False)
    m = 0.5 * (np.asarray(p) + np.asarray(q))
    return 0.5 * kl_div_array(x, p, m, **kl_kw) + 0.5 * kl_div_array(x, q, m, **kl_kw)


def js_divergence(x, p, q, **kl_kw):
    div = js_div_array(x, p, q, **kl_kw)
    return np.sum(div) if kl_kw.get("discrete") else np.trapezoid(div, x=x)


def sqe_distance(x, p, q, normalize=False, discrete=False):
    if normalize:
        p, q = normalize_distributions(x, p, q, discrete=discrete)
    arr = (np.asarray(p) - np.asarray(q)) ** 2
    return np.sum(arr) if discrete else np.trapezoid(arr, x=x)


def divergence_index(div):
    """Map a divergence to a [0, 1] accuracy index."""
    return np.exp(-div)


def discretize_distribution(tau, gamma, singularity_info=None):
    """Convert gamma(ln tau) into per-point masses, inserting point masses for
    singular (RC-like) elements (reference evaluation.py:909-933)."""
    ln_tau = np.log(np.asarray(tau))
    gamma = np.asarray(gamma, dtype=float)
    # Trapezoid mass in each interval, split to nodes
    d = np.diff(ln_tau)
    masses = np.zeros_like(gamma)
    seg = 0.5 * (gamma[:-1] + gamma[1:]) * d
    masses[:-1] += 0.5 * seg
    masses[1:] += 0.5 * seg
    if singularity_info is not None:
        for r, tau_0 in singularity_info:
            idx = int(np.argmin(np.abs(ln_tau - np.log(tau_0))))
            masses[idx] += r
    return masses


def r2_dev_arrays(y_true, y_est, weights=None):
    """Per-point residual and deviation-from-mean arrays underlying R^2
    (reference evaluation.py)."""
    y_true = np.asarray(y_true)
    w = 1 if weights is None else np.asarray(weights)
    return w * (y_true - np.asarray(y_est)), w * (y_true - np.mean(y_true))


def rss_array(p, q, weights=None, sigma_uniform=None, normalize=False):
    """Per-point weighted squared residuals (reference evaluation.py). With
    weights=None, the variance model var = p^2 + sigma_uniform^2 supplies the
    weights (sigma_uniform defaults to 25% of sum(p))."""
    p = np.asarray(p, dtype=float)
    q = np.asarray(q, dtype=float)
    if weights is None:
        if sigma_uniform is None:
            sigma_uniform = np.sum(p) * 0.25
        weights = (p ** 2 + sigma_uniform ** 2) ** -0.5
    normalize_by = np.sum((weights * p) ** 2) if normalize else 1
    return (weights * (p - q)) ** 2 / normalize_by


def sqe_distance_array(x, p, q, normalize=False, discrete=False):
    """Per-point squared-error distance between distributions
    (reference evaluation.py)."""
    if normalize:
        p, q = normalize_distributions(x, p, q, common_norm=True,
                                       discrete=discrete)
    return (np.asarray(p) - np.asarray(q)) ** 2


def calculate_reg_metrics(tau, y_exact, y_est, discrete=False, normalize=True,
                          pad=1e-5, sigma_uniform=None):
    """Regression summary: R^2, weighted/unweighted RSS, KL/JS divergence
    indices, squared-error distance (reference evaluation.py:567-604)."""
    x = np.log(np.asarray(tau))
    kl = kl_divergence(x, y_exact, y_est, pad=pad, normalize=normalize,
                       discrete=discrete)
    js = js_divergence(x, y_exact, y_est, pad=pad, normalize=normalize,
                       discrete=discrete)
    wrss = rss_array(y_exact, y_est, weights=None, normalize=normalize,
                     sigma_uniform=sigma_uniform)
    urss = rss_array(y_exact, y_est, weights=1, normalize=normalize,
                     sigma_uniform=sigma_uniform)
    sqed = sqe_distance_array(x, y_exact, y_est, normalize=normalize,
                              discrete=discrete)
    agg = np.sum if discrete else (lambda a: np.trapezoid(a, x=x))
    return {
        "r2": r2_score(y_exact, y_est),
        "rss": rss(y_exact, y_est, sigma_uniform=sigma_uniform, normalize=True),
        "wrss": float(np.sum(wrss)),
        "urss": float(np.sum(urss)),
        "sqed": float(agg(sqed)),
        "kl_div": kl,
        "js_div": js,
        "kl_index": divergence_index(kl),
        "js_index": divergence_index(js),
        "f_kl": float(np.exp(-2 * kl)),
    }


# ------------------------------------------------------------------
# Peak classification metrics (reference evaluation.py:606-722, 1021-1124)
# ------------------------------------------------------------------
def get_model_r_p(model, tau=None):
    """Polarization resistance of any distribution-bearing model: its own
    predict_r_p if available, else the integral of gamma over ln(tau) plus
    any singularity mass (reference evaluation.py)."""
    if hasattr(model, "predict_r_p"):
        return model.predict_r_p()
    if tau is None:
        raise ValueError("tau must be provided if model does not define "
                         "predict_r_p")
    r_p = np.trapezoid(np.asarray(model.predict_distribution(tau)),
                       x=np.log(tau))
    sing = getattr(model, "singularity_info", None)
    if sing is not None:
        r_p += np.sum([si[0] for si in sing])
    return r_p


def merge_singular_peaks(tau_cls, peak_tau, singularity_info):
    """Add peaks from distribution singularities (delta-like elements) to
    the peaks found in the smooth part; returns (sorted peak_tau, indices of
    the singular peaks) (reference evaluation.py)."""
    from . import peaks as peaks_mod
    if singularity_info is None:
        return peak_tau, None
    peak_tau = np.atleast_1d(np.asarray(peak_tau, dtype=float))
    dx = np.mean(np.abs(np.diff(np.log(tau_cls))))
    sing_tau = np.array([si[1] for si in singularity_info])
    add = peaks_mod.find_new_peaks(np.log(sing_tau), np.log(peak_tau), dx)
    if isinstance(add, tuple):  # np.where form
        add = add[0]
    all_tau = np.concatenate([peak_tau, sing_tau[add]])
    order = np.argsort(all_tau)
    # Sorted positions of the appended singular peaks
    sing_index = np.nonzero(order >= len(peak_tau))[0]
    return all_tau[order], sing_index


def p2p_distance(tau_a, tau_b, a2b_index):
    """ln(tau)-space distance from each peak in tau_a to its matched peak in
    tau_b (index -1 = unmatched = infinite distance)
    (reference evaluation.py)."""
    tau_a = np.asarray(tau_a, dtype=float)
    tau_b = np.asarray(tau_b, dtype=float)
    if len(tau_a) == 0:
        return np.array([])
    if len(tau_b) == 0:
        return np.full(len(tau_a), np.inf)
    a2b_index = np.asarray(a2b_index)
    if len(tau_a) != len(a2b_index):
        raise ValueError("a2b_index must have same length as tau_a")
    dist = np.abs(np.log(tau_a / tau_b[a2b_index]))
    dist[a2b_index == -1] = np.inf
    return dist


def process_model_instance(model, tau_reg, tau_cls, discretize=False,
                           normalize_find_peaks=True, find_peaks_kw=None):
    """Evaluate a model for scoring: (regression vector on tau_reg, peak
    locations on tau_cls). With discretize=True, singular distributions are
    converted to per-point relaxation mass (reference evaluation.py)."""
    if discretize:
        if hasattr(model, "predict_mass"):
            y_reg = model.predict_mass(tau_reg)
        else:
            y_reg = discretize_distribution(
                tau_reg, np.asarray(model.predict_distribution(tau_reg)),
                getattr(model, "singularity_info", None))
    else:
        y_reg = np.asarray(model.predict_distribution(tau_reg))
    peak_tau = find_model_peaks(model, tau_cls, normalize_find_peaks,
                                find_peaks_kw)
    return y_reg, peak_tau


def get_similarity_function(function_type):
    if function_type == "gaussian":
        def func(y, epsilon, order=2):
            return np.exp(-np.abs(np.asarray(y) * epsilon) ** order)
        return func
    raise ValueError(f"Invalid similarity function {function_type}")


def match_peaks(est_peak_tau, true_peak_tau):
    """Greedy nearest-log-tau matching of estimated to true peaks
    (reference evaluation.py:1040). Returns index of matched true peak for
    each estimated peak (-1 = unmatched)."""
    est = np.log(np.asarray(est_peak_tau, dtype=float))
    true = np.log(np.asarray(true_peak_tau, dtype=float))
    match_index = np.full(len(est), -1, dtype=int)
    if len(true) == 0 or len(est) == 0:
        return match_index
    dist = np.abs(est[:, None] - true[None, :])
    order = np.argsort(dist, axis=None)
    used_est, used_true = set(), set()
    for flat in order:
        i, j = np.unravel_index(flat, dist.shape)
        if i in used_est or j in used_true:
            continue
        match_index[i] = j
        used_est.add(i)
        used_true.add(j)
    return match_index


def peak_similarity(est_peak_tau, true_peak_tau, sim_function_type="gaussian",
                    order=2, epsilon=1.0):
    """Similarity of matched peak positions in log tau."""
    match_index = match_peaks(est_peak_tau, true_peak_tau)
    sim_func = get_similarity_function(sim_function_type)
    est = np.log(np.asarray(est_peak_tau, dtype=float))
    true = np.log(np.asarray(true_peak_tau, dtype=float))
    sims = np.zeros(len(est))
    for i, j in enumerate(match_index):
        if j >= 0:
            sims[i] = sim_func(est[i] - true[j], epsilon, order)
    return sims, match_index


def cls_metrics_from_counts(tp_count, fp_count, fn_count):
    precision = tp_count / (tp_count + fp_count) if tp_count + fp_count > 0 else 0.0
    recall = tp_count / (tp_count + fn_count) if tp_count + fn_count > 0 else 0.0
    f1 = try_hmean([precision, recall])
    return {"precision": precision, "recall": recall, "f1": f1,
            "tp": tp_count, "fp": fp_count, "fn": fn_count}


def calculate_cls_metrics(est_peak_tau, exact_peak_tau, sim_function_kw=None):
    """Soft precision/recall/F1 from peak-position similarities
    (reference evaluation.py:606-652)."""
    sim_function_kw = sim_function_kw or {"epsilon": 1.0, "order": 2}
    sims, match_index = peak_similarity(est_peak_tau, exact_peak_tau,
                                        **sim_function_kw)
    tp = float(np.sum(sims))
    fp = float(len(est_peak_tau) - tp)
    fn = float(len(exact_peak_tau) - tp)
    fp = max(fp, 0.0)
    fn = max(fn, 0.0)
    return cls_metrics_from_counts(tp, fp, fn)


def try_hmean(x):
    x = np.asarray(x, dtype=float)
    if np.any(x <= 0):
        return 0.0
    return hmean(x)


def calculate_combo_metrics(reg_summary, cls_summary):
    """Harmonic-mean combination of regression and classification accuracy
    (reference evaluation.py:682)."""
    return {
        "f1-js": try_hmean([cls_summary["f1"], reg_summary["js_index"]]),
        "f1-kl": try_hmean([cls_summary["f1"], reg_summary["kl_index"]]),
        "f1-r2": try_hmean([cls_summary["f1"], max(reg_summary["r2"], 0)]),
    }


def aggregate_metrics(metric_dicts, weights=None):
    keys = metric_dicts[0].keys()
    if weights is None:
        weights = np.ones(len(metric_dicts))
    weights = np.asarray(weights, dtype=float)
    return {k: float(np.average([m[k] for m in metric_dicts], weights=weights))
            for k in keys}


# ------------------------------------------------------------------
# DrtScorer (reference evaluation.py:16-456)
# ------------------------------------------------------------------
class DrtScorer:
    """Score estimated DRT models against an exact generative model.

    Models may be DRT instances, DiscreteElementModel instances, or callables
    gamma(tau); exact peak locations may be passed directly."""

    def __init__(self, normalize=True, find_peaks_kw=None, sim_function_kw=None,
                 reg_kw=None):
        self.normalize = normalize
        self.find_peaks_kw = find_peaks_kw or {}
        self.sim_function_kw = sim_function_kw or {"epsilon": 1.0, "order": 2}
        self.reg_kw = reg_kw or {}
        self.results_ = None
        self.exact_model = None
        self.est_model = None
        self.rc_curve_args = None
        self.rc_curve_metrics = None

    @staticmethod
    def _gamma_of(model, tau):
        if callable(model):
            return np.asarray(model(tau))
        if hasattr(model, "predict_distribution"):
            out = model.predict_distribution(tau)
            if isinstance(out, tuple):
                out = out[0]
            return np.asarray(out)
        raise ValueError("Model must be callable or have predict_distribution")

    @staticmethod
    def _peaks_of(model, tau, find_peaks_kw):
        if hasattr(model, "find_peaks"):
            return np.asarray(model.find_peaks(tau=tau, **find_peaks_kw))
        if hasattr(model, "get_peak_tau"):
            return np.asarray(model.get_peak_tau())
        if callable(model):
            # Plain gamma(tau) callables: curvature-based peak detection.
            # An empty dict means "unconfigured" -> let find_model_peaks
            # derive its automatic prominence threshold
            return np.asarray(find_model_peaks(model, tau,
                                               find_peaks_kw=find_peaks_kw
                                               or None))
        raise ValueError("Model must provide find_peaks or get_peak_tau, "
                         "or be a callable gamma(tau)")

    def evaluate_models(self, exact_model, est_model, tau_reg, tau_cls,
                        exact_peak_tau=None):
        """Full scoring: regression over tau_reg + peak classification over
        tau_cls + combined metrics."""
        self.exact_model = exact_model
        self.est_model = est_model
        y_exact = self._gamma_of(exact_model, tau_reg)
        y_est = self._gamma_of(est_model, tau_reg)
        if exact_peak_tau is None:
            exact_peak_tau = self._peaks_of(exact_model, tau_cls, self.find_peaks_kw)
        est_peak_tau = self._peaks_of(est_model, tau_cls, self.find_peaks_kw)
        return self.evaluate_data((tau_reg, y_exact, y_est),
                                  (tau_cls, exact_peak_tau, est_peak_tau))

    def evaluate_data(self, regression_data, classification_data,
                      is_discretized=False):
        """Score from raw arrays instead of model instances (reference
        evaluation.py:153-190): regression_data = (tau_reg, y_exact, y_est),
        classification_data = (tau_cls, exact_peak_tau, est_peak_tau)."""
        tau_reg, y_exact, y_est = regression_data
        tau_cls, exact_peak_tau, est_peak_tau = classification_data
        reg = calculate_reg_metrics(tau_reg, y_exact, y_est,
                                    discrete=is_discretized,
                                    normalize=self.normalize, **self.reg_kw)
        cls = calculate_cls_metrics(est_peak_tau, exact_peak_tau,
                                    self.sim_function_kw)
        combo = calculate_combo_metrics(reg, cls)
        self.results_ = {"regression": reg, "classification": cls,
                         "combined": combo}
        # Stored inputs power plot_drt_comparison / metric_summary
        self._last_eval = {
            "tau_reg": np.asarray(tau_reg, dtype=float),
            "y_exact": np.asarray(y_exact, dtype=float),
            "y_est": np.asarray(y_est, dtype=float),
            "tau_cls": np.asarray(tau_cls, dtype=float),
            "exact_peak_tau": np.asarray(exact_peak_tau, dtype=float),
            "est_peak_tau": np.asarray(est_peak_tau, dtype=float),
        }
        return self.results_

    def get_regression_vector(self, model_name, tau_reg=None, discretize=False):
        """Distribution (or discretized relaxation-mass) vector of the exact
        or estimated model over ``tau_reg`` (reference evaluation.py:214).
        Falls back to the vectors stored by the last evaluate call when no
        model instance is available."""
        if model_name not in ("exact", "est"):
            raise ValueError(f"Invalid model_name {model_name}: "
                             "must be 'exact' or 'est'")
        last = getattr(self, "_last_eval", None)
        if tau_reg is None:
            if last is None:
                raise ValueError("No stored tau_reg; pass tau_reg or run an "
                                 "evaluate call first")
            tau_reg = last["tau_reg"]
        tau_reg = np.asarray(tau_reg, dtype=float)
        model = getattr(self, f"{model_name}_model", None)
        if model is not None and (callable(model)
                                  or hasattr(model, "predict_distribution")):
            if discretize:
                if hasattr(model, "predict_mass"):
                    return np.asarray(model.predict_mass(tau_reg))
                return discretize_distribution(
                    tau_reg, self._gamma_of(model, tau_reg),
                    getattr(model, "singularity_info", None))
            return self._gamma_of(model, tau_reg)
        if last is None or not np.array_equal(tau_reg, last["tau_reg"]):
            raise ValueError("No model instance available for prediction "
                             "over a custom tau array")
        y = last[f"y_{model_name}"].copy()
        return discretize_distribution(tau_reg, y) if discretize else y

    @property
    def metric_summary(self):
        """Flat merged metric dict of the last evaluation (reference
        evaluation.py metric_summary attribute)."""
        if self.results_ is None:
            return None
        return {**self.results_["regression"], **self.results_["classification"],
                **self.results_["combined"]}

    def compute_rc_curve(self, exact_model, data_list, fit_function, arg_array,
                         tau_reg, tau_cls, aggregate_weights=None,
                         print_progress=False):
        """Metric curves over an experiment axis (reference
        evaluation.py:253-302): for each argument vector in ``arg_array``,
        fit every dataset in ``data_list`` with
        ``fit_function(data, *args) -> est_model``, score each fit against
        ``exact_model``, and aggregate the flat metrics across datasets.

        Returns {metric: (len(arg_array),) array}; also stored as
        ``rc_curve_args`` / ``rc_curve_metrics``."""
        arg_array = np.asarray(arg_array, dtype=object) \
            if np.ndim(arg_array) == 1 else np.asarray(arg_array)
        vec_dict = None
        for i, arg_vec in enumerate(arg_array):
            arg_vec = np.atleast_1d(arg_vec)
            if print_progress:
                print(f"rc_curve args[{i}] = {arg_vec}")
            metric_dicts = []
            for data in data_list:
                est_model = fit_function(data, *arg_vec)
                self.evaluate_models(exact_model, est_model, tau_reg, tau_cls)
                metric_dicts.append(self.metric_summary)
            agg = aggregate_metrics(metric_dicts, weights=aggregate_weights)
            if vec_dict is None:
                vec_dict = {k: np.empty(len(arg_array)) for k in agg}
            for k, v in agg.items():
                vec_dict[k][i] = v
        self.rc_curve_args = np.array(arg_array, copy=True)
        self.rc_curve_metrics = {k: v.copy() for k, v in vec_dict.items()}
        return vec_dict

    def plot_drt_comparison(self, tau=None, ax=None, scale_prefix=None,
                            mark_est_peaks=True, mark_exact_peaks=True,
                            exact_kw=None, est_kw=None):
        """Overlay the exact and estimated distributions of the last
        evaluation, optionally marking each model's detected peaks
        (reference evaluation.py:304-456)."""
        from .plotting import plot_distribution, get_scale_prefix
        last = getattr(self, "_last_eval", None)
        if last is None:
            raise ValueError("No evaluation stored; run evaluate_models or "
                             "evaluate_data first")
        if tau is None or np.array_equal(np.asarray(tau), last["tau_reg"]):
            tau = last["tau_reg"]
            y_exact, y_est = last["y_exact"], last["y_est"]
        else:
            if self.exact_model is None or self.est_model is None:
                raise ValueError("Custom tau requires model instances; "
                                 "re-run evaluate_models")
            y_exact = self._gamma_of(self.exact_model, tau)
            y_est = self._gamma_of(self.est_model, tau)
        if scale_prefix is None:
            scale_prefix = get_scale_prefix(
                np.concatenate([y_exact, y_est]))
        exact_kw = {"ls": "--", "zorder": -10, "label": "Exact",
                    **(exact_kw or {})}
        est_kw = {"c": "k", "label": "Estimate", **(est_kw or {})}
        ax = plot_distribution(tau, y_exact, ax=ax, scale_prefix=scale_prefix,
                               **exact_kw)
        ax = plot_distribution(tau, y_est, ax=ax, scale_prefix=scale_prefix,
                               **est_kw)
        if mark_exact_peaks and len(last["exact_peak_tau"]):
            for pt in last["exact_peak_tau"]:
                ax.axvline(pt, color=ax.lines[0].get_color(), lw=0.8,
                           alpha=0.4, ls=":")
        if mark_est_peaks and len(last["est_peak_tau"]):
            gamma_pk = np.interp(np.log(last["est_peak_tau"]), np.log(tau),
                                 y_est)
            from .plotting import _scale_factor
            ax.scatter(last["est_peak_tau"],
                       gamma_pk / _scale_factor(scale_prefix),
                       marker="x", c=est_kw.get("c", "k"), zorder=5)
        ax.legend()
        return ax


# ------------------------------------------------------------------
# Threshold-swept precision-recall curve (reference evaluation.py:519-756)
# ------------------------------------------------------------------
def find_model_peaks(model, tau_cls, normalize=True, find_peaks_kw=None,
                     return_prominence=False):
    """Locate peaks of a model's distribution on ``tau_cls`` from the
    curvature of gamma(ln tau), optionally returning the curvature
    prominence of each peak (reference evaluation.py:519-564).

    The model may be a DRT-like object (``predict_distribution`` accepting an
    ``order`` argument), any object with ``predict_distribution(tau)``, or a
    plain callable gamma(tau); curvature falls back to finite differences when
    analytic derivatives are unavailable.
    """
    from scipy.signal import find_peaks as _sp_find_peaks

    tau_cls = np.asarray(tau_cls, dtype=float)
    gamma = DrtScorer._gamma_of(model, tau_cls)
    scale = 1.0
    if normalize:
        scale = np.trapezoid(np.abs(gamma), x=np.log(tau_cls))
        scale = scale if scale > 0 else 1.0

    # Curvature d^2 gamma / d(ln tau)^2: analytic when the model supports it
    fxx = None
    if hasattr(model, "predict_distribution"):
        try:
            fxx = np.asarray(model.predict_distribution(tau_cls, order=2))
        except TypeError:
            fxx = None
    if fxx is None:
        ln_tau = np.log(tau_cls)
        fx = np.gradient(gamma, ln_tau)
        fxx = np.gradient(fx, ln_tau)
    fxx = fxx / scale

    if find_peaks_kw is None:
        finite = fxx[np.isfinite(fxx)]
        prom_thresh = 0.05 * np.std(finite) + 5e-3
        find_peaks_kw = {"height": 0, "prominence": prom_thresh}
    peak_index, props = _sp_find_peaks(-fxx, **find_peaks_kw)
    peak_tau = tau_cls[peak_index]

    if return_prominence:
        prominences = props.get("prominences")
        if prominences is None:
            # Compute prominences for exactly the peaks found above so the
            # two returned arrays stay aligned
            from scipy.signal import peak_prominences
            prominences = peak_prominences(-fxx, peak_index)[0]
        return peak_tau, np.asarray(prominences, dtype=float)
    return peak_tau


def peakthresh_pr_curve(exact_model, est_model, tau_cls, normalize=True,
                        find_exact_peaks_kw=None, sim_function_kw=None,
                        exact_peak_tau=None, return_thresholds=False):
    """Precision-recall curve of peak detection as the curvature-prominence
    threshold is swept from 0 to above the largest estimated-peak prominence
    (reference evaluation.py:724-756).

    Returns ``(ppv, tpr)`` arrays of length ``n_thresholds + 1``; the final
    entry is the zero-detection limit (TPR=0, PPV=1). Pass
    ``return_thresholds=True`` to also receive the threshold values used
    (the last being +inf)."""
    if exact_peak_tau is None:
        exact_peak_tau = find_model_peaks(
            exact_model, tau_cls, normalize, find_exact_peaks_kw)
    exact_peak_tau = np.asarray(exact_peak_tau, dtype=float)

    # All candidate peaks: zero prominence floor so the sweep covers the
    # entire operating range of the detector
    est_peak_tau, est_prom = find_model_peaks(
        est_model, tau_cls, normalize,
        find_peaks_kw={"height": 0, "prominence": 0}, return_prominence=True)

    thresholds = np.unique(est_prom)
    ppv = np.ones(len(thresholds) + 1)
    tpr = np.zeros(len(thresholds) + 1)
    for i, thresh in enumerate(thresholds):
        kept = est_peak_tau[est_prom >= thresh]
        summary = calculate_cls_metrics(kept, exact_peak_tau, sim_function_kw)
        ppv[i] = summary["precision"]
        tpr[i] = summary["recall"]
    if return_thresholds:
        return ppv, tpr, np.append(thresholds, np.inf)
    return ppv, tpr


def pr_auc(ppv, tpr):
    """Area under a (recall, precision) curve by trapezoid over recall."""
    order = np.argsort(tpr)
    return float(np.trapezoid(np.asarray(ppv)[order], x=np.asarray(tpr)[order]))


# Reference-compatible aliases (reference evaluation.py)
calculate_regression_metrics = calculate_reg_metrics
calculate_classification_metrics = calculate_cls_metrics
