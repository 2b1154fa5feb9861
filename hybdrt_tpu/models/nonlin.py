"""Nonlinear (bias-dependent) DRT: two stacked coefficient sets weighted by a
response-amplitude function, coupled by a cross penalty
(reference hybdrt/models/nonlin.py + the nonlin branches in qphb.py:84-117).

The negative-bias set applies where the weighting function w(t) -> 0 and the
positive-bias set where w(t) -> 1; EIS data (small perturbation) weights both
halves equally.
"""
import numpy as np

from .drt import DRT


# ------------------------------------------------------------------
# Response weighting functions (reference nonlin.py:1195-1280)
# ------------------------------------------------------------------
def minmax_normalize(x, percentiles=(1, 99), range_=(0.0, 1.0)):
    x_min = np.percentile(x, percentiles[0])
    x_max = np.percentile(x, percentiles[1])
    span = x_max - x_min
    if span == 0:  # constant signal: map to the lower end of the range
        return np.full_like(np.asarray(x, dtype=float), range_[0])
    y = np.clip((x - x_min) / span, 0, 1)
    return y * (range_[1] - range_[0]) + range_[0]


def exponential_func(x, margin=0.0):
    x = minmax_normalize(x, range_=(margin, 1 - margin))
    return (np.exp(x) - 1) / (np.exp(1) - 1)


def linear_func(x, margin=0.0):
    return minmax_normalize(x, range_=(margin, 1 - margin))


def get_func_from_string(func_str):
    """Parse 'v_exp' / 'i_lin' style weighting-function specs."""
    try:
        sig, func = func_str.split("_")
        if sig not in ("v", "i"):
            raise ValueError(f"Invalid signal name {sig}")
        base_func = {"exp": exponential_func, "lin": linear_func}[func]
    except (ValueError, KeyError) as err:
        raise ValueError(f"Could not parse nonlin_function string {func_str}") from err

    def nl_func(times, i_signal, v_signal):
        x = v_signal if sig == "v" else i_signal
        return base_func(np.asarray(x, dtype=float))
    return nl_func


class NonlinearDRT(DRT):
    """DRT whose distribution depends on the signal bias direction."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.nonlin_function = None
        self.nonlin_chrono_weights = None
        self._nl_config = {"nonlin_function": "v_exp", "nl_lambda_0": 100.0}

    # ------------------------------------------------------------------
    def _nonlin_kwargs(self, kw):
        return {}

    def fit_chrono(self, *args, nonlin_function="v_exp", nl_lambda_0=100.0, **kwargs):
        self._nl_config = {"nonlin_function": nonlin_function,
                           "nl_lambda_0": nl_lambda_0}
        return super().fit_chrono(*args, **kwargs)

    def fit_hybrid(self, *args, nonlin_function="v_exp", nl_lambda_0=100.0, **kwargs):
        self._nl_config = {"nonlin_function": nonlin_function,
                           "nl_lambda_0": nl_lambda_0}
        return super().fit_hybrid(*args, **kwargs)

    def fit_eis(self, *args, **kwargs):
        raise ValueError("Nonlinear DRT fits require chrono or hybrid data")

    # ------------------------------------------------------------------
    def _modify_qp_system(self, system, **kw):
        """Stack [negative | positive] coefficient sets
        (reference nonlin.py:665-745)."""
        if system["sample_times"] is None:
            raise ValueError("Nonlinear DRT fit requires chrono data")
        rzm = np.asarray(system["rzm"])
        m_big = rzm.shape[1]
        num_chrono = system["num_chrono"]

        nonlin_function = self._nl_config["nonlin_function"]
        nl_lambda_0 = self._nl_config["nl_lambda_0"]
        if isinstance(nonlin_function, str):
            nonlin_function = get_func_from_string(nonlin_function)
        self.nonlin_function = nonlin_function

        nl_weights_p = nonlin_function(system["sample_times"], system["sample_i"],
                                       system["sample_v"])
        nl_weights_n = 1 - nl_weights_p
        self.nonlin_chrono_weights = nl_weights_p

        # Extend weights for the EIS rows (small perturbation -> equal halves)
        n_data = rzm.shape[0]
        wn = np.ones(n_data) * 0.5
        wp = np.ones(n_data) * 0.5
        wn[:num_chrono] = nl_weights_n
        wp[:num_chrono] = nl_weights_p

        system["rzm"] = np.concatenate([rzm * wn[:, None], rzm * wp[:, None]], axis=1)
        if system.get("zm") is not None:
            zm = np.asarray(system["zm"])
            system["zm"] = np.concatenate([zm * 0.5, zm * 0.5], axis=1)
        if system.get("rzm_vz") is not None:
            rzm_vz = np.asarray(system["rzm_vz"])
            system["rzm_vz"] = np.concatenate(
                [rzm_vz * wn[:, None], rzm_vz * wp[:, None]], axis=1)

        # Duplicate penalty matrices block-diagonally
        m_stack = np.asarray(system["m_stack"])
        k = m_stack.shape[0]
        new_stack = np.zeros((k, 2 * m_big, 2 * m_big))
        new_stack[:, :m_big, :m_big] = m_stack
        new_stack[:, m_big:, m_big:] = m_stack
        system["m_stack"] = new_stack

        # Cross penalty tying the two halves; data-shared parameters
        # (v_baseline, vz_offset) are pinned together with a huge penalty
        m_cross = np.eye(2 * m_big)
        m_cross[:m_big, m_big:] = -np.eye(m_big)
        m_cross[m_big:, :m_big] = -np.eye(m_big)
        m_cross = m_cross * nl_lambda_0
        fixed_lambda = max(nl_lambda_0, 1) * 1e6
        for name in ("v_baseline", "vz_offset"):
            if name in self.special_qp_params:
                sp = self.special_qp_params[name]
                for idx in range(sp["index"], sp["index"] + sp.get("size", 1)):
                    m_cross[idx, idx] = fixed_lambda
                    m_cross[idx, m_big + idx] = -fixed_lambda
                    m_cross[m_big + idx, idx] = -fixed_lambda
                    m_cross[m_big + idx, m_big + idx] = fixed_lambda
        system["nl_cross"] = m_cross

        system["l1_lambda_vector"] = np.tile(np.asarray(system["l1_lambda_vector"]), 2)
        system["lb"] = np.tile(np.asarray(system["lb"]), 2)
        system["s_vectors"] = np.concatenate(
            [np.asarray(system["s_vectors"]), np.asarray(system["s_vectors"])], axis=1)
        system["cfg"] = system["cfg"]._replace(nonlin=True, half_size=m_big)
        return system

    # ------------------------------------------------------------------
    # Parameter extraction / conversion (reference nonlin.py:13-56)
    # ------------------------------------------------------------------
    def extract_qphb_parameters(self, x, rescale=True):
        x = np.asarray(x)
        x_n, x_p = np.split(x, 2)
        param_n = super().extract_qphb_parameters(x_n, rescale=rescale)
        param_p = super().extract_qphb_parameters(x_p, rescale=rescale)
        out = {f"{k}_neg": v for k, v in param_n.items()}
        out.update({f"{k}_pos": v for k, v in param_p.items()})
        return out

    def get_linear_params(self, kind):
        if kind not in ("neg", "pos"):
            raise ValueError(f"Invalid kind {kind}; options: neg, pos")
        return {"_".join(k.split("_")[:-1]): v
                for k, v in self.fit_parameters.items()
                if k.split("_")[-1] == kind}

    def to_linear(self, kind):
        """Extract one bias direction (or the mean) as a plain DRT."""
        if kind not in ("neg", "pos", "mean"):
            raise ValueError(f"Invalid kind {kind}; options: neg, pos, mean")
        if kind == "mean":
            neg = self.get_linear_params("neg")
            pos = self.get_linear_params("pos")
            params = {}
            for k in neg:
                if neg[k] is None or pos.get(k) is None:
                    params[k] = neg[k]
                else:
                    params[k] = 0.5 * (np.asarray(neg[k]) + np.asarray(pos[k])) \
                        if not np.isscalar(neg[k]) else 0.5 * (neg[k] + pos[k])
        else:
            params = self.get_linear_params(kind)
        lin = DRT(interpolate_integrals=False)
        lin.set_attributes(self.get_attributes(["config", "fit_core"]))
        lin.interpolate_lookups = self.interpolate_lookups
        lin.integrate_method = self.integrate_method
        lin.fit_parameters = params
        return lin

    def predict_response(self, times=None, kind=None, **pred_kw):
        """Response prediction: 'net' blends neg/pos by the fitted weights."""
        if kind is None:
            kind = "net" if times is None or np.array_equal(
                times, self.get_fit_times()) else "mean"
        if kind == "net":
            ndrt = self.to_linear("neg")
            pdrt = self.to_linear("pos")
            pw = self.nonlin_chrono_weights
            rv_n = ndrt.predict_response(times=times, **pred_kw)
            rv_p = pdrt.predict_response(times=times, **pred_kw)
            return rv_n * (1 - pw) + rv_p * pw
        return self.to_linear(kind).predict_response(times=times, **pred_kw)

    def predict_distribution(self, tau=None, ppd=20, order=0, x=None, sign=None,
                             normalize=False, kind="mean"):
        return self.to_linear(kind).predict_distribution(
            tau=tau, ppd=ppd, order=order, x=x, sign=sign, normalize=normalize)

    def predict_r_p(self, kind="mean", **kw):
        return self.to_linear(kind).predict_r_p(**kw)

    def _raw_x(self):
        n2 = self.qphb_params["rm"].shape[1]
        m_half = n2 // 2
        out = np.zeros(n2)
        for hi, suffix in enumerate(("neg", "pos")):
            fp = self.get_linear_params(suffix)
            off = hi * m_half
            out[off + self.get_qp_mat_offset():off + m_half] = \
                fp["x"] / self.coefficient_scale
            for name in self.special_qp_params:
                start, end = self.get_special_indices(name)
                start, end = start + off, end + off
                if name == "R_inf":
                    out[start] = fp["R_inf"] / self.coefficient_scale
                elif name == "inductance":
                    out[start] = fp["inductance"] / (self.coefficient_scale
                                                     * self.inductance_scale)
                elif name == "C_inv":
                    out[start] = fp["C_inv"] / (self.coefficient_scale
                                                * self.capacitance_scale)
                elif name == "vz_offset":
                    out[start] = fp["vz_offset"]
                elif name == "v_baseline":
                    vb = np.atleast_1d(fp["v_baseline"]) / self.response_signal_scale
                    vb = np.array(vb, dtype=float)
                    vb[0] += self.scaled_response_offset
                    out[start:end] = vb * self.v_baseline_scale
                elif name == "x_dop":
                    out[start:end] = fp["x_dop"] / (self.dop_scale_vector
                                                    * self.coefficient_scale)
        return out
