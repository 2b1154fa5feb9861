"""QPHB hyperparameter defaults and data-size scaling.

Reference: hybdrt/models/qphb.py:183-255.
"""
import numpy as np


def get_data_factor(n_eff, ppd_eff):
    return np.sqrt(n_eff / (71 * np.sqrt(2))) * (10 * np.sqrt(2) / ppd_eff)


def get_data_factor_from_data(times, step_times, frequencies):
    from .. import preprocessing as pp
    if times is not None:
        chrono_num = len(np.asarray(times)[np.asarray(times) >= step_times[0]])
    else:
        chrono_num = 0
    eis_num = np.sqrt(2) * len(frequencies) if frequencies is not None else 0
    num_decades = pp.get_num_decades(frequencies, times, step_times)
    tot_num = eis_num + chrono_num
    tot_ppd = (tot_num - 1) / num_decades
    return get_data_factor(tot_num, tot_ppd)


def get_default_hypers(eff_hp=True, fit_dop=False, nu_basis_type="gaussian"):
    """Default hyperparameters of the hierarchical model (qphb.py:208-255)."""
    if eff_hp:
        s_alpha = np.array([5.0, 10.0, 25.0])
        rho_alpha = np.array([0.15, 0.2, 0.25])
    else:
        s_alpha = np.array([1.05, 1.15, 2.5])
        rho_alpha = np.array([0.05, 0.1, 0.05])

    hypers = dict(
        rp_scale=14.0,
        derivative_weights=np.array([1.5, 1.0, 0.5]),
        sigma_ds=np.array([1.0, 1000.0, 1000.0]),
        l1_lambda_0=0.0,
        l2_lambda_0=142.0,
        iw_alpha=None,
        iw_beta=None,
        s_alpha=s_alpha,
        s_0=np.ones(3),
        rho_alpha=rho_alpha,
        rho_0=np.ones(3),
        outlier_p=None,
    )

    if fit_dop:
        hypers.update(
            dop_l2_lambda_0=10.0,
            dop_l1_lambda_0=0.0,
            dop_derivative_weights=np.array([0.5, 1.0, 0.5]),
            dop_s_alpha=np.array([5.0, 10.0, 25.0]),
            dop_rho_alpha=np.array([0.15, 0.2, 0.25]),
            dop_s_0=np.ones(3),
            dop_rho_0=np.ones(3),
            dop_sigma_ds=np.array([1.0, 1000.0, 1000.0]),
        )
    return hypers
