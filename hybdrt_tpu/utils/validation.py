"""Input validation (reference: hybdrt/utils/validation.py)."""
import numpy as np

basis_options = ["gaussian", "Cole-Cole", "zga", "delta", "step", "pwl", "beta",
                 "Zic", "ramp", "bounded_ramp", "pwl_transformed", "beta-rbf"]
step_model_options = ["ideal", "expdecay"]
ctrl_mode_options = ["galv", "pot"]
penalty_type_options = ["integral", "discrete"]
error_structure_options = [None, "uniform"]


def check_option(value, options, name):
    if value not in options:
        raise ValueError(f"Invalid {name} {value!r}. Options: {options}")


def check_basis_type(basis_type):
    check_option(basis_type, basis_options, "basis_type")


def check_step_model(step_model):
    check_option(step_model, step_model_options, "step_model")


def check_ctrl_mode(op_mode):
    check_option(op_mode, ctrl_mode_options, "op_mode")


def check_penalty_type(penalty_type):
    check_option(penalty_type, penalty_type_options, "penalty_type")


def check_error_structure(error_structure):
    check_option(error_structure, error_structure_options, "error_structure")


def check_eis_data(frequencies, z):
    if (frequencies is None) != (z is None):
        raise ValueError("frequencies and z must both be provided or both be None")
    if frequencies is not None:
        frequencies = np.asarray(frequencies)
        z = np.asarray(z)
        if len(frequencies) != len(z):
            raise ValueError("frequencies and z must have the same length")


def check_chrono_data(times, i_signal, v_signal):
    provided = [a is not None for a in (times, i_signal, v_signal)]
    if any(provided) and not all(provided):
        raise ValueError("times, i_signal, and v_signal must all be provided or all be None")
    if times is not None:
        n = len(np.asarray(times))
        if len(np.asarray(i_signal)) != n or len(np.asarray(v_signal)) != n:
            raise ValueError("times, i_signal, and v_signal must have the same length")


def check_equality(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    return a.shape == b.shape and bool(np.all(a == b))


def check_md_data(psi_array, chrono_data_list, eis_data_list):
    """Validate multi-dimensional mapping inputs (reference utils/md checks)."""
    n = len(psi_array)
    for name, lst in (("chrono", chrono_data_list), ("eis", eis_data_list)):
        if lst is not None and len(lst) != n:
            raise ValueError(f"{name}_data_list length {len(lst)} != {n} psi rows")
    if chrono_data_list is None and eis_data_list is None:
        raise ValueError("At least one of chrono_data_list/eis_data_list required")


def check_md_x_spec(x, tau_supergrid):
    """Validate a mapping coefficient array against the supergrid."""
    x = np.asarray(x)
    if x.shape[-1] != len(tau_supergrid):
        raise ValueError(f"x last dim {x.shape[-1]} != supergrid size "
                         f"{len(tau_supergrid)}")
