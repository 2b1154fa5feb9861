"""Tutorial 1 — Quickstart: fitting EIS data.

Mirrors the reference's "Quickstart: fitting experimental EIS data"
(reference tutorials/Quickstart_fitting_experimental_EIS_data.ipynb) on
simulated data so it runs anywhere with no files.

Covers:
  1. Simulating / inspecting an impedance spectrum
  2. The self-tuning Bayesian DRT fit (``DRT.fit_eis``) — no regularization
     knob to tune; the hierarchical prior adapts to the data
  3. Reading results: R_inf, Rp, the distribution gamma(tau), peaks
  4. Validating the measurement itself with a Kramers-Kronig test
  5. Re-using a configured model via ``DRT.copy``
"""
import numpy as np
import matplotlib.pyplot as plt

from tutorial_utils import QUICK, add_noise, savefig, use_cpu_f64, zarc

use_cpu_f64()

from hybdrt_tpu import DRT  # noqa: E402
from hybdrt_tpu import plotting as hplt  # noqa: E402

# ----------------------------------------------------------------------
# 1. The data: two overlapping relaxations + ohmic offset + noise.
#    Real data would come in via hybdrt_tpu.dataload (tutorial 2).
# ----------------------------------------------------------------------
n_freq = 41 if QUICK else 71
freq = np.logspace(5, -1, n_freq)
z_true = 0.4 + zarc(freq, 1.0, 1e-3, 0.9) + zarc(freq, 0.8, 1e-1, 0.85)
z = add_noise(z_true, 2e-3, seed=1)

fig, axes = plt.subplots(1, 3, figsize=(11, 3))
hplt.plot_eis((freq, z), axes=axes)
savefig(fig, "t01_data.png")

# ----------------------------------------------------------------------
# 2. Fit. The QPHB solver tunes its own regularization strength from the
#    data (hierarchical gamma priors on local/global scale); `nonneg=True`
#    (default) constrains the distribution to be non-negative.
# ----------------------------------------------------------------------
drt = DRT()
drt.fit_eis(freq, z)

# ----------------------------------------------------------------------
# 3. Results. fit_parameters holds the physical parameters; predict_*
#    methods evaluate the model on any grid.
# ----------------------------------------------------------------------
print(f"R_inf = {drt.fit_parameters['R_inf']:.4f}  (true 0.400)")
print(f"R_p   = {drt.predict_r_p():.4f}  (true 1.800)")
print(f"R_tot = {drt.predict_r_tot():.4f}  (true 2.200)")

peak_tau = drt.find_peaks()
print(f"peaks at tau = {np.round(peak_tau, 5)}  (true 1e-3, 1e-1)")

# One-call overview: DRT with credible band + impedance fit + residuals
axes = drt.plot_results()
savefig(axes.ravel()[0].get_figure(), "t01_fit_results.png")

# ----------------------------------------------------------------------
# 4. Kramers-Kronig: is the *measurement* self-consistent? kk_test fits a
#    KK-compliant model and flags frequencies whose residuals exceed the
#    noise envelope (instrument artifacts, drift, bad contact). kk_test
#    refits the model it is called on, so run it on a copy — copy() clones
#    configuration and fit state, leaving the original untouched.
# ----------------------------------------------------------------------
outlier_index, (f_min, f_max), (f_clean, z_clean) = drt.copy().kk_test(freq, z)
print(f"KK test: {len(outlier_index)} outlier frequencies flagged; "
      f"valid window {f_min:.3g}..{f_max:.3g} Hz "
      f"({len(f_clean)}/{len(freq)} points kept)")

# ----------------------------------------------------------------------
# 5. Model reuse: refit a variant on another copy without touching the
#    original fit.
# ----------------------------------------------------------------------
drt2 = drt.copy()
drt2.fit_eis(freq, z, nonneg=False)  # allow negative distribution lobes
print(f"unconstrained fit R_p = {drt2.predict_r_p():.4f} "
      f"(original preserved: {drt.predict_r_p():.4f})")
assert abs(drt.predict_r_p() - 1.8) < 0.1
print("Tutorial 1 complete.")
