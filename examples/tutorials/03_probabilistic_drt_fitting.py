"""Tutorial 3 — Probabilistic DRT fitting.

Mirrors the reference's "Probabilistic DRT fitting"
(reference tutorials/Probabilistic_DRT_fitting.ipynb).

The QPHB fit is Bayesian: beyond a point estimate it gives credible
intervals, per-peak decompositions, and — via the PFRT (probability function
of relaxation times) — the probability that a peak at each timescale is
real rather than a regularization artifact.

Covers:
  1. Credible intervals on the distribution (``predict_drt_ci``)
  2. Peak finding, marking, and per-peak quantification
     (``find_peaks`` / ``mark_peaks`` / ``quantify_peaks``)
  3. Peak decomposition into separate distributions
     (``estimate_peak_drts`` / ``plot_peak_drts``)
  4. The PFRT: a regularization-strength sweep scored by marginal
     likelihood (``pfrt_fit_eis`` / ``predict_pfrt``)
"""
import numpy as np
import matplotlib.pyplot as plt

from tutorial_utils import QUICK, add_noise, savefig, use_cpu_f64, zarc

use_cpu_f64()

from hybdrt_tpu import DRT  # noqa: E402

# ----------------------------------------------------------------------
# Data: two relaxations, the smaller one close enough to be ambiguous at
# this noise level — exactly the case probabilistic output matters for.
# ----------------------------------------------------------------------
n_freq = 41 if QUICK else 71
freq = np.logspace(5, -1, n_freq)
z = add_noise(0.3 + zarc(freq, 1.0, 3e-3, 0.9) + zarc(freq, 0.4, 2e-1, 0.9),
              2e-3, seed=3)

drt = DRT()
drt.fit_eis(freq, z)

# ----------------------------------------------------------------------
# 1. Credible intervals: the posterior covariance of the coefficient
#    vector propagates to a pointwise band on gamma(tau).
# ----------------------------------------------------------------------
tau = drt.get_tau_eval(20)
gamma = drt.predict_distribution(tau)
lo, hi = drt.predict_drt_ci(tau=tau)
frac_in_band = np.mean((gamma >= lo) & (gamma <= hi))
print(f"CI band contains the point estimate at {100 * frac_in_band:.0f}% "
      f"of tau points")

ax = drt.plot_distribution(tau=tau, show_ci=True, mark_peaks=True)
savefig(ax.get_figure(), "t03_distribution_ci.png")

# ----------------------------------------------------------------------
# 2. Peaks: locations, and how much polarization resistance each peak
#    carries (the quantity an equivalent-circuit fit would report as R_i).
# ----------------------------------------------------------------------
peak_tau = drt.find_peaks()
r_peaks = drt.quantify_peaks()
for t, r in zip(peak_tau, r_peaks):
    print(f"peak at tau = {t:.3g} s: R = {r:.3f} ohm")
print("(true: 1.0 ohm at 3e-3 s, 0.4 ohm at 2e-1 s)")

# ----------------------------------------------------------------------
# 3. Peak decomposition: split the total DRT into per-peak distributions
#    using local weighting functions (useful for overlapping processes).
# ----------------------------------------------------------------------
peak_gammas = drt.estimate_peak_drts(tau=tau)
ax = drt.plot_peak_drts(tau=tau, peak_gammas=peak_gammas)
ax.plot(tau, gamma, "k--", lw=1, label="total")
ax.legend()
savefig(ax.get_figure(), "t03_peak_decomposition.png")

# ----------------------------------------------------------------------
# 4. PFRT: refit over a ladder of regularization strengths, weight each
#    solution by its marginal likelihood, and aggregate peak indicators:
#    pfrt(tau) ~ P(a peak at tau is supported by the data).
# ----------------------------------------------------------------------
factors = np.logspace(-0.7, 0.7, 5 if QUICK else 11)
pfrt_drt = DRT(warn=False)
pfrt_drt.pfrt_fit_eis(freq, z, factors=factors)
pf = pfrt_drt.predict_pfrt(tau=tau)  # evaluated on `tau`
tau_pf = tau

fig, ax = plt.subplots(figsize=(5, 3))
ax.semilogx(tau_pf, pf)
ax.set_xlabel(r"$\tau$ (s)")
ax.set_ylabel("peak probability")
savefig(fig, "t03_pfrt.png")

# Peak probabilities should be high at the true timescales
for t_true in (3e-3, 2e-1):
    k = np.argmin(np.abs(np.log(tau_pf) - np.log(t_true)))
    print(f"PFRT peak probability near tau={t_true:.0e}: {pf[k]:.2f}")

# ----------------------------------------------------------------------
# 5. Beyond the MAP: posterior sampling. generate_map_samples pins each
#    coefficient at +-{1,2,3} sigma and re-optimizes the rest (all as one
#    vmapped batch of QPs); the lp-weighted samples give posterior means
#    and quantiles for any derived quantity.
# ----------------------------------------------------------------------
x_mean = drt.estimate_posterior_mean()
pm = drt.extract_qphb_parameters(x_mean)
print(f"R_p: MAP {drt.predict_r_p():.3f}, posterior mean "
      f"{drt.predict_r_p(x=pm['x']):.3f}")
q_lo, q_med, q_hi = drt.get_parameter_quantile([0.025, 0.5, 0.975])
n_drt = len(drt.basis_tau)
width = np.mean((q_hi - q_lo)[-n_drt:])
print(f"mean 95% coefficient interval width: {width:.4f} (raw space)")
print("Tutorial 3 complete.")
