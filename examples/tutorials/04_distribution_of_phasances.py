"""Tutorial 4 — Fitting with a distribution of phasances (DOP).

Mirrors the reference's "Fitting with distribution of phasances"
(reference tutorials/Fitting_with_distribution_of_phasances.ipynb).

A plain DRT can only represent RC-like relaxations. Real spectra often
contain *phasance* contributions — constant-phase elements Z = c (j w)^nu —
from rough electrodes, diffusion (nu = -0.5 gives a Warburg branch), or
cabling inductance (nu = +1). The DOP extends the model with a distribution
over the phase exponent nu in [-1, 1], fitted jointly with the DRT.

Covers:
  1. Why the plain DRT struggles on a spectrum with a Warburg-like branch
  2. Enabling the DOP (``DRT(fit_dop=True)``)
  3. Reading the recovered phasance distribution (``predict_dop`` /
     ``plot_dop``) and the cleaned-up DRT
"""
import numpy as np
import matplotlib.pyplot as plt

from tutorial_utils import QUICK, add_noise, savefig, use_cpu_f64, zarc

use_cpu_f64()

from hybdrt_tpu import DRT  # noqa: E402

# ----------------------------------------------------------------------
# Data: one true relaxation + a Warburg-like diffusion branch (nu = -0.5).
# ----------------------------------------------------------------------
n_freq = 41 if QUICK else 61
freq = np.logspace(5, -2, n_freq)
w = 2j * np.pi * freq
z_true = 0.3 + zarc(freq, 0.8, 1e-3, 0.9) + 0.05 * (w ** -0.5)
z = add_noise(z_true, 1e-3, seed=4)

# ----------------------------------------------------------------------
# 1. Plain DRT: forced to mimic the diffusion branch with a smear of
#    spurious low-frequency relaxations.
# ----------------------------------------------------------------------
plain = DRT(warn=False)
plain.fit_eis(freq, z)
print(f"plain DRT:  R_p = {plain.predict_r_p():.3f} "
      f"(inflated by the diffusion branch; true relaxation R = 0.800)")

# ----------------------------------------------------------------------
# 2. DRT + DOP: the phasance basis absorbs the nu = -0.5 branch, leaving
#    a clean relaxation peak.
# ----------------------------------------------------------------------
dop = DRT(warn=False, fit_dop=True)
dop.fit_eis(freq, z)
print(f"DRT + DOP:  R_p = {dop.predict_r_p():.3f} (true 0.800)")

tau = dop.get_tau_eval(20)
fig, axes = plt.subplots(1, 2, figsize=(9, 3))
axes[0].semilogx(tau, plain.predict_distribution(tau), label="plain DRT")
axes[0].semilogx(tau, dop.predict_distribution(tau), label="DRT + DOP")
axes[0].set_xlabel(r"$\tau$ (s)")
axes[0].set_ylabel(r"$\gamma$ ($\Omega$)")
axes[0].legend()

# ----------------------------------------------------------------------
# 3. The recovered DOP: mass concentrated near nu = -0.5.
# ----------------------------------------------------------------------
nu = np.linspace(-1, 1, 201)
rho = dop.predict_dop(nu=nu, normalize=True)
axes[1].plot(nu, rho)
axes[1].axvline(-0.5, color="k", ls=":", lw=1)
axes[1].set_xlabel(r"$\nu$")
axes[1].set_ylabel(r"DOP ($\Omega$)")
savefig(fig, "t04_dop.png")

# The dedicated plot method gives the same view
ax = dop.plot_dop(normalize=True)
savefig(ax.get_figure(), "t04_plot_dop.png")

nu_peak = nu[np.argmax(np.abs(rho))]
print(f"DOP mass peaks at nu = {nu_peak:.2f} (true -0.50)")
assert abs(dop.predict_r_p() - 0.8) < 0.15
print("Tutorial 4 complete.")
