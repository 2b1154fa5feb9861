"""Tutorial 5 — Fitting joint domain (hybrid chrono + EIS) data.

Mirrors the reference's "Fitting joint domain data"
(reference tutorials/Fitting_joint_domain_data.ipynb).

EIS resolves fast processes well but takes minutes per decade at low
frequency; a current-step (chronopotentiometry) transient covers the slow
end in seconds. ``DRT.fit_hybrid`` inverts both measurements jointly
against one distribution, with self-tuned relative weighting between the
domains.

Covers:
  1. Simulating a step-response transient and a truncated EIS spectrum
  2. The joint fit (``fit_hybrid``) vs the EIS-only fit
  3. Chrono-domain diagnostics (``plot_chrono_fit``)
  4. Predicting in both domains from one model (``predict_z`` /
     ``predict_response``)
"""
import numpy as np
import matplotlib.pyplot as plt

from tutorial_utils import QUICK, savefig, use_cpu_f64, zarc

use_cpu_f64()

from hybdrt_tpu import DRT  # noqa: E402

rng = np.random.default_rng(5)

# ----------------------------------------------------------------------
# 1. The system: fast process at 1e-4 s, slow process at 1 s. The EIS
#    sweep is truncated at 1 Hz (as if low-frequency points were too slow
#    to measure), so EIS alone cannot see the slow process.
# ----------------------------------------------------------------------
r_inf, r_fast, tau_fast, r_slow, tau_slow = 0.3, 0.6, 1e-4, 0.9, 1.0
n_freq = 31 if QUICK else 51
freq = np.logspace(5, 0, n_freq)
z = (r_inf + zarc(freq, r_fast, tau_fast, 0.95) + zarc(freq, r_slow, tau_slow, 0.95))
z = z + rng.normal(0, 1e-3, n_freq) + 1j * rng.normal(0, 1e-3, n_freq)

# Current step at t=0, sampled log-uniformly out to 10 s: covers the slow
# relaxation the EIS sweep misses.
n_t = 60 if QUICK else 120
times = np.concatenate([np.linspace(-5e-3, -5e-4, 8),
                        np.logspace(-5, 1, n_t)])
i_step = 0.1
i_sig = np.where(times >= 0, i_step, 0.0)
# Exponential-relaxation response of the two (near-ideal) processes
v_sig = r_inf * i_sig
for r_k, tau_k in ((r_fast, tau_fast), (r_slow, tau_slow)):
    v_sig = v_sig + i_step * r_k * (1 - np.exp(-np.maximum(times, 0) / tau_k)) \
        * (times >= 0)
v_sig = v_sig + rng.normal(0, 2e-4, len(times))

# ----------------------------------------------------------------------
# 2. EIS-only vs hybrid.
# ----------------------------------------------------------------------
eis_only = DRT(warn=False)
eis_only.fit_eis(freq, z)
hybrid = DRT(warn=False)
hybrid.fit_hybrid(times, i_sig, v_sig, freq, z)

true_rp = r_fast + r_slow
print(f"EIS-only R_p = {eis_only.predict_r_p():.3f}  "
      f"(true {true_rp:.3f}; misses the slow process)")
print(f"hybrid   R_p = {hybrid.predict_r_p():.3f}  (true {true_rp:.3f})")
print(f"hybrid   R_inf = {hybrid.fit_parameters['R_inf']:.3f} (true {r_inf})")

tau = np.logspace(-6, 2, 200)
fig, ax = plt.subplots(figsize=(5.5, 3.2))
ax.semilogx(tau, eis_only.predict_distribution(tau), label="EIS only (f >= 1 Hz)")
ax.semilogx(tau, hybrid.predict_distribution(tau), label="hybrid chrono+EIS")
for t_k in (tau_fast, tau_slow):
    ax.axvline(t_k, color="k", ls=":", lw=1)
ax.set_xlabel(r"$\tau$ (s)")
ax.set_ylabel(r"$\gamma$ ($\Omega$)")
ax.legend()
savefig(fig, "t05_hybrid_vs_eis.png")

# ----------------------------------------------------------------------
# 3. Chrono-domain diagnostics: measured vs fitted transient.
# ----------------------------------------------------------------------
ax = hybrid.plot_chrono_fit(transform_time=True)
savefig(ax.get_figure(), "t05_chrono_fit.png")

# ----------------------------------------------------------------------
# 4. One model, both domains: extrapolate the EIS prediction below the
#    measured window — the chrono data pins it.
# ----------------------------------------------------------------------
freq_ext = np.logspace(5, -2, 71)
z_ext = hybrid.predict_z(freq_ext)
z_true_ext = (r_inf + zarc(freq_ext, r_fast, tau_fast, 0.95)
              + zarc(freq_ext, r_slow, tau_slow, 0.95))
lf = freq_ext < 1.0
lf_err = np.max(np.abs(z_ext[lf] - z_true_ext[lf]))
print(f"max |error| of EIS prediction extrapolated to 0.01 Hz: {lf_err:.4f}")

v_hat = hybrid.predict_response()
print(f"chrono fit residual rms: {np.std(v_hat - v_sig):.2e} "
      f"(noise level 2e-4)")
assert abs(hybrid.predict_r_p() - true_rp) < 0.1
print("Tutorial 5 complete.")
