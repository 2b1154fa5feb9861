"""hybdrt_tpu quickstart: the main analysis flows on synthetic data.

Run with: python examples/quickstart.py
(Pinned to the CPU backend in float64 — the accuracy configuration; see
examples/tutorials/06_tpu_batch_mapping.py for the TPU performance path.)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU-only script: restrict backend discovery before the first
# jax.devices() call so it doesn't also initialize an accelerator backend
# (the experimental TPU tunnel hangs init for tens of minutes when
# degraded; JAX_PLATFORMS env is ignored when jax is pre-imported)
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

import numpy as np

from hybdrt_tpu import DRT, DRTMD
from hybdrt_tpu.parallel.batch import BatchedEISFitter


def simulate_eis(seed=0, noise=1e-3):
    rng = np.random.default_rng(seed)
    freq = np.logspace(5, -1, 51)
    w = 2j * np.pi * freq
    z = (0.4 + 1.0 / (1 + (w * 1e-3) ** 0.9)
         + 0.8 / (1 + (w * 1e-1) ** 0.85))
    return freq, z + rng.normal(0, noise, len(freq)) * (1 + 1j)


def main():
    freq, z = simulate_eis()

    # ---- 1. Self-tuning Bayesian DRT fit --------------------------------
    drt = DRT()
    drt.fit_eis(freq, z)
    print(f"R_inf = {drt.fit_parameters['R_inf']:.4f}  (true 0.4)")
    print(f"R_p   = {drt.predict_r_p():.4f}  (true 1.8)")

    tau = drt.get_tau_eval(20)
    gamma = drt.predict_distribution(tau)
    lo, hi = drt.predict_drt_ci(tau=tau)
    peaks = drt.find_peaks()
    print(f"peaks at tau = {np.round(peaks, 5)}  (true 1e-3, 1e-1)")
    print(f"95% CI width at mode: {float((hi - lo)[np.argmax(gamma)]):.4f}")

    # Per-peak polarization resistances
    print("peak R_p:", np.round(drt.quantify_peaks(), 3), "(true 1.0, 0.8)")

    # ---- 2. Kramers-Kronig consistency test -----------------------------
    kk = DRT(warn=False)
    outlier_index, (f_min, f_max), _ = kk.kk_test(freq, z)
    print(f"KK outlier points: {len(outlier_index)} / {len(freq)}; "
          f"valid window {f_min:.3g}-{f_max:.3g} Hz")

    # ---- 3. Dual inversion: discrete model selection ---------------------
    dual = DRT(warn=False)
    dual.dual_fit_eis(freq, z)
    best = dual.get_best_candidate_id("discrete")
    print(f"best discrete model: {best} peaks "
          f"(df:\n{dual.get_candidate_df('discrete')[['num_peaks', 'bic']]})")

    # ---- 4. Batched mapping workload (the TPU scale-out path) ------------
    z_batch = np.stack([simulate_eis(seed=i)[1] for i in range(16)])
    fitter = BatchedEISFitter(freq)
    result = fitter.fit(z_batch)
    print(f"batched fit: {len(z_batch)} spectra, "
          f"Rp median = {np.median(fitter.predict_r_p(result)):.3f}")

    # ---- 5. Mapping container with resolve -------------------------------
    md = DRTMD(tau_supergrid=np.logspace(-7, 2, 91), psi_dim_names=["T"],
               print_progress=False, warn=False)
    for i in range(4):
        md.add_observation([700 + 10 * i], None, simulate_eis(seed=i),
                           group_id="demo")
    md.fit_all(batched=True)
    md.resolve_group("demo")
    print(f"mapping: fitted {md.num_obs} observations, "
          f"resolved Rp = {np.round(md.predict_r_p(obs_index=np.arange(4)), 3)}")


if __name__ == "__main__":
    main()
