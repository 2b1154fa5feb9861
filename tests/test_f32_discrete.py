"""float32 (TPU dtype) certification of the dual-inversion / discrete-model
ranking pipeline (VERDICT r3 next-step #9).

`tests/test_f32_accuracy.py` certifies the batched DRT fits; this module
certifies the pipeline the reference runs in `drt1d.py:2383-2557`
(dual_fit -> candidate generation -> discrete LM fits -> BIC/LML ranking)
when the device solver runs in float32, as it does on TPU (float64 on the
axon backend is unstable — CLAUDE.md).

What is and is not f32-exposed: the QPHB candidate fits and their
llh/weights run on device in f32; the discrete-model Levenberg-Marquardt
fits run host-side through scipy.least_squares in f64 ALWAYS (seeded from
f32-fit peak decompositions), and BIC/LML of discrete models are evaluated
from those f64 LM results. So the certification claim is: f32 candidate
fits perturb the seeds/weights slightly, but model SELECTION (best model,
Bayes-factor ordering) and the selected model's parameters are stable.

The f32 leg runs in a SUBPROCESS with x64 disabled from interpreter start —
the actual TPU configuration. (Flipping x64 mid-process instead creates a
mixed regime where f64 constants cached by earlier traces leak into f32
programs; that regime exists in no deployment and was observed to NaN
candidate likelihoods. The non-finite-llh robustness guard that finding
motivated is tested below with a direct injection.)
"""
import json
import subprocess
import sys

import numpy as np
import pytest

from hybdrt_tpu.models.drt import DRT


_F32_CHILD = r"""
import json
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)   # TPU dtype from process start

from hybdrt_tpu.models.drt import DRT

rng = np.random.default_rng(42)
freq = np.logspace(5, -1, 61)
def zarc(f, r, tau0, a):
    return r / (1 + (2j * np.pi * f * tau0) ** a)
z = 0.5 + zarc(freq, 1.0, 1e-3, 0.85) + zarc(freq, 2.0, 1e0, 0.9)
z = z + (rng.normal(size=61) + 1j * rng.normal(size=61)) * 0.005

drt = DRT(warn=False)
drt.dual_fit_eis(freq, z,
                 discrete_kw={"model_init_kw": {"element_types": "RQ"}})
best_bic = drt.get_best_candidate_id("discrete", "bic")
best_lml = drt.get_best_candidate_id("discrete", "lml")
ids = [int(i) for i in drt.discrete_candidate_df["model_id"].values]
bf = drt.evaluate_norm_bayes_factors("discrete", "bic")
params = {mid: {k: float(v) for k, v in
                drt.discrete_candidate_dict[mid]["model"]
                .get_parameter_dict().items()}
          for mid in ids}
bic = {mid: float(drt.discrete_candidate_dict[mid]["model"].evaluate_bic())
       for mid in ids}
print(json.dumps({
    "best_bic": int(best_bic), "best_lml": int(best_lml), "ids": ids,
    "bf": [float(b) for b in bf], "params": params, "bic": bic,
}))
"""


def _spectrum(seed=42, noise=0.005):
    rng = np.random.default_rng(seed)
    freq = np.logspace(5, -1, 61)

    def zarc(f, r, tau0, a):
        return r / (1 + (2j * np.pi * f * tau0) ** a)

    z = 0.5 + zarc(freq, 1.0, 1e-3, 0.85) + zarc(freq, 2.0, 1e0, 0.9)
    z = z + (rng.normal(size=61) + 1j * rng.normal(size=61)) * noise
    return freq, z


@pytest.fixture(scope="module")
def dual_pair():
    out = subprocess.run([sys.executable, "-c", _F32_CHILD],
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    r32 = json.loads(out.stdout.strip().splitlines()[-1])

    freq, z = _spectrum()
    drt64 = DRT(warn=False)
    drt64.dual_fit_eis(freq, z,
                       discrete_kw={"model_init_kw": {"element_types": "RQ"}})
    return r32, drt64


def test_f32_dual_selects_same_model(dual_pair):
    r32, drt64 = dual_pair
    assert r32["best_bic"] == int(drt64.get_best_candidate_id("discrete", "bic"))
    assert r32["best_lml"] == int(drt64.get_best_candidate_id("discrete", "lml"))
    assert r32["best_bic"] == 2  # the true (2-ZARC) model


def test_f32_bayes_factor_ordering(dual_pair):
    r32, drt64 = dual_pair
    ids64 = [int(i) for i in drt64.discrete_candidate_df["model_id"].values]
    assert set(r32["ids"]) == set(ids64)
    bf64 = drt64.evaluate_norm_bayes_factors("discrete", "bic")
    order32 = np.array(r32["ids"])[np.argsort(r32["bf"])[::-1]]
    order64 = np.array(ids64)[np.argsort(bf64)[::-1]]
    assert order32[0] == order64[0]


def test_f32_discrete_parameters_match(dual_pair):
    """The winning model's LM-refined parameters are f32-insensitive: the LM
    refinement runs host-side in f64 and re-converges from the (slightly
    perturbed) f32 seeds to the same optimum."""
    r32, drt64 = dual_pair
    best = int(drt64.get_best_candidate_id("discrete", "bic"))
    p32 = r32["params"][str(best)] if str(best) in r32["params"] \
        else r32["params"][best]
    p64 = drt64.discrete_candidate_dict[best]["model"].get_parameter_dict()
    assert set(p32) == set(p64)
    for k, v64 in p64.items():
        rel = abs(p32[k] - v64) / max(abs(v64), 1e-12)
        assert rel < 1e-2, (k, p32[k], v64, rel)


def test_f32_criterion_values_close(dual_pair):
    """BIC of the discrete candidates (f64 LM results on f32-seeded fits)
    agree to well under a model-selection-relevant margin (Delta BIC ~ 2 is
    the conventional 'weak evidence' floor)."""
    r32, drt64 = dual_pair
    for mid_s, bic32 in r32["bic"].items():
        mid = int(mid_s)
        bic64 = float(
            drt64.discrete_candidate_dict[mid]["model"].evaluate_bic())
        assert abs(bic32 - bic64) < 1.0, mid


def test_nonfinite_candidate_llh_dropped():
    """generate_candidates must drop (not crash on) candidates whose
    likelihood evaluation returns NaN — observed with diverged f32 candidate
    fits (the max/argmax ranking otherwise raises IndexError)."""
    freq, z = _spectrum(seed=7)
    drt = DRT(warn=False)
    drt.fit_eis(freq, z)

    import hybdrt_tpu.models.drt as drt_mod
    orig = drt_mod.DRT.evaluate_llh
    calls = {"n": 0}

    def poisoned(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] % 5 == 0:
            return float("nan")
        return orig(self, *a, **kw)

    drt_mod.DRT.evaluate_llh = poisoned
    try:
        with pytest.warns(UserWarning, match="non-finite likelihood"):
            drt.generate_candidates()
    finally:
        drt_mod.DRT.evaluate_llh = orig
    assert np.isfinite(drt.candidate_dict["llh"]).all()
    assert len(drt.candidate_dict["llh"]) > 0
