"""Warm-QP step-cap sweep on the bench workload (round 5, VERDICT #1a).

The roofline harness shows qp_warm (the warm-started Mehrotra solve inside
each outer QPHB iteration) is 94% of the staged fit's device time, and its
cost is ~9 lane-Cholesky factor-equivalents: one factor per Mehrotra step
(cap qp_max_iter_warm=8) plus the active-set polish. The factor kernel is
already near its VMEM speed of light (experiments/vmem_sol.py), so the only
remaining lever is the NUMBER of factors: does a lower warm cap hold
accuracy and outer-iteration count while cutting device time?

For each cap, fit the bench batch (staged schedule, default buckets) and
record device dispatch time, e2e, median |z_hat - z|, converged count, and
mean outer iterations. A cap that increases outer iterations (the QP
under-solves, so the hyperparameter loop needs more outer passes) pays back
the saved steps; the sweep makes that tradeoff visible.

Run on the real chip: python experiments/qp_knob_sweep.py [caps...]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _timeit(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main():
    caps = [int(c) for c in sys.argv[1:]] or [8, 6, 4, 3]
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from bench import make_batch, N_FREQ, MAX_ITER
    from hybdrt_tpu.parallel import BatchedEISFitter

    print(f"devices: {jax.devices()}", flush=True)
    b = 1024  # roofline.py's shape, for comparability of per-iter numbers
    freq, z = make_batch(b, N_FREQ)

    tiny = jax.jit(lambda a: a + 1.0)
    s0 = jnp.zeros((), jnp.float32)
    np.asarray(tiny(s0))
    rtt = min(_timeit(lambda: np.asarray(tiny(s0))) for _ in range(10))
    print(f"rtt floor {rtt * 1e3:.1f} ms", flush=True)

    rows = []
    for cap in caps:
        fitter = BatchedEISFitter(freq, dtype=jnp.float32, max_iter=MAX_ITER,
                                  qp_max_iter=20, qp_max_iter_warm=cap,
                                  pred_stop=True, pred_rtol=3e-2)
        t0 = time.time()
        res = fitter.fit(z, adaptive="staged")
        warm = time.time() - t0
        e2e = [_timeit(lambda: fitter.fit(z, adaptive="staged"))
               for _ in range(8)]
        rzv, _ = fitter.scale_batch(z)
        disp = []
        for _ in range(8):
            t0 = time.time()
            states = fitter._fit_staged(rzv, phase_budgets=(8, 14, 22))
            np.asarray(states.converged[:1])
            disp.append(time.time() - t0)
        z_hat = fitter.predict_z(res)
        row = {
            "qp_max_iter_warm": cap,
            "warmup_s": round(warm, 1),
            "e2e_spectra_per_sec": round(b / min(e2e), 1),
            "device_spectra_per_sec": round(b / max(min(disp) - rtt, 1e-9), 1),
            "outer_iters_mean": round(float(np.mean(np.asarray(res.n_iter))), 2),
            "median_resid": round(float(np.median(np.abs(z_hat - z))), 6),
            "converged": int(np.sum(np.asarray(res.converged))),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\nsummary:", flush=True)
    for r in rows:
        print(f"  warm_cap={r['qp_max_iter_warm']}: device "
              f"{r['device_spectra_per_sec']:8.1f}/s  e2e "
              f"{r['e2e_spectra_per_sec']:7.1f}/s  outer_iters "
              f"{r['outer_iters_mean']:5.2f}  resid {r['median_resid']:.6f}  "
              f"converged {r['converged']}", flush=True)


if __name__ == "__main__":
    main()
