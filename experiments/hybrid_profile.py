"""Hybrid heterogeneous-path profile (round 4, VERDICT next-step #6).

Question: the round-3 README measured ~3600 EIS obs/s vs ~850 hybrid obs/s
on the ragged fitter. Hybrid QP systems are ~2.3x larger (chrono rows +
EIS rows), which accounts for ~1550/s — where does the remaining ~1.8x go?
Suspects: the per-obs `_hybrid_rescale` host path (decimation, joint rp
scaling, baseline offset — parallel/ragged.py:256) and the hybrid QP shapes.

Method: N hybrid obs on 2 shared chrono protocols and N EIS obs on 2 shared
frequency grids, both through BatchedRaggedFitter with the bench knobs.
Timed phases per workload:
  prep     prepare() — host loop incl. the per-obs rescale fast path
  fit      fit() minus prepare() (transfer + staged dispatch + collect)
  e2e      full fit()
Run on the real chip: python experiments/hybrid_profile.py [n_obs]
"""
import sys
import time
import json

import numpy as np

sys.path.insert(0, ".")


def _zarc(f, r, tau0, a):
    return r / (1 + (2j * np.pi * f * tau0) ** a)


def _rc_v(t, ts, amp, r, tau0):
    dt = t - ts
    return amp * r * np.where(dt > 0, 1 - np.exp(-np.maximum(dt, 0) / tau0), 0.0)


def make_obs(n, kind, rng):
    grids = [np.logspace(5, 1, 33), np.logspace(4, 0, 41)]
    protos = [
        (np.concatenate([np.linspace(-0.05, -0.001, 10),
                         np.geomspace(1e-4, 1.0, 80)]), 0.0, 0.1),
        (np.concatenate([np.linspace(-0.02, -0.001, 6),
                         np.geomspace(2e-4, 0.5, 60)]), 0.0, -0.08),
    ]
    obs = []
    for i in range(n):
        r1 = 0.8 + 0.4 * (i / n) + rng.uniform(-0.05, 0.05)
        t1 = 10 ** (-2.5 + (i / n))
        r2, t2 = 1.2, 1e-4
        f = grids[i % 2]
        z = 0.4 + _zarc(f, r1, t1, 0.99) + _zarc(f, r2, t2, 0.99)
        z = z + (rng.normal(size=len(f)) + 1j * rng.normal(size=len(f))) * 0.003
        if kind == "eis":
            obs.append((None, (f, z)))
        else:
            times, st, amp = protos[i % 2]
            i_sig = np.where(times >= st, amp, 0.0)
            v = (0.4 * i_sig + _rc_v(times, st, amp, r1, t1)
                 + _rc_v(times, st, amp, r2, t2))
            v = v + 5e-4 * rng.normal(size=len(times))
            obs.append(((times, i_sig, v), (f, z)))
    return obs


def profile(kind, n, jnp):
    from hybdrt_tpu.parallel.ragged import BatchedRaggedFitter
    rng = np.random.default_rng(1)
    obs = make_obs(n, kind, rng)
    tau_sg = np.logspace(-8, 3, 111)
    fitter = BatchedRaggedFitter(tau_sg, dtype=jnp.float32)

    # warmup (pays prep-template build + server program load)
    t0 = time.time()
    fitter.fit(obs, adaptive="staged")
    warm = time.time() - t0

    reps = []
    for _ in range(5):
        t0 = time.time()
        batch = fitter.prepare(obs)
        t_prep = time.time() - t0
        t0 = time.time()
        fitter.fit(obs, adaptive="staged")
        t_fit = time.time() - t0
        reps.append((t_prep, t_fit))
    t_prep = min(r[0] for r in reps)
    t_e2e = min(r[1] for r in reps)
    row = {
        "kind": kind, "n": n, "warmup_s": round(warm, 1),
        "prep_s": round(t_prep, 3), "e2e_s": round(t_e2e, 3),
        "fit_minus_prep_s": round(t_e2e - t_prep, 3),
        "obs_per_sec": round(n / t_e2e, 1),
        "prep_frac": round(t_prep / t_e2e, 3),
        "rows": int(batch["rzv"].shape[1]),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    print(f"devices: {jax.devices()}", flush=True)
    rows = [profile("eis", n, jnp), profile("hybrid", n, jnp)]
    e, h = rows
    print(f"\nsummary: EIS {e['obs_per_sec']}/s (prep {e['prep_frac']:.0%}) "
          f"vs hybrid {h['obs_per_sec']}/s (prep {h['prep_frac']:.0%}); "
          f"row factor {h['rows']}/{e['rows']} = {h['rows']/e['rows']:.2f}x; "
          f"throughput factor {e['obs_per_sec']/h['obs_per_sec']:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
