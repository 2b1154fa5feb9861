"""Benchmark: batched self-tuning Bayesian DRT inversion throughput on TPU.

Prints ONE JSON line:
  {"metric": "drt_inversions_per_sec", "value": N, "unit": "spectra/s",
   "vs_baseline": R, ...diagnostic fields...}

Baseline (BASELINE.json north star): 1000-spectrum map fit in < 10 s on a
v5e-8 slice = 12.5 spectra/s per chip. vs_baseline = value / 12.5 measured on
one chip (the batch axis is embarrassingly parallel over chips, see
hybdrt_tpu.parallel.sharding).

Each "inversion" is a full self-tuning hierarchical-Bayesian fit: overfit-QP
weight initialization + up to MAX_ITER outer iterations, each with an
interior-point QP solve and closed-form hyperparameter updates (the
reference's cvxopt-based per-observation fit, hybdrt/models/qphb.py).

Diagnostic fields (round 4 — make the artifact defend the headline):
  device_spectra_per_sec  staged jitted dispatch alone (scalar readback,
                          minus the measured RTT floor) — device compute
  rtt_ms                  minimal dispatch+readback round trip
  chip_health             chained-matmul probe: healthy_s / measured_s
                          (1.0 = healthy session, <0.5 = degraded tunnel;
                          the run retries until healthy or flags it)
  compile_warmup_s        first fit() wall — NOTE this measures the axon
                          tunnel's per-process SERVER-side program load
                          (44-77 s healthy, 125-420 s degraded), not client
                          XLA compile: the persistent cache hits in ~0 s
                          (experiments/README.md round-4 split_probe note)
  het_map                 driver-captured heterogeneous-map leg: mixed-grid
                          EIS + hybrid observations through
                          DRTMD.fit_all(batched=True) + group resolve
                          (BASELINE config 5's real workload,
                          reference hybdrt/mapping/drtmd.py:303-319)
"""
import json
import sys
import time

import numpy as np


BATCH = 8192  # round 5: with difficulty-ordered lane bucketing the r4
              # straggler tax is gone — device throughput is flat from
              # B=1024 to 8192 and e2e PEAKS at B>=4096 because the fixed
              # per-dispatch cost amortizes (experiments/batch_scaling.py
              # r5 table; r4 had adopted 1024 when larger batches lost)
N_FREQ = 71
MAX_ITER = 50
BASELINE_SPECTRA_PER_SEC_PER_CHIP = 12.5

# Chained-matmul probe: 16 dependent 1024^2 f32 matmuls, forced readback.
# Healthy sessions measure ~0.023 s wall (dominated by RTT + readback);
# degraded-tunnel windows measure 10-100x that. Pinned from a session whose
# staged throughput measured 5156 spectra/s e2e (healthy range).
HEALTHY_PROBE_S = 0.025
HET_EIS = 768          # heterogeneous leg: mixed-grid EIS observations
HET_HYBRID = 256       # + hybrid (chrono+EIS) observations
# (768 + 256 = 1024 obs: BASELINE config 5's "1000+-spectrum
# multi-dimensional map, fit < 10 s" measured literally, not pro-rated)


def make_batch(batch, n_freq, seed=1):
    rng = np.random.default_rng(seed)
    freq = np.logspace(6, -1, n_freq)
    z = np.zeros((batch, n_freq), dtype=complex)
    # Mix of 2-ZARC systems with varying parameters (mapping-style workload)
    for i in range(batch):
        r1, r2 = rng.uniform(0.3, 1.5, 2)
        t1 = 10 ** rng.uniform(-5, -2)
        t2 = 10 ** rng.uniform(-2, 0.5)
        a1, a2 = rng.uniform(0.8, 0.95, 2)
        z[i] = (0.5 + r1 / (1 + (2j * np.pi * freq * t1) ** a1)
                + r2 / (1 + (2j * np.pi * freq * t2) ** a2)
                + 2j * np.pi * freq * 1e-7)
    noise = rng.normal(size=(batch, n_freq)) + 1j * rng.normal(size=(batch, n_freq))
    return freq, z + noise * 0.004


def wait_for_tpu(max_wait_s=None, probe_timeout_s=420):
    """Wait for a healthy tunnel window before initializing jax in-process.

    The tunneled chip's degraded windows don't just slow execution ~100x —
    they hang backend INIT (the first jax.devices() call) for ~30 minutes
    and then raise "Unable to initialize backend 'axon': UNAVAILABLE"
    (observed during a multi-hour outage), and a hung in-process init
    cannot be interrupted. Probe init in a subprocess with a timeout and
    retry until it completes quickly. Returns False if the tunnel never
    came back within max_wait_s (override: HYBDRT_TPU_BENCH_MAX_WAIT).

    probe_timeout_s must cover the axon SERVER-side per-process program
    load, not just init: loads of 44-77 s are normal in healthy windows
    and ~8 min loads have been observed in sessions whose COMPUTE was
    fast (r5: a 180 s probe timeout rejected a window that benched at
    15.8k device spectra/s minutes earlier) — load latency and compute
    health are decoupled, and the in-process health probes after init
    are what gate the timings."""
    import os
    import subprocess
    if max_wait_s is None:
        max_wait_s = float(os.environ.get("HYBDRT_TPU_BENCH_MAX_WAIT", 2700))
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 # init AND a real dispatch+readback: degraded windows have
                 # been observed where jax.devices() succeeds in seconds but
                 # the first computation hangs (r4, 20:42 session)
                 "import jax; jax.devices(); import jax.numpy as jnp; "
                 "print(int(jnp.ones(8).sum()))"],
                capture_output=True, text=True, timeout=probe_timeout_s)
            if out.returncode == 0 and out.stdout.strip() == "8":
                print(f"TPU backend probe ok ({time.time() - t0:.0f}s)",
                      file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print("TPU backend probe never succeeded within budget",
                  file=sys.stderr)
            return False
        print(f"TPU backend probe {attempt} hung/failed; retrying in 120s",
              file=sys.stderr)
        time.sleep(120)


def measure_rtt(jax, jnp):
    """Minimal dispatch+readback round trip (tunnel latency floor)."""
    tiny = jax.jit(lambda a: a + 1.0)
    s = jnp.zeros((), dtype=jnp.float32)
    np.asarray(tiny(s))  # compile
    return min(_timeit(lambda: np.asarray(tiny(s))) for _ in range(10))


def chip_health(jax, jnp):
    """Chained-matmul probe ratio: 1.0 = healthy, <0.5 = degraded tunnel."""
    a = jnp.ones((1024, 1024), jnp.float32) * 1e-3

    @jax.jit
    def chain(a):
        # 1/1024 rescale keeps entries ~1e-3 (c' = c^2 + c) so all 16
        # matmuls stay finite in f32 — without it entries hit inf by
        # iteration 8 and the probe times inf@inf instead of real values.
        for _ in range(16):
            a = (a @ a) * (1.0 / 1024.0) + a
        return a[0, 0]

    np.asarray(chain(a))  # compile / server load
    probe_s = min(_timeit(lambda: np.asarray(chain(a))) for _ in range(3))
    return HEALTHY_PROBE_S / probe_s, probe_s


def _timeit(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def make_het_map(n_eis, n_hybrid, seed=3, schedule="staged"):
    """Heterogeneous map: EIS observations on 3 different frequency grids +
    hybrid (chrono+EIS) observations on 2 chrono protocols, parameters
    varying smoothly over psi — the reference's real mapping workload
    (hybdrt/mapping/drtmd.py:303-319, fitted serially there)."""
    from hybdrt_tpu.mapping.drtmd import DRTMD

    rng = np.random.default_rng(seed)
    grids = [np.logspace(6, -1, 57), np.logspace(5, -1, 71),
             np.logspace(6, 0, 49)]
    chrono_protos = [
        (np.concatenate([np.linspace(-0.05, -0.001, 10),
                         np.geomspace(1e-4, 1.0, 80)]), 0.0, 0.1,
         np.logspace(5, 1, 33)),
        (np.concatenate([np.linspace(-0.02, -0.001, 6),
                         np.geomspace(2e-4, 0.5, 60)]), 0.0, -0.08,
         np.logspace(4, 0, 41)),
    ]
    tau_super = np.logspace(-8, 3, 111)
    # warm-QP cap 4 carries over from the uniform-leg sweep (the ragged
    # fitter shares the solver core): A/B on this leg measured 1334 vs
    # 1277 obs/s with 1024/1024 fitted both ways (+4.5% — the het leg is
    # prep/dispatch-bound, not QP-bound like the uniform leg)
    qp_kw = {"qp_max_iter": 20, "qp_max_iter_warm": 4}
    md = DRTMD(tau_supergrid=tau_super, psi_dim_names=["i"],
               warn=False, print_progress=False,
               batch_fit_kw={"adaptive": "staged", **qp_kw}
               if schedule == "staged" else dict(qp_kw))
    n_tot = n_eis + n_hybrid
    kinds = np.array(["eis"] * n_eis + ["hyb"] * n_hybrid)
    rng.shuffle(kinds)

    def _rc_v(t, ts, amp, r, tau0):
        dt = t - ts
        return amp * r * np.where(dt > 0,
                                  1 - np.exp(-np.maximum(dt, 0) / tau0), 0.0)

    for i, kind in enumerate(kinds):
        p = i / max(n_tot - 1, 1)
        r1 = 0.8 + 0.5 * p + rng.uniform(-0.05, 0.05)
        t1 = 10 ** (-2.8 + 1.2 * p)
        r2, t2 = 1.2, 1e-4
        r_inf = 0.4 + 0.1 * p
        if kind == "eis":
            freq = grids[i % 3]
            z = (r_inf + r1 / (1 + (2j * np.pi * freq * t1) ** 0.88)
                 + r2 / (1 + (2j * np.pi * freq * t2) ** 0.9))
            z = z + (rng.normal(size=len(freq))
                     + 1j * rng.normal(size=len(freq))) * 0.003
            md.add_observation([float(i)], None, (freq, z), group_id="g")
        else:
            times, st, amp, freq = chrono_protos[i % 2]
            i_sig = np.where(times >= st, amp, 0.0)
            v = (r_inf * i_sig + _rc_v(times, st, amp, r1, t1)
                 + _rc_v(times, st, amp, r2, t2))
            v = v + 5e-4 * rng.normal(size=len(times))
            z = (r_inf + r1 / (1 + (2j * np.pi * freq * t1) ** 0.99)
                 + r2 / (1 + (2j * np.pi * freq * t2) ** 0.99))
            z = z + (rng.normal(size=len(freq))
                     + 1j * rng.normal(size=len(freq))) * 0.003
            md.add_observation([float(i)], (times, i_sig, v), (freq, z),
                               group_id="g")
    return md


def run_het_leg(mesh, n_eis=HET_EIS, n_hybrid=HET_HYBRID):
    """Heterogeneous-map throughput, end-to-end from stored observations to
    collected per-obs results (fit_all handles partitioning/prep/transfer),
    plus device-parallel group resolve."""
    import jax.numpy as jnp

    # float32 explicitly: float64 on the tunneled chip kernel-faults the
    # TPU worker (CLAUDE.md); every on-device leg must pin f32.
    # Staged compaction first; the axon remote-compile helper has been
    # observed to OOM (SIGKILL) on the large staged ragged program, so fall
    # back to the plain whole-batch schedule rather than losing the leg.
    schedule = "staged"
    try:
        md = make_het_map(n_eis, n_hybrid, schedule=schedule)
        n_tot = md.num_obs
        t0 = time.time()
        md.fit_all(batched=True, dtype=jnp.float32)
        warm_s = time.time() - t0
    except Exception as exc:
        print(f"het staged warmup failed ({type(exc).__name__}); "
              f"retrying with the plain schedule", file=sys.stderr)
        schedule = "plain"
        md = make_het_map(n_eis, n_hybrid, schedule=schedule)
        n_tot = md.num_obs
        t0 = time.time()
        md.fit_all(batched=True, dtype=jnp.float32)
        warm_s = time.time() - t0
    if not md.obs_fit_status.all():
        print(f"het warmup: only {md.obs_fit_status.sum()}/{n_tot} fitted",
              file=sys.stderr)

    times = [_timeit(lambda: md.fit_all(refit=True, batched=True,
                                        dtype=jnp.float32))
             for _ in range(3)]
    best = min(times)
    fitted = int(md.obs_fit_status.sum())
    print(f"het map: {n_tot} obs ({n_eis} EIS mixed-grid + {n_hybrid} "
          f"hybrid), warmup {warm_s:.1f}s ({schedule}), reps "
          f"{[f'{t:.2f}' for t in times]} -> {n_tot / best:.0f} obs/s",
          file=sys.stderr)

    # Windowed resolve (the reference-parity overlapping-window path), now
    # matrix-free (vmapped coupled IP-PCG per window, ~105 KB MLIR at these
    # shapes vs the 2.5 MB dense kron program that used to OOM-kill the axon
    # compile helper; tests/test_resolve_program_size.py). Must run on-chip
    # WITHOUT the per-window fallback warning.
    import warnings as _warnings
    win_s = win_warm_s = None
    windowed_fallback = None
    try:
        with _warnings.catch_warnings(record=True) as wrec:
            _warnings.simplefilter("always")
            t0 = time.time()
            md.resolve_group("g", psi_sort_dims=["i"], batched=True,
                             mesh=mesh, dtype=jnp.float32)
            win_s = round(time.time() - t0, 2)
            t0 = time.time()
            md.resolve_group("g", psi_sort_dims=["i"], batched=True,
                             mesh=mesh, dtype=jnp.float32)
            win_warm_s = round(time.time() - t0, 2)
        windowed_fallback = any("falling back to per-window"
                                in str(w.message) for w in wrec)
        print(f"het windowed resolve of {n_tot} obs: {win_s}s cold, "
              f"{win_warm_s}s warm, fallback={windowed_fallback}",
              file=sys.stderr)
    except Exception as exc:
        print(f"het windowed resolve failed: {exc!r}"[:300], file=sys.stderr)

    # Whole-group COUPLED resolve (one matrix-free IP solve over all obs):
    # the exact group optimum the reference's overlapping windows only
    # approximate (mapping/resolve.solve_coupled_group)
    try:
        t0 = time.time()
        md.resolve_group("g", psi_sort_dims=["i"], coupled=True, mesh=mesh,
                         dtype=jnp.float32)
        resolve_s = round(time.time() - t0, 2)
        # Second solve reuses the compiled program + per-protocol (P, q)
        # rebuild caches: the recurring cost a map user actually pays
        t0 = time.time()
        md.resolve_group("g", psi_sort_dims=["i"], coupled=True, mesh=mesh,
                         dtype=jnp.float32)
        resolve_warm_s = round(time.time() - t0, 2)
        print(f"het coupled resolve of {n_tot} obs: {resolve_s}s cold, "
              f"{resolve_warm_s}s warm", file=sys.stderr)
    except Exception as exc:
        print(f"het resolve failed: {exc!r}"[:300], file=sys.stderr)
        resolve_s = None
        resolve_warm_s = None

    # Post-fit map pipeline at full map scale (VERDICT r4: after a 400x fit
    # speedup, Amdahl says the postprocessing number is the honest number):
    # assemble_ndx -> filter_ndx -> flag_bad_obs -> coef_to_ridges ->
    # optimize_extrema, all host-side (reference ndx.py:71,261,
    # nddata.py:178, surface.py:150-330, extrema.py:175-221)
    try:
        postproc = run_postproc_pipeline(md)
        postproc["postproc_over_fit"] = round(postproc["total_s"] / best, 2)
        print(f"het postproc pipeline: {postproc}", file=sys.stderr)
    except Exception as exc:
        print(f"het postproc failed: {exc!r}"[:300], file=sys.stderr)
        postproc = {"error": repr(exc)[:200]}

    return {
        "obs_total": n_tot,
        "eis_obs": n_eis,
        "hybrid_obs": n_hybrid,
        "obs_per_sec": round(n_tot / best, 1),
        # BASELINE config 5: the full 1000+-obs map fit, wall-clock seconds
        # (target < 10 s on TPU)
        "map_fit_s": round(best, 3),
        "fitted": fitted,
        "warmup_s": round(warm_s, 1),
        "resolve_windowed_s": win_s,
        "resolve_windowed_warm_s": win_warm_s,
        "windowed_fallback": windowed_fallback,
        "resolve_coupled_s": resolve_s,
        "resolve_coupled_warm_s": resolve_warm_s,
        "postproc": postproc,
        "schedule": schedule,
    }


def run_postproc_pipeline(md):
    """Wall-clock split of the host-side post-fit map pipeline at map scale
    (everything downstream of the fits that the framework exists to feed)."""
    from hybdrt_tpu.mapping import ndx as ndx_mod
    from hybdrt_tpu.mapping import nddata as nddata_mod
    from hybdrt_tpu.mapping import surface as surface_mod
    from hybdrt_tpu.mapping import extrema as extrema_mod

    out = {}
    t0 = time.time()
    _, x_nd = ndx_mod.assemble_ndx(md.obs_x, md.obs_psi, md.psi_dim_names,
                                   md.tau_supergrid, sort_by=["i"])
    out["assemble_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    x_filt = ndx_mod.filter_ndx(x_nd, 0, sigma=(2, 1))
    out["filter_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    bad = nddata_mod.flag_bad_obs(x_nd, x_filt)
    out["flag_s"] = round(time.time() - t0, 3)
    out["bad_obs"] = int(np.sum(bad))
    t0 = time.time()
    ridge_mask, trough_mask, p_ridge, p_trough = surface_mod.coef_to_ridges(
        x_filt, md, num_group_dims=0)
    out["ridges_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    extrema_mod.optimize_extrema(ridge_mask, trough_mask, p_ridge, p_trough)
    out["extrema_s"] = round(time.time() - t0, 3)
    out["total_s"] = round(sum(out[k] for k in
                               ("assemble_s", "filter_s", "flag_s",
                                "ridges_s", "extrema_s")), 3)
    return out


def run_single_fit_leg(jax, jnp):
    """Warm single-spectrum fit latency: the B=1 case of the BASELINE
    'single-fit wall-time vs cvxopt CPU' row (reference per-obs timing hook
    at hybdrt/mapping/drtmd.py:319). The reference itself cannot run on this
    host (cvxopt is not installed), so the comparison is chip f32 vs this
    framework's own CPU f64 reference-parity path."""
    from hybdrt_tpu.parallel import BatchedEISFitter
    import hybdrt_tpu

    freq, z = make_batch(1, N_FREQ, seed=9)
    fitter = BatchedEISFitter(freq, dtype=jnp.float32, max_iter=MAX_ITER,
                              qp_max_iter=20, qp_max_iter_warm=4,
                              pred_stop=True, pred_rtol=3e-2)
    t0 = time.time()
    fitter.fit(z)
    tpu_cold = time.time() - t0
    tpu_warm = min(_timeit(lambda: fitter.fit(z)) for _ in range(10))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        drt = hybdrt_tpu.DRT()
        t0 = time.time()
        drt.fit_eis(freq, z[0])
        cpu_cold = time.time() - t0
        cpu_warm = min(_timeit(lambda: drt.fit_eis(freq, z[0]))
                       for _ in range(3))
    out = {
        "tpu_b1_warm_s": round(tpu_warm, 4),
        "tpu_b1_cold_s": round(tpu_cold, 1),
        "cpu_f64_warm_s": round(cpu_warm, 3),
        "cpu_f64_cold_s": round(cpu_cold, 1),
        "cvxopt_s": None,  # reference deps (cvxopt) not installed here
        "n_freq": N_FREQ,
    }
    print(f"single fit: {out}", file=sys.stderr)
    return out


def main():
    if not wait_for_tpu():
        # A doomed in-process init would block ~30 min and then raise an
        # opaque traceback; fail fast and clearly instead (no JSON line —
        # an honest missing measurement beats recording a degraded one)
        print("chip unreachable: skipping benchmark rather than recording "
              "a degraded-tunnel measurement", file=sys.stderr)
        sys.exit(2)
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)

    from hybdrt_tpu.parallel import BatchedEISFitter
    from hybdrt_tpu.parallel.sharding import make_mesh

    devices = jax.devices()
    n_dev = len(devices)
    mesh = make_mesh(devices) if n_dev > 1 else None
    print(f"devices: {devices}", file=sys.stderr)

    # Persistent compilation cache: the hybdrt_tpu import above already
    # enabled it at a machine-fingerprinted location (utils/device.py), so
    # repeat runs on the same host skip the cold CLIENT compile. The first
    # dispatch still pays the axon tunnel's per-process SERVER-side program
    # load (44-77 s healthy; see experiments/README.md round-4 notes).

    rtt_s = measure_rtt(jax, jnp)
    health, probe_s = chip_health(jax, jnp)
    print(f"rtt floor {rtt_s * 1e3:.1f} ms; chained-matmul probe "
          f"{probe_s:.3f}s -> health {health:.2f}", file=sys.stderr)
    for attempt in range(3):
        if health >= 0.5:
            break
        print(f"chip degraded (health {health:.2f} < 0.5); waiting 180s "
              f"({attempt + 1}/3)", file=sys.stderr)
        time.sleep(180)
        health, probe_s = chip_health(jax, jnp)

    freq, z = make_batch(BATCH, N_FREQ)
    # qp_max_iter_warm caps warm-started interior-point steps: under vmap the
    # QP loop runs to the max over the batch, and at B=1024 a handful of hard
    # tail spectra otherwise cost ~45 Cholesky trips per outer iteration.
    # warm cap 4 is the sweep optimum (experiments/qp_knob_sweep.py: caps
    # 8/6/4/3 -> 12936/14282/15813/12865 device spectra/s in one session,
    # outer iterations 7.37 -> 7.46, median resid and converged count
    # unchanged; at 3 the under-solved QP starts paying back outer iters).
    # qp_max_iter=20 similarly caps the cold solves (init weights + it 0).
    # Accuracy is unchanged by either cap (active-set polish restores
    # exactness; median |z_hat - z| identical to 4 digits with and without).
    # pred_stop adds the opt-in data-space stopping criterion; see
    # tests/test_parallel.py. adaptive="staged" runs the compacted-
    # continuation schedule as ONE jitted dispatch (parallel/batch.py
    # _fit_staged). collect="lazy" defers the two big solver internals
    # (weights + s_vectors = 80% of the result bytes) as device arrays
    # fetched on demand — over the tunnel's ~35 MB/s link that is a
    # measured 1.755x e2e (experiments/lazy_collect_ab.py: 6826 vs 11976
    # spectra/s in one session, all fields bitwise equal). These knobs are
    # the documented throughput mode — "mode" in the JSON records them;
    # reference-semantics (plain loop, default tolerances) numbers live in
    # experiments/README.md.
    fitter = BatchedEISFitter(freq, dtype=jnp.float32, max_iter=MAX_ITER, mesh=mesh,
                              qp_max_iter=20, qp_max_iter_warm=4,
                              pred_stop=True, pred_rtol=3e-2)
    fit = lambda: fitter.fit(z, adaptive="staged", collect="lazy")

    # Warmup / compile at the SAME batch shape as the timed run
    t0 = time.time()
    res = fit()
    compile_warmup_s = time.time() - t0
    print(f"compile+warmup: {compile_warmup_s:.1f}s", file=sys.stderr)

    def timed_reps(n=12):
        # best-of-12 (~0.25 s each): single-rep timings on the shared
        # tunneled chip vary ~2x within a session, and even healthy
        # (health ~1.0) sessions show ±15% best-rep spread at n=8 from
        # contention bursts; 4 more reps cost ~1 s and tighten the tail
        return [_timeit(fit) for _ in range(n)]

    # e2e: full fit() including host collect + result transfer
    times = timed_reps()
    # Degradation gate: chained-matmul health is the authoritative signal
    # (r3's 2608/s sailed past a naive floor; health would have caught it)
    for attempt in range(2):
        health, probe_s = chip_health(jax, jnp)
        if health >= 0.5:
            break
        print(f"post-run health {health:.2f} < 0.5: degraded window, "
              f"retrying in 120s ({attempt + 1}/2)", file=sys.stderr)
        time.sleep(120)
        times = [min(times), *timed_reps()]
    elapsed = min(times)
    spectra_per_sec = BATCH / elapsed

    # device-only: the staged jitted program alone with a scalar readback
    # (device compute + 1 round trip), minus the measured RTT floor
    rzv, _ = fitter.scale_batch(z)
    def dispatch_only():
        # Same (8, 14, 22) schedule as fit(adaptive="staged") — the schedule
        # is part of the jit cache key, so matching it both reuses fit()'s
        # compiled program (no second cold server-side load) and makes the
        # e2e-vs-device split compare the SAME program
        states = fitter._fit_staged(rzv, phase_budgets=(8, 14, 22))
        np.asarray(states.converged[:1])
    disp = [_timeit(dispatch_only) for _ in range(8)]
    device_sps = BATCH / max(min(disp) - rtt_s, 1e-9)

    print(f"batch {BATCH} reps {[f'{t:.2f}s' for t in times]} -> best "
          f"{spectra_per_sec:.1f} spectra/s e2e; dispatch best "
          f"{min(disp):.3f}s -> {device_sps:.1f} spectra/s device-only",
          file=sys.stderr)

    # Accuracy sanity: predicted impedance residual vs data at noise level
    z_hat = fitter.predict_z(res)
    med_resid = float(np.median(np.abs(z_hat - z)))
    print(f"median |z_hat - z| = {med_resid:.4g} (noise sigma 0.0057); "
          f"converged {int(res.converged.sum())}/{BATCH}", file=sys.stderr)

    # Heterogeneous-map leg (the workload the framework exists for).
    # Gate it on chip health like the headline: r4 captured this leg in a
    # mildly degraded window (health 0.864) and it became the most variable
    # number in the artifact — wait for health >= 0.95 before timing.
    for attempt in range(3):
        het_health, _ = chip_health(jax, jnp)
        if het_health >= 0.95:
            break
        print(f"pre-het health {het_health:.2f} < 0.95; waiting 120s "
              f"({attempt + 1}/3)", file=sys.stderr)
        time.sleep(120)
    try:
        het = run_het_leg(mesh)
    except Exception as exc:  # never lose the headline to the new leg
        print(f"het leg failed: {exc!r}", file=sys.stderr)
        # truncate: axon compile errors embed the helper's full log
        het = {"error": repr(exc)[:300]}
    # A degraded window can open mid-run: probe again so the artifact
    # shows whether the het numbers were measured under the same health
    # as the headline
    het_health, _ = chip_health(jax, jnp)
    if isinstance(het, dict):
        het["chip_health"] = round(het_health, 3)

    # Warm single-spectrum latency (BASELINE 'single-fit wall-time' row)
    try:
        single_fit = run_single_fit_leg(jax, jnp)
    except Exception as exc:
        print(f"single-fit leg failed: {exc!r}", file=sys.stderr)
        single_fit = {"error": repr(exc)[:300]}

    # One-number cold-start budget: every first-dispatch program load a
    # fresh session pays before its first full map result (r4: ~162 s)
    cold_parts = [compile_warmup_s,
                  het.get("warmup_s"), het.get("resolve_windowed_s"),
                  het.get("resolve_coupled_s")]
    cold_total_s = round(sum(p for p in cold_parts if p), 1)

    out = {
        "metric": "drt_inversions_per_sec",
        "value": round(spectra_per_sec, 2),
        "unit": "spectra/s",
        "vs_baseline": round(spectra_per_sec / (BASELINE_SPECTRA_PER_SEC_PER_CHIP * n_dev), 3),
        "device_spectra_per_sec": round(device_sps, 1),
        "rtt_ms": round(rtt_s * 1e3, 1),
        "chip_health": round(health, 3),
        "compile_warmup_s": round(compile_warmup_s, 1),
        "converged": int(res.converged.sum()),
        "batch": BATCH,
        "median_resid": round(med_resid, 5),
        "mode": {"adaptive": "staged", "pred_stop": True, "pred_rtol": 3e-2,
                 "qp_max_iter": 20, "qp_max_iter_warm": 4, "dtype": "float32",
                 "collect": "lazy"},
        "cold_total_s": cold_total_s,
        "het_map": het,
        "single_fit": single_fit,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
