"""Batch-size scaling study for the staged EIS bench workload (round 4).

Question (VERDICT r3 item 2): where is the knee where per-batch fixed costs
(tunnel RTT ~26-35 ms per dispatch, host collect, dispatch overhead)
amortize, and does a larger batch beat B=1024 in spectra/s?

Method: for each B in SIZES, build the bench fitter (same knobs as
bench.py), run one warmup (pays the axon per-process server compile --
measured separately, it is NOT client XLA compile: the persistent cache
hits client-side in 0.0s and the first dispatch still takes minutes, see
experiments/README.md round-4 notes), then best-of-8 reps of:
  - e2e:     full fit() including host collect + result transfer
  - dispatch: the staged jitted program alone, blocking on a scalar
              readback (device compute + 1 tunnel round trip)
Run on the real chip: python experiments/batch_scaling.py [sizes...]
"""
import sys
import time
import json

import numpy as np

sys.path.insert(0, ".")


def main():
    # args: [--buckets=N,M,...] [sizes...]; each (B, buckets) pair is run.
    # buckets=1 is the r4 behavior (whole stage runs to its slowest lane);
    # buckets>1 is the round-5 difficulty-ordered sub-dispatch split
    # (parallel/batch.py _fit_staged) that attacks the straggler tax.
    bucket_list = [None]
    fused = False
    argv = []
    for a in sys.argv[1:]:
        if a.startswith("--buckets="):
            bucket_list = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a == "--fused":
            # qp_fused: fixed-count fused Mehrotra pallas loop kernel for
            # warm QP solves (r3: per-iter 1.35x but straggler-dragged at
            # batch level; bucketing may change that verdict)
            fused = True
        else:
            argv.append(a)
    sizes = [int(s) for s in argv] or [1024, 2048, 4096, 8192]
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from bench import make_batch, N_FREQ, MAX_ITER
    from hybdrt_tpu.parallel import BatchedEISFitter

    print(f"devices: {jax.devices()}", flush=True)

    # RTT floor: minimal dispatch+readback
    tiny = jax.jit(lambda a: a + 1.0)
    s = jnp.zeros((), dtype=jnp.float32)
    np.asarray(tiny(s))
    rtt = min(_timeit(lambda: np.asarray(tiny(s))) for _ in range(10))
    print(f"rtt floor: {rtt * 1e3:.1f} ms", flush=True)

    results = []
    for b in sizes:
      for buckets in bucket_list:
        freq, z = make_batch(b, N_FREQ)
        fitter = BatchedEISFitter(freq, dtype=jnp.float32, max_iter=MAX_ITER,
                                  qp_max_iter=20, qp_max_iter_warm=8,
                                  pred_stop=True, pred_rtol=3e-2,
                                  qp_fused=fused)
        t0 = time.time()
        res = fitter.fit(z, adaptive="staged", staged_buckets=buckets)
        warm = time.time() - t0
        print(f"B={b} buckets={buckets}: warmup {warm:.1f}s", flush=True)

        e2e = [_timeit(lambda: fitter.fit(z, adaptive="staged",
                                          staged_buckets=buckets))
               for _ in range(8)]

        # dispatch-only: reuse the cached staged jit via the scaled input.
        # Pass fit()'s (8, 14, 22) default explicitly — the schedule is part
        # of the jit cache key, so _fit_staged's own (8, 16) default would
        # compile a DIFFERENT program and corrupt the e2e/device split
        rzv, _ = fitter.scale_batch(z)
        disp = []
        for _ in range(8):
            t0 = time.time()
            states = fitter._fit_staged(rzv, phase_budgets=(8, 14, 22),
                                        buckets=buckets)
            np.asarray(states.converged[:1])
            disp.append(time.time() - t0)

        row = {
            "B": b, "buckets": buckets, "fused": fused,
            "warmup_s": round(warm, 1),
            "e2e_best_s": round(min(e2e), 4),
            "e2e_spectra_per_sec": round(b / min(e2e), 1),
            "dispatch_best_s": round(min(disp), 4),
            "device_spectra_per_sec": round(b / max(min(disp) - rtt, 1e-9), 1),
            "rtt_ms": round(rtt * 1e3, 1),
            "converged": int(np.sum(np.asarray(res.converged))),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print("\nsummary:")
    for r in results:
        print(f"  B={r['B']:5d} buckets={r['buckets']}: e2e {r['e2e_spectra_per_sec']:7.1f}/s  "
              f"device {r['device_spectra_per_sec']:7.1f}/s  "
              f"warmup {r['warmup_s']:.0f}s", flush=True)


def _timeit(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    main()
