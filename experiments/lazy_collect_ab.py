"""A/B: fit(collect="full") vs fit(collect="lazy") at bench shapes (round 5).

The e2e-vs-device split in bench_r5_session.json leaves ~0.75 s/call of
host+transfer overhead at B=8192.  Measured tunnel link: ~35 MB/s both ways
(experiments note).  The packed result download is ~17.4 MB of which
weights (142 f32/lane) + s_vectors (279 f32/lane) are 80%; the upload was
f64 (9.3 MB) for an f32 fit.  fit(collect="lazy") defers the two big solver
internals as device arrays (np.asarray fetches on demand) and fit() now
casts rzv to the compute dtype before upload.

Run on the real chip; interleaved best-of-N so session drift cancels.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from bench import (BATCH, N_FREQ, MAX_ITER, make_batch, wait_for_tpu,
                   measure_rtt, chip_health, _timeit)


def main():
    if not wait_for_tpu():
        print("chip unreachable", file=sys.stderr)
        sys.exit(2)
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from hybdrt_tpu.parallel import BatchedEISFitter

    rtt_s = measure_rtt(jax, jnp)
    health, probe_s = chip_health(jax, jnp)
    print(f"rtt {rtt_s*1e3:.1f} ms, health {health:.2f}", file=sys.stderr)

    freq, z = make_batch(BATCH, N_FREQ)
    fitter = BatchedEISFitter(freq, dtype=jnp.float32, max_iter=MAX_ITER,
                              qp_max_iter=20, qp_max_iter_warm=4,
                              pred_stop=True, pred_rtol=3e-2)
    t0 = time.time()
    res = fitter.fit(z, adaptive="staged")
    warm_s = time.time() - t0
    print(f"warmup {warm_s:.1f}s", file=sys.stderr)

    full_t, lazy_t = [], []
    for rep in range(8):
        full_t.append(_timeit(lambda: fitter.fit(z, adaptive="staged")))
        lazy_t.append(_timeit(
            lambda: fitter.fit(z, adaptive="staged", collect="lazy")))
        print(f"rep {rep}: full {full_t[-1]:.3f}s lazy {lazy_t[-1]:.3f}s",
              file=sys.stderr)

    # value parity on the deferred fields (fetches them once)
    import numpy as np
    rf = fitter.fit(z, adaptive="staged")
    rl = fitter.fit(z, adaptive="staged", collect="lazy")
    w_eq = bool(np.array_equal(np.asarray(rl.weights), rf.weights))
    s_eq = bool(np.array_equal(np.asarray(rl.s_vectors), rf.s_vectors))

    health2, _ = chip_health(jax, jnp)
    out = {
        "batch": BATCH, "rtt_ms": round(rtt_s * 1e3, 1),
        "health": [round(health, 3), round(health2, 3)],
        "full_best_s": round(min(full_t), 3),
        "lazy_best_s": round(min(lazy_t), 3),
        "full_sps": round(BATCH / min(full_t), 1),
        "lazy_sps": round(BATCH / min(lazy_t), 1),
        "speedup": round(min(full_t) / min(lazy_t), 3),
        "weights_equal": w_eq, "s_vectors_equal": s_eq,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
