"""A/B: fit_stream (pipelined) vs sequential fit() calls (round 5).

Sequential fit() serializes upload -> compute -> readback per batch;
fit_stream enqueues batch N's packed readback before batch N+1's compute
so the host-side transfer overlaps device compute. Expected win ~= the
per-call transfer share (upload ~0.12 s + readback ~0.1 s of a ~0.64 s
lazy-collect call at B=8192).

Distinct data per frame (realistic operando stream); interleaved order.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from bench import (BATCH, N_FREQ, MAX_ITER, make_batch, wait_for_tpu,
                   measure_rtt, chip_health)

N_FRAMES = 8


def main():
    if not wait_for_tpu():
        print("chip unreachable", file=sys.stderr)
        sys.exit(2)
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_enable_x64", True)
    from hybdrt_tpu.parallel import BatchedEISFitter

    rtt_s = measure_rtt(jax, jnp)
    health, _ = chip_health(jax, jnp)
    print(f"rtt {rtt_s*1e3:.1f} ms, health {health:.2f}", file=sys.stderr)

    freq, _ = make_batch(8, N_FREQ)
    frames = [make_batch(BATCH, N_FREQ, seed=10 + i)[1]
              for i in range(N_FRAMES)]
    fitter = BatchedEISFitter(freq, dtype=jnp.float32, max_iter=MAX_ITER,
                              qp_max_iter=20, qp_max_iter_warm=4,
                              pred_stop=True, pred_rtol=3e-2)
    t0 = time.time()
    fitter.fit(frames[0], adaptive="staged", collect="lazy")
    print(f"warmup {time.time()-t0:.1f}s", file=sys.stderr)

    def run_seq():
        t0 = time.perf_counter()
        res = [fitter.fit(z, adaptive="staged", collect="lazy")
               for z in frames]
        dt = time.perf_counter() - t0
        return dt, res

    def run_stream():
        t0 = time.perf_counter()
        res = list(fitter.fit_stream(frames))
        dt = time.perf_counter() - t0
        return dt, res

    seq_t, stream_t = [], []
    res_seq = res_stream = None
    for rep in range(3):
        dt, res_seq = run_seq()
        seq_t.append(dt)
        dt, res_stream = run_stream()
        stream_t.append(dt)
        print(f"rep {rep}: seq {seq_t[-1]:.2f}s stream {stream_t[-1]:.2f}s",
              file=sys.stderr)

    import numpy as np
    x_eq = all(np.array_equal(a.x, b.x)
               for a, b in zip(res_seq, res_stream))
    conv = int(sum(r.converged.sum() for r in res_stream))

    health2, _ = chip_health(jax, jnp)
    n_spec = N_FRAMES * BATCH
    out = {
        "frames": N_FRAMES, "batch": BATCH,
        "rtt_ms": round(rtt_s * 1e3, 1),
        "health": [round(health, 3), round(health2, 3)],
        "seq_best_s": round(min(seq_t), 2),
        "stream_best_s": round(min(stream_t), 2),
        "seq_sps": round(n_spec / min(seq_t), 1),
        "stream_sps": round(n_spec / min(stream_t), 1),
        "speedup": round(min(seq_t) / min(stream_t), 3),
        "x_equal": x_eq, "converged": conv, "total": n_spec,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
