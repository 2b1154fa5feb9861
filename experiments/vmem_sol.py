"""VMEM speed-of-light bound for the lane Cholesky (round 5, VERDICT #1b).

The roofline harness (experiments/roofline.py) shows qp_warm = 94% of the
staged fit's device time, at 0.8% MXU and 9.7% HBM — so neither of those
roofs binds. The binding resource is VMEM traffic inside the lane Cholesky
(ops/pallas_chol_lane.py): every rank-1 trailing update reads and writes the
(n-j-1)^2 x 128 trailing block, sum_j 2(n-j)^2 ~ 2n^3/3 elements per matrix.

This script measures the mosaic-achievable ceiling for EXACTLY that access
pattern: a kernel with the same static column loop and the same trailing
block slices, doing a pure scale (1 mul per element, read + write) instead
of the factorization math. No cross-column data dependence is removed — the
in-place write at column j is still an input of column j+1 — so the ceiling
includes whatever serialization mosaic imposes on the loop; it removes ONLY
the factor's extra math (rsqrt column scale, outer-product multiply-sub).

achieved_fraction = t_sol / t_factor is then an honest "fraction of the
speed of light" for the production kernel: the part of its runtime that is
irreducible data movement at mosaic's own best rate for this pattern.

Run on the real chip: python experiments/vmem_sol.py [B] [n]
Writes experiments/vmem_sol_results.json.
"""
import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def _timeit(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 93
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from hybdrt_tpu.ops.pallas_chol_lane import chol_factor_lane

    lanes = 128
    print(f"device: {jax.devices()[0].device_kind}; B={b} n={n}", flush=True)

    # ---- speed-of-light kernel: same loop, same slices, pure scale -------
    def sol_kernel(a_ref, o_ref):
        o_ref[...] = a_ref[...]
        for j in range(n):
            # same 1-row column scale as the factor's pivot ops
            o_ref[j:, j, :] = o_ref[j:, j, :] * 0.999
            if j + 1 < n:
                blk = o_ref[j + 1:, j + 1:, :]
                o_ref[j + 1:, j + 1:, :] = blk * 0.999

    @partial(jax.jit)
    def sol(a):
        a_t = jnp.transpose(a, (1, 2, 0))
        # x64 is enabled package-wide; mosaic index maps must stay 32-bit
        # (ops/pallas_chol_lane.py does the same)
        with jax.enable_x64(False):
            o = pl.pallas_call(
                sol_kernel,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                out_shape=jax.ShapeDtypeStruct((n, n, a_t.shape[-1]), a.dtype),
                grid=(a_t.shape[-1] // lanes,),
                in_specs=[pl.BlockSpec((n, n, lanes), lambda i: (0, 0, i))],
                out_specs=pl.BlockSpec((n, n, lanes), lambda i: (0, 0, i)),
                input_output_aliases={0: 0},
            )(a_t)
        return jnp.transpose(o, (2, 0, 1))

    rng = np.random.default_rng(0)
    g = rng.normal(size=(b, n, n)).astype(np.float32)
    a_np = (g @ np.swapaxes(g, 1, 2) + n * np.eye(n, dtype=np.float32))
    a = jnp.asarray(a_np)

    # rtt floor
    tiny = jax.jit(lambda x: x + 1.0)
    s0 = jnp.zeros((), jnp.float32)
    np.asarray(tiny(s0))
    rtt = min(_timeit(lambda: np.asarray(tiny(s0))) for _ in range(10))
    print(f"rtt floor {rtt * 1e3:.1f} ms", flush=True)

    REPS = 20

    def timed(fn, arg):
        # chain REPS dependent calls inside one jit so XLA can't elide them
        f = jax.jit(lambda x: jax.lax.fori_loop(
            0, REPS, lambda i, y: fn(y), x))
        out = f(arg)
        out.block_until_ready()
        best = min(_timeit(lambda: np.asarray(f(arg).ravel()[0]))
                   for _ in range(5))
        return max(best - rtt, 1e-9) / REPS

    # the factor output is PD-degraded after one pass; keep it PD across
    # chained reps by re-symmetrizing cheaply: L @ L.T + n*I is again PD
    def factor_step(x):
        l = chol_factor_lane(x)
        l = jnp.tril(l)
        return jnp.einsum("bij,bkj->bik", l, l) * (1.0 / n) \
            + n * jnp.eye(n, dtype=x.dtype)[None]

    # measure the re-symmetrization overhead alone so it can be subtracted
    def resym_step(x):
        l = jnp.tril(x)
        return jnp.einsum("bij,bkj->bik", l, l) * (1.0 / n) \
            + n * jnp.eye(n, dtype=x.dtype)[None]

    t_sol = timed(lambda x: sol(x), a)
    t_factor_chain = timed(factor_step, a)
    t_resym = timed(resym_step, a)
    t_factor = max(t_factor_chain - t_resym, 1e-9)

    # traffic model (per matrix, f32): read+write of every trailing block
    # + the column scale row, + kernel in/out streams
    elems_loop = sum(2 * ((n - j - 1) ** 2 + (n - j)) for j in range(n))
    elems_io = 2 * n * n
    bytes_total = b * 4 * (elems_loop + elems_io)

    out = {
        "B": b, "n": n, "lanes": lanes, "rtt_ms": round(rtt * 1e3, 1),
        "t_sol_ms": round(t_sol * 1e3, 3),
        "t_factor_ms": round(t_factor * 1e3, 3),
        "t_factor_chain_ms": round(t_factor_chain * 1e3, 3),
        "t_resym_ms": round(t_resym * 1e3, 3),
        "traffic_gb": round(bytes_total / 1e9, 3),
        "sol_tbs": round(bytes_total / t_sol / 1e12, 3),
        "factor_tbs": round(bytes_total / t_factor / 1e12, 3),
        "factor_over_sol": round(t_sol / t_factor, 3),
    }
    with open("experiments/vmem_sol_results.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)
    print(f"\nfactor runs at {100 * t_sol / t_factor:.0f}% of the "
          f"same-pattern pure-streaming speed of light "
          f"({out['factor_tbs']} vs {out['sol_tbs']} TB/s effective)",
          flush=True)


if __name__ == "__main__":
    main()
