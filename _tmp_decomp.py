import time, numpy as np, jax, jax.numpy as jnp
import bench
from hybdrt_tpu.parallel.batch import BatchedEISFitter
from hybdrt_tpu.solver import qphb as qm

B = 1024
freq, z = bench.make_batch(B, bench.N_FREQ)
fitter = BatchedEISFitter(freq, dtype=jnp.float32, max_iter=bench.MAX_ITER, qp_max_iter_warm=8)
rzv, _ = fitter.scale_batch(z)
rzv = jnp.asarray(rzv, dtype=jnp.float32)
cfg = fitter.cfg; n = fitter.rzm.shape[1]
rho0 = jnp.asarray(fitter.hypers["rho_0"], dtype=jnp.float32)
dop_rho0 = jnp.ones(3, dtype=jnp.float32)
s0 = jnp.stack([jnp.full(n, float(fitter.hypers["s_0"][i]), dtype=jnp.float32) for i in range(3)])
init_fn = jax.jit(jax.vmap(lambda rv: qm.initialize_weights(
    fitter.iw_hyp, fitter.m_stack, rho0, dop_rho0, s0, rv,
    fitter.rzm, fitter.vmm, fitter.lb, cfg, outlier_p=None)[1]))
w = init_fn(rzv); _ = float(w.sum())
t0 = time.perf_counter(); w = init_fn(rzv); _ = float(w.sum())
print(f"init_weights: {time.perf_counter()-t0:.3f}s")
full = jax.jit(jax.vmap(fitter._fit_single))
st = full(rzv); _ = float(st.x.sum())
t0 = time.perf_counter(); st = full(rzv); _ = float(st.x.sum())
print(f"full fit: {time.perf_counter()-t0:.3f}s")
print("n_iter stats: mean", float(jnp.mean(st.it)), "max", int(jnp.max(st.it)))
