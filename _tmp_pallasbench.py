import sys; sys.setrecursionlimit(100000)
import time, numpy as np, jax, jax.numpy as jnp
import jax.scipy.linalg as jsl
from hybdrt_tpu.ops.pallas_chol import chol_solve_batched

B, N = 1024, 93
rng = np.random.default_rng(0)
a_ = rng.normal(size=(B, N, N)).astype(np.float32)
p = jnp.asarray(a_ @ np.transpose(a_, (0,2,1)) + 10*np.eye(N, dtype=np.float32))
b = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))

# correctness on TPU
x = chol_solve_batched(p, b, block_batch=8)
xr = np.linalg.solve(np.asarray(p, dtype=np.float64), np.asarray(b, dtype=np.float64)[...,None])[...,0]
print("tpu rel err:", float(np.max(np.abs(np.asarray(x)-xr)/(1+np.abs(xr)))))

for bt in (8, 16, 32):
    @jax.jit
    def chain(p, b):
        def body(i, x):
            return chol_solve_batched(p, b + 0.001*x, block_batch=bt)
        return jnp.sum(jax.lax.fori_loop(0, 20, body, b))
    v = float(chain(p, b))
    t0 = time.perf_counter(); v = float(chain(p, b)); t = time.perf_counter()-t0
    print(f"pallas bt={bt}: {t/20*1000:.2f} ms per factor+solve (val {v:.4f})")
