import time, numpy as np, jax, jax.numpy as jnp
from sympgpr_tpu.gp.covariance import build_K_fast
from sympgpr_tpu.ops import pallas_cov
from sympgpr_tpu.kernels import PER_SE

dev = jax.devices()[0]
print("device:", dev)
rng = np.random.default_rng(0)
ITERS = 20

def chain(build):
    @jax.jit
    def run(X, p, sig, c0):
        def body(c, _):
            K = build(X, p * (1.0 + 1e-30 * c), sig)  # serialized, not foldable
            return jnp.sum(K[::64, ::64]), None       # cheap dependency read
        c, _ = jax.lax.scan(body, c0, None, length=ITERS)
        return c
    return run

for N in (1024, 2048, 4096):
    X = jax.device_put(jnp.asarray(np.stack([rng.uniform(0,2*np.pi,N), rng.uniform(-2,2,N)],1), jnp.float32), dev)
    p = jnp.asarray([0.9,1.7], jnp.float32); sig = jnp.asarray(2.0, jnp.float32)
    fx = chain(lambda X,p,s: build_K_fast(PER_SE, X, X, p, s))
    fp = chain(lambda X,p,s: pallas_cov.build_K_pallas(PER_SE, X, X, p, s))
    for name, f in (("xla", fx), ("pallas", fp)):
        float(f(X,p,sig,jnp.float32(0)))  # warm
        dt = np.inf
        for _ in range(3):
            t0=time.time(); float(f(X,p,sig,jnp.float32(0))); dt=min(dt,time.time()-t0)
        per = dt / ITERS
        entries = (2*N)**2
        print(f"N={N} {name}: {per*1e3:.3f} ms/build  {entries/per/1e9:.2f} G entries/s")
