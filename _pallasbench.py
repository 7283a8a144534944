import jax, jax.numpy as jnp, numpy as np, time
from mridc_tpu.ops.kernels.llg import llg_fused
from mridc_tpu.nn.dc import log_likelihood_gradient
rng = np.random.default_rng(0)
B,C,H,W = 16,15,320,320
eta = jnp.asarray(rng.standard_normal((B,H,W,2)).astype(np.float32))
y = jnp.asarray(rng.standard_normal((B,C,H,W,2)).astype(np.float32))
sens = jnp.asarray(rng.standard_normal((B,C,H,W,2)).astype(np.float32))
mask = jnp.asarray((rng.random((B,1,H,W))<0.3).astype(np.float32))

fp = jax.jit(lambda e,y,s,m: (llg_fused(e,y,s,m,True,"ortho")**2).sum())
fx = jax.jit(lambda e,y,s,m: (log_likelihood_gradient(e,y,s,m,1.0,True,"ortho")[...,2:4]**2).sum())
try:
    vp = float(fp(eta,y,sens,mask)); print("pallas value", vp, flush=True)
    t0=time.perf_counter()
    for _ in range(10): float(fp(eta,y,sens,mask))
    print(f"pallas: {(time.perf_counter()-t0)/10*1000:.1f} ms", flush=True)
except Exception as e:
    print("pallas FAIL:", str(e)[:400], flush=True)
vx = float(fx(eta,y,sens,mask)); print("xla value", vx, flush=True)
t0=time.perf_counter()
for _ in range(10): float(fx(eta,y,sens,mask))
print(f"xla: {(time.perf_counter()-t0)/10*1000:.1f} ms", flush=True)
