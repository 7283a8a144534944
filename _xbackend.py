# Cross-backend parity: run CIRIM forward on TPU (matmul DFT) with the same
# weights/inputs as CPU (native FFT), compare outputs + SSIM.
import subprocess, sys, json, numpy as np, os

def run(platform):
    code = '''
import jax, json, numpy as np
if "%PLAT%" == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from mridc_tpu.models import build_model
rng = np.random.default_rng(0)
B,C,H,W = 2,4,128,128
y = rng.standard_normal((B,C,H,W,2)).astype(np.float32)
sens = rng.standard_normal((B,C,H,W,2)).astype(np.float32)
sens /= np.sqrt((sens**2).sum(-1,keepdims=True).sum(1,keepdims=True))
mask = np.zeros((B,1,H,W),np.float32); mask[...,::3]=1; mask[...,56:72]=1
cfg = {"model_name":"CIRIM","num_cascades":2,"time_steps":8,"conv_filters":[16,16,2],
 "recurrent_filters":[16,16,0],"fft_centered":True,"fft_normalization":"ortho"}
m = build_model(cfg)
v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.asarray(y), jnp.asarray(sens), jnp.asarray(mask))
f = jax.jit(lambda v,a,b,c: m.apply(v,a,b,c).prediction)
out = f(v, jnp.asarray(y), jnp.asarray(sens), jnp.asarray(mask))
mag = jnp.sqrt(out[...,0]**2 + out[...,1]**2)  # f32 magnitude readback works on axon
np.save("/tmp/xb_%PLAT%.npy", np.asarray(mag))
print("saved %PLAT%")
'''.replace("%PLAT%", platform)
    r = subprocess.run([sys.executable, "-c", code], cwd="/root/repo", capture_output=True, text=True, timeout=1500)
    print(platform, "->", r.stdout.strip().splitlines()[-1] if r.stdout.strip() else r.stderr[-300:])

run("cpu")
run("tpu")
a = np.load("/tmp/xb_cpu.npy"); b = np.load("/tmp/xb_tpu.npy")
rel = np.abs(a-b).max() / a.max()
from mridc_tpu.metrics.reconstruction import ssim
an = a / a.max(); bn = b / b.max()
s = ssim(an.reshape(-1, 128, 128), bn.reshape(-1, 128, 128))
print(f"max rel diff: {rel:.2e}; cross-backend SSIM: {s:.6f} (1.0 = identical)")
