import jax, jax.numpy as jnp, numpy as np, time, optax
from mridc_tpu.models import build_model
from mridc_tpu.train.losses import process_reconstruction_loss
from bench import CASCADES, TIME_STEPS, FILTERS, _rv
rng = np.random.default_rng(0)
B = 8
shape = (B, 15, 320, 320)
y = _rv((rng.standard_normal(shape)+1j*rng.standard_normal(shape)).astype(np.complex64))
sens = y / np.sqrt((y**2).sum(-1, keepdims=True).sum(1, keepdims=True) + 1e-8)
mask = np.zeros((B,1,320,320), np.float32); mask[..., ::4] = 1; mask[..., 144:176] = 1
target = _rv((rng.standard_normal((B,320,320))+1j*rng.standard_normal((B,320,320))).astype(np.complex64))
yd, sd, md, td = map(jnp.asarray, (y, sens, mask, target))
cfg = {"model_name":"CIRIM","num_cascades":CASCADES,"time_steps":TIME_STEPS,"recurrent_layer":"IndRNN",
 "conv_filters":[FILTERS,FILTERS,2],"conv_kernels":[5,3,3],"conv_dilations":[1,2,1],
 "recurrent_filters":[FILTERS,FILTERS,0],"recurrent_kernels":[1,1,0],"recurrent_dilations":[1,1,0],
 "fft_centered":True,"fft_normalization":"ortho"}
model = build_model(cfg)
v = jax.jit(model.init)(jax.random.PRNGKey(0), yd, sd, md)
params = v["params"]
tx = optax.adam(1e-3)
opt = tx.init(params)
def step(params, opt, y, s, m, t):
    def loss_fn(p):
        out = model.apply({"params": p}, y, s, m)
        return process_reconstruction_loss(out, t, "l1")
    loss, g = jax.value_and_grad(loss_fn)(params)
    up, opt = tx.update(g, opt, params)
    return optax.apply_updates(params, up), opt, loss
jstep = jax.jit(step, donate_argnums=(0,1))
params, opt, loss = jstep(params, opt, yd, sd, md, td); print("loss", float(loss), flush=True)
t0=time.perf_counter()
n=6
for _ in range(n):
    params, opt, loss = jstep(params, opt, yd, sd, md, td)
    float(loss)
dt=(time.perf_counter()-t0)/n
print(f"train step B={B}: {dt*1000:.0f} ms -> {B/dt:.2f} slices/s training", flush=True)
