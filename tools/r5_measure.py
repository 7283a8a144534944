"""Round-5 one-off TPU measurement driver: run named measurement sets and
append JSON lines to /tmp/r5_results.jsonl (resilient to session timeouts)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

OUT = "/tmp/r5_results.jsonl"


def emit(rec):
    rec["t"] = round(time.time(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def vn(tag, batch, ov, warm=2, iters=5):
    t0 = time.time()
    fwd, args = bench.make_e2evn_forward(batch, ov)
    dt = bench.time_scalar_fn(fwd, args, warm, iters)
    emit({"set": "vn", "tag": tag, "batch": batch, "ov": ov,
          "slices_per_s": round(iters * batch / dt, 2), "wall_s": round(time.time() - t0)})


def cirim_infer(tag, batch, ov, warm=2, iters=5):
    t0 = time.time()
    fwd, args = bench.make_flagship_forward(batch, ov)
    dt = bench.time_scalar_fn(fwd, args, warm, iters)
    emit({"set": "cirim", "tag": tag, "batch": batch, "ov": ov,
          "slices_per_s": round(iters * batch / dt, 2), "wall_s": round(time.time() - t0)})


def cirim_train(tag, batch, ov, iters=4):
    t0 = time.time()
    step, params, opt_state, data = bench.make_flagship_train_step(batch, ov)
    for _ in range(2):
        params, opt_state, loss = step(params, opt_state, *data)
        float(loss)
    t1 = time.time()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, *data)
        float(loss)
    dt = time.time() - t1
    emit({"set": "cirim_train", "tag": tag, "batch": batch, "ov": ov,
          "slices_per_s": round(iters * batch / dt, 2), "wall_s": round(time.time() - t0)})


SETS = {}


def register(name):
    def deco(fn):
        SETS[name] = fn
        return fn
    return deco


@register("vn_psf1d_bf16")
def _vn_psf1d_bf16():
    vn("bf16 psf1d", 32, {"dc_mode": "psf1d"})
    vn("bf16 psf1d", 64, {"dc_mode": "psf1d"})
    vn("bf16+dc16 psf1d", 32, {"dc_mode": "psf1d", "dc_dtype": "bfloat16"})


@register("vn_psf1d_sweep2")
def _vn_psf1d_sweep2():
    vn("bf16+dc16 psf1d", 64, {"dc_mode": "psf1d", "dc_dtype": "bfloat16"})
    vn("bf16 psf1d", 96, {"dc_mode": "psf1d"})
    vn("f32 psf1d", 64, {"compute_dtype": None, "dc_mode": "psf1d"})


@register("vn_psf1d_sweep3")
def _vn_psf1d_sweep3():
    vn("bf16+dc16 psf1d", 96, {"dc_mode": "psf1d", "dc_dtype": "bfloat16"})
    vn("f32 psf1d", 96, {"compute_dtype": None, "dc_mode": "psf1d"})


@register("train_e2e")
def _train_e2e():
    """Device-only train step vs data-included e2e with the HBM dataset
    cache — the VERDICT r5 #1 gap (bar: train_e2e_vs_device >= 0.5)."""
    t0 = time.time()
    dev_sps, _ = bench.bench_jax_train()
    emit({"set": "train", "tag": "device-only b24", "slices_per_s": round(dev_sps, 2),
          "wall_s": round(time.time() - t0)})
    t0 = time.time()
    e2e_sps, n = bench.bench_train_e2e()
    emit({"set": "train", "tag": "e2e devcache b24", "slices_per_s": round(e2e_sps, 2),
          "n": n, "vs_device": round(e2e_sps / dev_sps, 3), "wall_s": round(time.time() - t0),
          "host_profile": bench.LAST_E2E_PROFILE})
    os.environ["BENCH_E2E_DEVICE_CACHE"] = "0"
    t0 = time.time()
    e2e0_sps, n = bench.bench_train_e2e()
    emit({"set": "train", "tag": "e2e nocache b24", "slices_per_s": round(e2e0_sps, 2),
          "n": n, "vs_device": round(e2e0_sps / dev_sps, 3), "wall_s": round(time.time() - t0),
          "host_profile": bench.LAST_E2E_PROFILE})
    os.environ.pop("BENCH_E2E_DEVICE_CACHE", None)




def _mtlrs_cfg(ov=None):
    """Production MTLRS (projects/multitask/conf/base_mtlrs_train.yaml): 5
    joint cascades x (1-cascade T=8 CIRIM + 32ch AttentionUNet)."""
    cfg = {
        "model_name": "MTLRS",
        "joint_reconstruction_segmentation_module_cascades": 5,
        "reconstruction_module_num_cascades": 1,
        "reconstruction_module_time_steps": 8,
        "reconstruction_module_recurrent_layer": "IndRNN",
        "reconstruction_module_conv_filters": [64, 64, 2],
        "reconstruction_module_recurrent_filters": [64, 64, 0],
        "reconstruction_module_no_dc": True,
        "reconstruction_module_keep_prediction": True,
        "segmentation_module": "attentionunet",
        "segmentation_module_channels": 32,
        "segmentation_module_pooling_layers": 2,
        "segmentation_module_output_channels": 2,
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    cfg.update(ov or {})
    return cfg


def _qcirim_cfg(ov=None):
    """Production qCIRIM (projects/quantitative/conf/base_qcirim_train.yaml):
    5 cascades x 8 time steps, IndRNN, MEGRE."""
    cfg = {
        "model_name": "QCIRIM",
        "quantitative_module_num_cascades": 5,
        "quantitative_module_time_steps": 8,
        "quantitative_module_recurrent_layer": "IndRNN",
        "quantitative_module_conv_filters": [64, 64, 4],
        "quantitative_module_recurrent_filters": [64, 64, 0],
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    cfg.update(ov or {})
    return cfg


def _attention_unet_flops(hw, in_ch, chans, pools, out_ch) -> float:
    """Analytic conv flops of nn/seg_blocks.AttentionUnet (2x 3x3 convs per
    ConvBlock, gate wx/wg convs, 2x2 transpose convs, final 1x1; norms and
    bilinear resizes ignored — they are bandwidth, not MXU, terms)."""
    fl = 0.0
    ch, cin, res = chans, in_ch, float(hw)
    enc = []
    for i in range(pools):
        fl += 2 * res * 9 * cin * ch + 2 * res * 9 * ch * ch
        enc.append((res, ch))
        res /= 4.0
        cin = ch
        if i < pools - 1:
            ch *= 2
    fl += 2 * res * 9 * ch * (2 * ch) + 2 * res * 9 * (2 * ch) * (2 * ch)
    x_ch = 2 * ch
    for i in range(pools):
        sres, sch = enc.pop()
        gres = sres / 4.0  # gate operates at the pre-upsample resolution
        fl += 2 * gres * 4 * sch * ch + 2 * gres * x_ch * ch + 2 * gres * ch
        fl += 2 * sres * x_ch * ch  # 2x2-stride-2 transpose: 1 tap/output
        fl += 2 * sres * 9 * (2 * ch) * ch + 2 * sres * 9 * ch * ch
        x_ch = ch
        if i < pools - 1:
            ch //= 2
    fl += 2 * float(hw) * ch * out_ch
    return fl


def _mtlrs_flops_per_slice(psf1d: bool) -> float:
    """Executed forward flops for one MTLRS slice (same convention as
    bench.cirim_flops_per_slice: folded-conv overwork NOT credited): J=5
    joint cascades x (T=8 RIM steps with a per-step likelihood gradient +
    one AttentionUNet seg forward)."""
    C, H, W = bench.COILS, bench.H, bench.W
    hw, F = H * W, 64
    dft = C * 6 * hw * W if psf1d else 2 * C * 6 * hw * (H + W)
    conv = 2 * hw * (25 * 4 * F + F * F + 9 * F * F + F * F + 9 * F * 2)
    seg = _attention_unet_flops(hw, 2, 32, 2, 2)
    return float(5 * (8 * (dft + conv) + seg))


def _qcirim_flops_per_slice() -> float:
    """Executed forward flops for one qCIRIM slice: 5 cascades x (one
    analytical MEGRE likelihood gradient over E=4 echoes — fixed within a
    cascade's time steps, reference qrim_block semantics — + T=8 qRIM conv
    steps on the 8-channel [grad, maps] input)."""
    C, H, W = bench.COILS, bench.H, bench.W
    hw, F, E = H * W, 64, 4
    dft = 2 * E * C * 6 * hw * (H + W)
    conv = 2 * hw * (25 * 8 * F + F * F + 9 * F * F + F * F + 9 * F * 4)
    return float(5 * (dft + 8 * conv))


def _time_trainer_step(trainer, batch, iters=4):
    """(slices/s, model TFLOP/s) of the REAL jitted task-trainer train step:
    compile + 2 warm calls, then time; model flops from XLA's own cost
    analysis of the non-remat eval forward x3 (fwd + bwd convention, remat
    recompute not credited — same accounting as bench.cirim_flops_per_slice)."""
    b = batch["segmentation"].shape[0] if "segmentation" in batch else batch["kspace"].shape[0]
    for _ in range(2):
        m = trainer.training_batch(batch)
        float(m["loss"])
    t0 = time.time()
    for _ in range(iters):
        m = trainer.training_batch(batch)
    float(m["loss"])
    dt = time.time() - t0
    return iters * b / dt, b


@register("task_train")
def _task_train():
    """Train-step throughput + MFU for the multitask and quantitative
    flagships (VERDICT r4 #7) at production configs, bench shapes."""
    import jax
    import numpy as np

    from mridc_tpu.models import build_model
    from mridc_tpu.parallel.mesh import make_mesh
    from mridc_tpu.train.task_trainers import MultitaskTrainer, QuantitativeTrainer

    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))
    mesh = make_mesh(len(jax.devices()))
    rng = np.random.default_rng(0)
    C, H, W = bench.COILS, bench.H, bench.W

    def rv(shape):
        return rng.standard_normal(shape + (2,)).astype("float32")

    mask = np.zeros((1, 1, H, W), "float32")
    mask[..., ::4] = 1.0
    mask[..., W // 2 - 16 : W // 2 + 16] = 1.0

    def run_row(name, build_batch, make_trainer, fl, bsz):
        """Measure one trainer row, halving the batch on device OOM."""
        while bsz >= 1:
            t0 = time.time()
            try:
                batch = build_batch(bsz)
                tr = make_trainer(batch)
                sps, b = _time_trainer_step(tr, batch)
                emit({"set": "task_train", "tag": name, "batch": b,
                      "slices_per_s": round(sps, 3),
                      "train_tflops": round(3 * fl * sps / 1e12, 2),
                      "train_mfu": round(3 * fl * sps / 1e12 / peak, 4),
                      "wall_s": round(time.time() - t0)})
                return
            except Exception as exc:  # noqa: BLE001 — RESOURCE_EXHAUSTED etc.
                if "RESOURCE_EXHAUSTED" not in str(exc) and "out of memory" not in str(exc).lower():
                    emit({"set": "task_train", "tag": name, "batch": bsz,
                          "error": str(exc)[:200]})
                    return
                emit({"set": "task_train", "tag": name, "batch": bsz, "oom": True})
                bsz //= 2

    def mtlrs_batch(bsz):
        return {
            "masked_kspace": rv((bsz, C, H, W)),
            "sensitivity_maps": rv((bsz, C, H, W)) / np.sqrt(C),
            "mask": np.broadcast_to(mask, (bsz, 1, H, W)).copy(),
            "initial_prediction": rv((bsz, H, W)),
            "target": rv((bsz, H, W)),
            "segmentation": np.eye(2, dtype="float32")[rng.integers(0, 2, (bsz, H, W))],
        }

    def qcirim_batch(bsz):
        return {
            "kspace": rv((bsz, 4, C, H, W)),
            "sensitivity_maps": rv((bsz, C, H, W)) / np.sqrt(C),
            "mask": np.broadcast_to(mask[0], (bsz, 1, H, W)).copy(),
            "maps_init": np.abs(rng.standard_normal((bsz, H, W, 4))).astype("float32"),
            "maps_target": np.abs(rng.standard_normal((bsz, H, W, 4))).astype("float32"),
            "TEs": np.asarray([3.0, 11.5, 20.0, 28.5], "float32"),
            "mask_brain": np.ones((bsz, H, W), "float32"),
        }

    mtlrs_rows = (
        ("f32", {}),
        ("fast bf16+psf1d+dc16", {"compute_dtype": "bfloat16", "dc_mode": "psf1d"}),
    )
    for tag, ov in mtlrs_rows:
        def mk(batch, _ov=ov):
            model = build_model(_mtlrs_cfg(_ov))
            tr = MultitaskTrainer(model, optim_cfg={"name": "adam", "lr": 1e-3}, mesh=mesh)
            tr.setup_optimization()
            tr.init_state(jax.random.PRNGKey(0), batch)
            return tr

        run_row(f"MTLRS {tag}", mtlrs_batch, mk,
                _mtlrs_flops_per_slice(psf1d=ov.get("dc_mode") == "psf1d"),
                int(os.environ.get("R5_MTLRS_BATCH", 8)))

    for tag, ov in (("f32", {}), ("bf16", {"compute_dtype": "bfloat16"})):
        def mkq(batch, _ov=ov):
            model = build_model(_qcirim_cfg(_ov))
            tr = QuantitativeTrainer(model, optim_cfg={"name": "adam", "lr": 1e-3}, mesh=mesh)
            tr.setup_optimization()
            tr.init_state(jax.random.PRNGKey(0), batch)
            return tr

        run_row(f"qCIRIM {tag}", qcirim_batch, mkq, _qcirim_flops_per_slice(),
                int(os.environ.get("R5_QCIRIM_BATCH", 4)))


if __name__ == "__main__":
    for name in sys.argv[1:]:
        SETS[name]()
