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
          "n": n, "vs_device": round(e2e_sps / dev_sps, 3), "wall_s": round(time.time() - t0)})
    os.environ["BENCH_E2E_DEVICE_CACHE"] = "0"
    t0 = time.time()
    e2e0_sps, n = bench.bench_train_e2e()
    emit({"set": "train", "tag": "e2e nocache b24", "slices_per_s": round(e2e0_sps, 2),
          "n": n, "vs_device": round(e2e0_sps / dev_sps, 3), "wall_s": round(time.time() - t0)})
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


def _fwd_flops_per_slice(model, fargs) -> float:
    import jax

    jitted = jax.jit(lambda *a: model.apply(*a, train=False))
    try:
        cost = jitted.lower(*fargs).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"]) / fargs[1].shape[0]
    except Exception:
        return float("nan")


@register("task_train")
def _task_train():
    """Train-step throughput + MFU for the multitask and quantitative
    flagships (VERDICT r4 #7) at production configs, bench shapes."""
    import jax
    import jax.numpy as jnp
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

    for tag, ov in (("bf16", {"compute_dtype": "bfloat16"}), ("f32", {})):
        bsz = int(os.environ.get("R5_MTLRS_BATCH", 8))
        t0 = time.time()
        batch = {
            "masked_kspace": rv((bsz, C, H, W)),
            "sensitivity_maps": rv((bsz, C, H, W)) / np.sqrt(C),
            "mask": np.broadcast_to(mask, (bsz, 1, H, W)).copy(),
            "initial_prediction": rv((bsz, H, W)),
            "target": rv((bsz, H, W)),
            "segmentation": np.eye(2, dtype="float32")[rng.integers(0, 2, (bsz, H, W))],
        }
        model = build_model(_mtlrs_cfg(ov))
        tr = MultitaskTrainer(model, optim_cfg={"name": "adam", "lr": 1e-3}, mesh=mesh)
        tr.setup_optimization()
        tr.init_state(jax.random.PRNGKey(0), batch)
        sps, bsz = _time_trainer_step(tr, batch)
        fargs = (
            {"params": tr.state.params},
            jnp.asarray(batch["masked_kspace"]),
            jnp.asarray(batch["sensitivity_maps"]),
            jnp.asarray(batch["mask"]),
            jnp.asarray(batch["initial_prediction"]),
        )
        fl = _fwd_flops_per_slice(model, fargs)
        emit({"set": "task_train", "tag": f"MTLRS {tag}", "batch": bsz,
              "slices_per_s": round(sps, 3),
              "train_tflops": round(3 * fl * sps / 1e12, 2),
              "train_mfu": round(3 * fl * sps / 1e12 / peak, 4),
              "wall_s": round(time.time() - t0)})
        del tr, model

    for tag, ov in (("bf16", {"compute_dtype": "bfloat16"}), ("f32", {})):
        bsz = int(os.environ.get("R5_QCIRIM_BATCH", 4))
        e = 4
        t0 = time.time()
        qb = {
            "kspace": rv((bsz, e, C, H, W)),
            "sensitivity_maps": rv((bsz, C, H, W)) / np.sqrt(C),
            "mask": np.broadcast_to(mask[0], (bsz, 1, H, W)).copy(),
            "maps_init": np.abs(rng.standard_normal((bsz, H, W, 4))).astype("float32"),
            "maps_target": np.abs(rng.standard_normal((bsz, H, W, 4))).astype("float32"),
            "TEs": np.asarray([3.0, 11.5, 20.0, 28.5], "float32"),
            "mask_brain": np.ones((bsz, H, W), "float32"),
        }
        model = build_model(_qcirim_cfg(ov))
        tr = QuantitativeTrainer(model, optim_cfg={"name": "adam", "lr": 1e-3}, mesh=mesh)
        tr.setup_optimization()
        tr.init_state(jax.random.PRNGKey(0), qb)
        sps, bsz = _time_trainer_step(tr, qb)
        fargs = (
            {"params": tr.state.params},
            jnp.asarray(qb["kspace"]),
            jnp.asarray(qb["sensitivity_maps"]),
            jnp.asarray(qb["mask"]),
            jnp.asarray(qb["maps_init"]),
            jnp.asarray(qb["TEs"]),
        )
        fl = _fwd_flops_per_slice(model, fargs)
        emit({"set": "task_train", "tag": f"qCIRIM {tag}", "batch": bsz,
              "slices_per_s": round(sps, 3),
              "train_tflops": round(3 * fl * sps / 1e12, 2),
              "train_mfu": round(3 * fl * sps / 1e12 / peak, 4),
              "wall_s": round(time.time() - t0)})
        del tr, model


if __name__ == "__main__":
    for name in sys.argv[1:]:
        SETS[name]()
