"""Measurement queue run automatically when the TPU returns.

Appends JSON lines to /tmp/queue_results.jsonl.
"""
import json
import subprocess
import sys
import time

OUT = "/tmp/queue_results.jsonl"


def emit(rec):
    rec["t"] = round(time.time())
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def sh(tag, args, timeout=2400):
    t0 = time.time()
    try:
        r = subprocess.run(args, capture_output=True, text=True, timeout=timeout, cwd="/root/repo")
        out = (r.stdout or "").strip().splitlines()
        emit({"step": tag, "rc": r.returncode, "wall_s": round(time.time() - t0, 1),
              "last": out[-1] if out else (r.stderr or "")[-300:]})
    except subprocess.TimeoutExpired:
        emit({"step": tag, "rc": "timeout", "wall_s": round(time.time() - t0, 1)})


PY = sys.executable
MTLRS = json.dumps({
    "model_name": "MTLRS",
    "joint_reconstruction_segmentation_module_cascades": 5,
    "reconstruction_module_num_cascades": 1, "reconstruction_module_time_steps": 8,
    "reconstruction_module_conv_filters": [64, 64, 2],
    "reconstruction_module_recurrent_filters": [64, 64, 0],
    "segmentation_module": "attentionunet", "segmentation_module_output_channels": 2,
    "segmentation_module_channels": 32, "segmentation_module_pooling_layers": 2,
    "fft_centered": True, "fft_normalization": "ortho",
    "compute_dtype": "bfloat16", "dc_mode": "psf1d",
})
QC = json.dumps({
    "model_name": "QCIRIM", "quantitative_module_num_cascades": 5,
    "quantitative_module_time_steps": 8, "fft_centered": True, "fft_normalization": "ortho",
})
QC_BF16 = json.dumps({**json.loads(QC), "compute_dtype": "bfloat16"})
VNET = json.dumps({"model_name": "SEGMENTATIONVNET"})
VNET_BF16 = json.dumps({**json.loads(VNET), "compute_dtype": "bfloat16"})
DYN = json.dumps({"model_name": "SEGMENTATIONDYNUNET", "segmentation_module_channels": [32, 64, 128, 256],
                  "segmentation_module_strides": [1, 2, 2, 2]})
DYN_BF16 = json.dumps({**json.loads(DYN), "compute_dtype": "bfloat16"})

# 1. the driver bench (validates the make_flagship_forward refactor on-chip;
#    round 4 adds e2evn_* and train_e2e_* keys to the same JSON line)
sh("bench", [PY, "bench.py"])
# 1b. per-kernel floor for the train-MFU question (VERDICT r4 #2)
sh("kernel-floor", [PY, "tools/kernel_floor.py"], timeout=3600)
# 2. quantitative flagship f32 vs bf16 (new knob)
sh("qcirim-f32", [PY, "tools/perf_lab.py", "zoo", "--cfg", QC, "--batch", "4"])
sh("qcirim-bf16", [PY, "tools/perf_lab.py", "zoo", "--cfg", QC_BF16, "--batch", "4"])
# 3. newly plumbed seg trunks f32 vs bf16 (train step)
sh("vnet-f32-train", [PY, "tools/perf_lab.py", "seg", "--cfg", VNET, "--batch", "16", "--train"])
sh("vnet-bf16-train", [PY, "tools/perf_lab.py", "seg", "--cfg", VNET_BF16, "--batch", "16", "--train"])
sh("dynunet-f32-train", [PY, "tools/perf_lab.py", "seg", "--cfg", DYN, "--batch", "16", "--train"])
sh("dynunet-bf16-train", [PY, "tools/perf_lab.py", "seg", "--cfg", DYN_BF16, "--batch", "16", "--train"])
emit({"step": "queue-done"})
