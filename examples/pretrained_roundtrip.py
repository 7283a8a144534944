"""Example: export a trained model as a .mridc archive and reload it with
from_pretrained — the distribution flow (reference save_restore_connector +
cloud download; here name/URL/path resolve through a sha-keyed cache).

Run:  python examples/pretrained_roundtrip.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mridc_tpu.models import build_model, from_pretrained  # noqa: E402
from mridc_tpu.train.checkpoints import save_archive  # noqa: E402


def main():
    tmp = Path(tempfile.mkdtemp(prefix="mridc_tpu_pretrained_"))
    cfg = {
        "model_name": "CIRIM",
        "num_cascades": 2,
        "time_steps": 4,
        "conv_filters": [16, 16, 2],
        "recurrent_filters": [16, 16, 0],
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    model = build_model(cfg)
    rng = np.random.default_rng(0)

    def rv(z):
        return np.stack([z.real, z.imag], -1).astype(np.float32)

    y = rv((rng.standard_normal((1, 4, 64, 64)) + 1j * rng.standard_normal((1, 4, 64, 64))).astype(np.complex64))
    sens = rv((rng.standard_normal((1, 4, 64, 64)) + 1j * rng.standard_normal((1, 4, 64, 64))).astype(np.complex64))
    mask = np.ones((1, 1, 64, 64), np.float32)
    variables = model.init(jax.random.PRNGKey(0), y, sens, mask)

    archive = tmp / "cirim_demo.mridc"
    save_archive(archive, cfg, variables["params"])
    print("exported:", archive)

    model2, params2, cfg2 = from_pretrained(str(archive))
    p1 = model.apply(variables, y, sens, mask).prediction
    p2 = model2.apply({"params": params2}, y, sens, mask).prediction
    print("roundtrip max diff:", float(jnp.max(jnp.abs(p1 - p2))))


if __name__ == "__main__":
    main()
