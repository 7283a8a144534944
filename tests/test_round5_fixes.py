"""Round-5 regression tests (VERDICT r4 items #2/#8)."""

import numpy as np
import pytest


def test_qvn_bf16_refused_without_optin():
    """qVN + compute_dtype=bfloat16 must fail loudly (VERDICT r4 #8): the
    trained-weight certification failed at the gamma defaults, so bf16 needs
    the explicit quantitative_module_allow_bf16 opt-out."""
    from mridc_tpu.models import build_model

    base = {
        "model_name": "QVN",
        "quantitative_module_num_cascades": 2,
        "quantitative_module_channels": 4,
        "quantitative_module_pooling_layers": 2,
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    with pytest.raises(ValueError, match="NOT certified"):
        build_model({**base, "compute_dtype": "bfloat16"})
    # f32 and the explicit opt-out both build
    build_model(base)
    build_model({**base, "compute_dtype": "bfloat16", "quantitative_module_allow_bf16": True})


def test_dtype_cert_vn_task_is_learnable():
    """The VN certification task (tools/dtype_cert.py) is well-posed: a few
    steps on the tiny config reduce the loss (the full run happens on TPU)."""
    import importlib.util
    import pathlib

    import jax
    import jax.numpy as jnp
    import optax

    spec = importlib.util.spec_from_file_location(
        "dtype_cert", pathlib.Path(__file__).parent.parent / "tools" / "dtype_cert.py"
    )
    dc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dc)

    from mridc_tpu.models import build_model

    base = {
        "model_name": "VN", "num_cascades": 2, "channels": 8, "pooling_layers": 2,
        "fft_centered": True, "fft_normalization": "ortho", "dc_mode": "psf1d",
    }
    b, c, h, w = 4, 2, 16, 16
    rng = np.random.default_rng(0)
    mask = dc._mask1d(rng, h, w)
    model = build_model(base)
    y, sens, m, target = dc._vn_batch(rng, b, c, h, w, mask)
    params = model.init(jax.random.PRNGKey(0), y, sens, m)["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, y, sens, m, target):
        def loss_fn(p):
            pred = model.apply({"params": p}, y, sens, m, train=True).prediction
            return jnp.abs(pred - target).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(20):
        yb, sb, mb, tb = dc._vn_batch(np.random.default_rng(100 + i), b, c, h, w, mask)
        params, opt_state, loss = step(params, opt_state, yb, sb, mb, tb)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_auto_dc_mode_reaches_varnet_with_guards():
    """The launcher auto-enables the certified psf1d fast path for VarNet
    configs with guaranteed 1D masks — but only when VN's psf1d preconditions
    hold (no_dc=false, SENSE combination), so from_config never raises."""
    from mridc_tpu.launch import _auto_dc_mode
    from mridc_tpu.models import build_model

    ds = {"data_path": "/tmp/x", "mask_args": {"type": "random1d"}}
    cfg = _auto_dc_mode({"model_name": "E2EVN", "num_cascades": 1, "channels": 4,
                         "pooling_layers": 2, "train_ds": dict(ds)})
    assert cfg.get("dc_mode") == "psf1d"
    build_model(cfg)  # preconditions hold -> builds
    assert "dc_mode" not in _auto_dc_mode(
        {"model_name": "VN", "no_dc": True, "train_ds": dict(ds)}
    )
    assert "dc_mode" not in _auto_dc_mode(
        {"model_name": "VN", "coil_combination_method": "RSS", "train_ds": dict(ds)}
    )
    assert _auto_dc_mode(
        {"model_name": "VN", "dc_mode": "full", "train_ds": dict(ds)}
    )["dc_mode"] == "full"


class _FakeLoader:
    """Minimal BatchLoader surface for DeviceDatasetCache unit tests."""

    def __init__(self, batches, n, batch_size):
        self.batches = batches
        self.dataset = list(range(n))
        self.batch_size = batch_size
        self.drop_last = True
        self.process_count = 1

    def epoch_order(self):
        return np.arange(len(self.dataset))

    def __iter__(self):
        return iter(self.batches)


def _mini_batch(ids, with_init_pred=True):
    n = len(ids)
    b = {
        "sample_indices": np.asarray(ids, np.int64),
        "masked_kspace": np.ones((n, 2, 8, 8, 2), np.float32),
        "mask": np.ones((n, 1, 8, 8), np.float32),
        "target": np.ones((n, 8, 8, 2), np.float32),
        "sensitivity_maps": np.ones((n, 2, 8, 8, 2), np.float32),
        "fname": [f"f{i}" for i in ids],
        "slice_idx": np.asarray(ids, np.int32),
        "acceleration": np.full(n, 4.0, np.float32),
        "attrs": [{} for _ in ids],
    }
    if with_init_pred:
        b["initial_prediction"] = np.ones((n, 8, 8, 2), np.float32)
    return b


def test_device_cache_conditional_key_disables_transparently():
    """A leaf that is present in the allocating batch but missing from a later
    one (batch-composition-dependent keys like initial_prediction) must
    disable the cache transparently, not raise KeyError mid-epoch."""
    from mridc_tpu.data.cache import DeviceDatasetCache

    batches = [_mini_batch([0, 1]), _mini_batch([2, 3], with_init_pred=False)]
    cache = DeviceDatasetCache(_FakeLoader(batches, n=4, batch_size=2))
    out = list(cache)
    assert len(out) == 2
    assert cache._disabled
    assert "initial_prediction" not in out[1]
    # and the reverse direction: key appears only after the allocating batch
    batches = [_mini_batch([0, 1], with_init_pred=False), _mini_batch([2, 3])]
    cache = DeviceDatasetCache(_FakeLoader(batches, n=4, batch_size=2))
    out = list(cache)
    assert cache._disabled
    assert "initial_prediction" in out[1]
