"""Golden parity for qVarNet's complex-map threading against the reference's
own code: qvn_block.qVarNetBlock cascades threaded exactly as
mridc/collections/quantitative/nn/qvn.py:210-245 (complex maps between
cascades, abs-stack as the running prediction, per-component R2* clamp),
with imported reference weights.

The comparison is on the raw final cascade output (``final_prediction``) —
before the reference's ``RescaleByMax.reverse``, whose gamma indexing by
BATCH element is a pinned upstream bug (PARITY.md).
"""

import ast
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import reference_loader


@pytest.fixture(scope="module")
def ref_mods():
    reference_loader.install()
    # quantitative/nn/base.py is PTL-heavy; qvn_block only needs SignalForwardModel
    src = open("/root/reference/mridc/collections/quantitative/nn/base.py").read()
    tree = ast.parse(src)
    cls_src = next(
        ast.get_source_segment(src, n)
        for n in tree.body
        if isinstance(n, ast.ClassDef) and n.name == "SignalForwardModel"
    )
    from typing import List, Optional, Union

    ns = {"torch": torch, "Union": Union, "Optional": Optional, "List": List}
    exec(cls_src, ns)  # noqa: S102 — reference's own code, test-only
    base_stub = types.ModuleType("mridc.collections.quantitative.nn.base")
    base_stub.SignalForwardModel = ns["SignalForwardModel"]
    sys.modules["mridc.collections.quantitative.nn.base"] = base_stub
    return {
        "qvn_block": reference_loader.load("mridc.collections.quantitative.nn.qvarnet.qvn_block"),
        "unet_block": reference_loader.load("mridc.collections.reconstruction.nn.unet_base.unet_block"),
    }


def _run_reference(ref_mods, blocks_sd, y, sens, mask, maps_init, gamma, TEs, chans, pools):
    """The reference qvn.py:210-245 threading loop, executed with the
    reference's own block code."""
    blocks = []
    for sd in blocks_sd:
        block = ref_mods["qvn_block"].qVarNetBlock(
            ref_mods["unet_block"].NormUnet(
                chans=chans, num_pools=pools, in_chans=8, out_chans=8, padding_size=11, normalize=True
            ),
            fft_centered=True,
            fft_normalization="ortho",
            spatial_dims=[-2, -1],
            coil_dim=1,
            no_dc=False,
        )
        block.load_state_dict(sd)
        blocks.append(block.eval())

    g = torch.tensor(gamma)
    R2, S0, B0, PH = (torch.tensor(maps_init[..., i]) / g[i] for i in range(4))
    yt = torch.tensor(y)
    st = torch.tensor(sens)
    mt = torch.tensor(mask)
    prediction = None
    with torch.no_grad():
        for block in blocks:
            prediction = block(yt, R2, S0, B0, PH, TEs, st, mt, prediction, g)
            final_prediction = prediction
            R2 = torch.view_as_complex(prediction[:, 0].contiguous())
            S0 = torch.view_as_complex(prediction[:, 1].contiguous())
            B0 = torch.view_as_complex(prediction[:, 2].contiguous())
            PH = torch.view_as_complex(prediction[:, 3].contiguous())
            prediction = torch.stack([abs(R2), abs(S0), abs(B0), abs(PH)], dim=1)
    return final_prediction.numpy()


def test_qvn_complex_threading_matches_reference(ref_mods):
    from mridc_tpu.models import build_model
    from mridc_tpu.utils.torch_import import import_normunet_params

    torch.manual_seed(3)
    # E != C on purpose: the reference's sens-reduction sums over the ECHO
    # axis (its coil_dim=1 quirk) — with equal axis lengths a coil-axis sum
    # would go undetected
    B, E, C, H, W = 1, 3, 4, 16, 16
    chans, pools, n_casc = 4, 2, 2
    gamma = [150.0, 150.0, 600.0, 150.0]
    TEs = [3.0, 11.5, 20.0]
    rng = np.random.default_rng(5)
    y = rng.standard_normal((B, E, C, H, W, 2)).astype(np.float32)
    sens = rng.standard_normal((B, C, H, W, 2)).astype(np.float32)
    sens /= np.sqrt((sens**2).sum(axis=(1, -1), keepdims=True))
    mask = np.ones((B, 1, 1, H, W, 1), np.float32)
    mask[..., ::3, :] = 0.0
    maps_init = np.abs(rng.standard_normal((B, H, W, 4))).astype(np.float32) * np.asarray(
        [40.0, 1.0, 50.0, 1.0], np.float32
    )

    # reference blocks with randomized dc weights
    blocks_sd = []
    for i in range(n_casc):
        torch.manual_seed(10 + i)
        block = ref_mods["qvn_block"].qVarNetBlock(
            ref_mods["unet_block"].NormUnet(
                chans=chans, num_pools=pools, in_chans=8, out_chans=8, padding_size=11, normalize=True
            ),
            fft_centered=True,
            fft_normalization="ortho",
            spatial_dims=[-2, -1],
            coil_dim=1,
        )
        with torch.no_grad():
            block.dc_weight.copy_(torch.tensor([0.5 + 0.3 * i]))
        blocks_sd.append({k: v.clone() for k, v in block.state_dict().items()})

    ref_out = _run_reference(
        ref_mods, blocks_sd, y, sens, mask, maps_init, gamma, TEs, chans, pools
    )  # [B, 4, H, W, 2]

    model = build_model(
        {
            "model_name": "qVN",
            "quantitative_module_num_cascades": n_casc,
            "quantitative_module_channels": chans,
            "quantitative_module_pooling_layers": pools,
            "quantitative_module_padding_size": 11,
            "quantitative_module_gamma_regularization_factors": gamma,
            "fft_centered": True,
            "fft_normalization": "ortho",
        }
    )
    assert model.map_threading == "complex"
    params = {}
    for i, sd in enumerate(blocks_sd):
        state = {k: v.numpy() for k, v in sd.items()}
        params[f"dc_weight_{i}"] = jnp.asarray(state["dc_weight"])
        params[f"NormUnet_{i}"] = import_normunet_params(state, chans=chans, num_pools=pools, prefix="model.unet.")

    out = model.apply(
        {"params": params},
        jnp.asarray(y),
        jnp.asarray(sens),
        jnp.asarray(mask),
        jnp.asarray(maps_init),
        jnp.asarray(TEs, jnp.float32),
    )
    jax_final = np.asarray(out.intermediates)  # [B, 4, H, W, 2] raw cascade output
    # f32 FFT/conv drift through 2 cascades differs slightly between torch and
    # XLA; the bulk must be tight and the tail bounded
    rel = np.abs(jax_final - ref_out) / (np.abs(ref_out) + 1e-2)
    assert np.quantile(rel, 0.99) < 5e-4, f"99% quantile rel err {np.quantile(rel, 0.99):.2e}"
    np.testing.assert_allclose(jax_final, ref_out, rtol=5e-3, atol=1e-3)

    # the returned maps are |final complex maps| * per-map gamma
    mag = np.sqrt(ref_out[..., 0] ** 2 + ref_out[..., 1] ** 2)  # [B, 4, H, W]
    expected_maps = np.moveaxis(mag, 1, -1) * np.asarray(gamma, np.float32)
    np.testing.assert_allclose(np.asarray(out.prediction), expected_maps, rtol=5e-3, atol=1e-3)


def test_megre_signal_complex_reduces_to_real():
    from mridc_tpu.models.quantitative.signal_model import megre_signal, megre_signal_complex

    rng = np.random.default_rng(0)
    B, H, W = 2, 8, 8
    maps = [jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32) for _ in range(4)]
    tes = [3.0, 11.5, 20.0, 28.5]
    real_out = megre_signal(*maps, tes)
    cv = [jnp.stack([m, jnp.zeros_like(m)], -1) for m in maps]
    complex_out = megre_signal_complex(*cv, tes)
    np.testing.assert_allclose(np.asarray(complex_out), np.asarray(real_out), rtol=1e-5, atol=1e-6)


def test_megre_signal_complex_matches_torch_complex():
    """Complex-map inputs vs the reference MEGRESignalModel run on torch
    complex tensors (the qvn.py cascade>=1 regime)."""
    import ast as _ast

    src = open("/root/reference/mridc/collections/quantitative/nn/base.py").read()
    tree = _ast.parse(src)
    cls_src = next(
        _ast.get_source_segment(src, n)
        for n in tree.body
        if isinstance(n, _ast.ClassDef) and n.name == "SignalForwardModel"
    )
    from typing import List, Optional, Union

    ns = {"torch": torch, "Union": Union, "Optional": Optional, "List": List}
    exec(cls_src, ns)  # noqa: S102
    fwd = ns["SignalForwardModel"](sequence="MEGRE")

    rng = np.random.default_rng(1)
    B, H, W = 1, 8, 8
    tes = [3.0, 11.5, 20.0, 28.5]
    maps_c = rng.standard_normal((4, B, H, W)) + 1j * rng.standard_normal((4, B, H, W))
    maps_t = [torch.tensor(m.astype(np.complex64)) for m in maps_c]
    ref = fwd(maps_t[0], maps_t[1], maps_t[2], maps_t[3], torch.tensor(tes)).numpy()

    from mridc_tpu.models.quantitative.signal_model import megre_signal_complex

    cv = [
        jnp.stack([jnp.asarray(m.real, jnp.float32), jnp.asarray(m.imag, jnp.float32)], -1)
        for m in maps_c
    ]
    out = np.asarray(megre_signal_complex(*cv, tes))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)
