"""Golden parity for the SERANet stack against the reference's actual torch
modules: ConvLSTM cell/stack (seranet_base/convlstm.py:12,107),
ConvLSTMNormUnet (convlstm_unet.py:13), AttentionGate
(segmentation/nn/attention_unet_base/attention_unet_block.py:10), SERANetDC
and SERANetRecurrentBlock (seranet_base/recon_block.py:12,240) — all with
imported weights."""

import pytest

pytestmark = pytest.mark.slow

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import reference_loader

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    mods = {}
    mods["convlstm"] = reference_loader.load("mridc.collections.multitask.rs.nn.seranet_base.convlstm")
    mods["convlstm_unet"] = reference_loader.load("mridc.collections.multitask.rs.nn.seranet_base.convlstm_unet")
    mods["recon_block"] = reference_loader.load("mridc.collections.multitask.rs.nn.seranet_base.recon_block")
    mods["attention"] = reference_loader.load(
        "mridc.collections.segmentation.nn.attention_unet_base.attention_unet_block"
    )
    return mods


def _sd(module):
    return {k: v.numpy() for k, v in module.state_dict().items()}


def test_convlstm_cell_matches_reference(ref):
    from mridc_tpu.nn.convlstm import ConvLSTMCell
    from mridc_tpu.utils.torch_import import import_convlstm_cell_params

    torch.manual_seed(0)
    tcell = ref["convlstm"].ConvLSTMCell(input_dim=3, hidden_dim=5, kernel_size=(3, 3), bias=True)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    h = rng.standard_normal((2, 5, 8, 8)).astype(np.float32)
    c = rng.standard_normal((2, 5, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want_h, want_c = tcell(torch.from_numpy(x), [torch.from_numpy(h), torch.from_numpy(c)])

    cell = ConvLSTMCell(hidden_dim=5, kernel_size=3)
    params = import_convlstm_cell_params(_sd(tcell))
    got_h, got_c = cell.apply(
        {"params": params},
        jnp.asarray(np.moveaxis(x, 1, -1)),
        (jnp.asarray(np.moveaxis(h, 1, -1)), jnp.asarray(np.moveaxis(c, 1, -1))),
    )
    np.testing.assert_allclose(np.moveaxis(np.asarray(got_h), -1, 1), want_h.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got_c), -1, 1), want_c.numpy(), rtol=1e-4, atol=1e-5)


def test_convlstm_sequence_matches_reference(ref):
    """Multi-step, zero-state ConvLSTM (the SERANet usage runs T=1; test T=4)."""
    from mridc_tpu.nn.convlstm import ConvLSTM
    from mridc_tpu.utils.torch_import import import_convlstm_cell_params

    torch.manual_seed(1)
    tnet = ref["convlstm"].ConvLSTM(input_dim=2, hidden_dim=4, kernel_size=3, num_layers=1, batch_first=True)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 2, 8, 8)).astype(np.float32)  # [B, T, C, H, W]
    with torch.no_grad():
        outs, _ = tnet(torch.from_numpy(x))
    want = outs[-1].numpy()  # [B, T, hidden, H, W]

    net = ConvLSTM(hidden_dim=4, kernel_size=3, num_layers=1)
    params = {"ConvLSTMCell_0": import_convlstm_cell_params(_sd(tnet), prefix="cell_list.0.")}
    got = net.apply({"params": params}, jnp.asarray(np.moveaxis(x, 2, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 2), want, rtol=1e-4, atol=1e-5)


def test_convlstm_normunet_matches_reference(ref):
    from mridc_tpu.nn.convlstm import ConvLSTMNormUnet
    from mridc_tpu.utils.torch_import import import_convlstm_unet_params

    torch.manual_seed(2)
    tnet = ref["convlstm_unet"].ConvLSTMNormUnet(chans=8, num_pools=2, in_chans=4, out_chans=3).eval()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4, 16, 16)).astype(np.float32)  # [B, C, H, W] real
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    net = ConvLSTMNormUnet(chans=8, num_pools=2, in_chans=4, out_chans=3)
    params = import_convlstm_unet_params(_sd(tnet), chans=8, num_pools=2)
    got = net.apply({"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, rtol=2e-3, atol=2e-4)


def test_attention_gate_matches_reference(ref):
    from mridc_tpu.nn.seg_blocks import AttentionGate
    from mridc_tpu.utils.torch_import import import_attention_gate_params

    torch.manual_seed(3)
    tgate = ref["attention"].AttentionGate(in_chans_x=6, in_chans_g=3, out_chans=3).eval()
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 6, 16, 16)).astype(np.float32)
    g = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)  # full-res g: exercises the downsample resize
    with torch.no_grad():
        want = tgate(torch.from_numpy(x), torch.from_numpy(g)).numpy()

    gate = AttentionGate(out_chans=3)
    params = import_attention_gate_params(_sd(tgate))
    got = gate.apply(
        {"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(np.moveaxis(g, 1, -1))
    )
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, rtol=1e-4, atol=1e-5)


def _mc_inputs(b=1, c=2, h=16, w=16, seed=5):
    rng = np.random.default_rng(seed)
    ref_k = rng.standard_normal((b, c, h, w, 2)).astype(np.float32)
    pred = rng.standard_normal((b, h, w, 2)).astype(np.float32)
    mask = (rng.random((b, 1, h, w, 1)) > 0.4).astype(np.float32)
    return pred, ref_k, mask


def test_seranet_dc_matches_reference(ref):
    from mridc_tpu.models.multitask.models import SERANetDC

    torch.manual_seed(4)
    tdc = ref["recon_block"].SERANetDC(fft_centered=True, fft_normalization="ortho", spatial_dims=[-2, -1])
    with torch.no_grad():
        tdc.dc_weight.fill_(1.37)
    pred, ref_k, mask = _mc_inputs()
    with torch.no_grad():
        want = tdc(
            torch.from_numpy(pred), torch.from_numpy(ref_k), torch.from_numpy(ref_k), torch.from_numpy(mask)
        ).numpy()

    dc = SERANetDC(fft_centered=True, fft_normalization="ortho")
    got = dc.apply(
        {"params": {"dc_weight": jnp.full((1,), 1.37)}},
        jnp.asarray(pred), jnp.asarray(ref_k), jnp.asarray(ref_k), jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_seranet_recurrent_block_matches_reference(ref):
    """Full SERANetRecurrentBlock (gate -> DC -> ConvLSTMNormUnet, 2 iterations)
    with imported weights (reference recon_block.py:240)."""
    from mridc_tpu.models.multitask.models import (
        SERANetDC,
        _channels_to_coils,
        _coils_to_channels,
    )
    from mridc_tpu.nn.convlstm import ConvLSTMNormUnet
    from mridc_tpu.nn.seg_blocks import AttentionGate
    from mridc_tpu.utils.torch_import import (
        import_attention_gate_params,
        import_convlstm_unet_params,
    )

    b, c, h, w, classes = 1, 2, 16, 16, 2
    torch.manual_seed(5)
    tblock = ref["recon_block"].SERANetRecurrentBlock(
        num_iterations=2,
        attention_model=ref["attention"].AttentionGate(in_chans_x=2 * c, in_chans_g=classes, out_chans=classes),
        unet_model=ref["convlstm_unet"].ConvLSTMNormUnet(chans=8, num_pools=2, in_chans=2 * c, out_chans=classes),
        fft_centered=True,
        fft_normalization="ortho",
        spatial_dims=[-2, -1],
    ).eval()

    rng = np.random.default_rng(6)
    pred_recon = rng.standard_normal((b, c, h, w, 2)).astype(np.float32)
    seg = rng.standard_normal((b, classes, h, w)).astype(np.float32)
    ref_k = rng.standard_normal((b, c, h, w, 2)).astype(np.float32)
    mask = (rng.random((b, 1, h, w, 1)) > 0.4).astype(np.float32)
    with torch.no_grad():
        want = tblock(
            torch.from_numpy(pred_recon),
            torch.from_numpy(seg),
            torch.from_numpy(ref_k),
            None,
            torch.from_numpy(mask),
        ).numpy()

    sd = _sd(tblock)
    gate = AttentionGate(out_chans=classes)
    gate_params = import_attention_gate_params(sd, prefix="recurrent_module_attention.")
    unet = ConvLSTMNormUnet(chans=8, num_pools=2, in_chans=2 * c, out_chans=classes)
    unet_params = import_convlstm_unet_params(sd, chans=8, num_pools=2, prefix="recurrent_module_unet.")
    dc = SERANetDC(fft_centered=True, fft_normalization="ortho")
    dc_params = {"dc_weight": jnp.asarray(sd["recurrent_module_dc.dc_weight"])}

    seg_j = jnp.asarray(np.moveaxis(seg, 1, -1))
    attention_map = seg_j
    prev = jnp.asarray(ref_k)
    for _ in range(2):
        gated = gate.apply({"params": gate_params}, _coils_to_channels(jnp.asarray(pred_recon)), attention_map * seg_j)
        att = _channels_to_coils(gated)
        att = dc.apply({"params": dc_params}, att, prev, jnp.asarray(ref_k), jnp.asarray(mask))
        prev = att
        attention_map = unet.apply({"params": unet_params}, _coils_to_channels(att))
    got = np.moveaxis(np.asarray(attention_map), -1, 1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
