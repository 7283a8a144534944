"""Trained-checkpoint interop proof (VERDICT r4 #6).

Trains the reference's REAL RIMBlock graph (loaded from /root/reference) for a
few torch optimizer steps on a synthetic recon task, saves a reference-format
``.mridc`` archive (``model_config.yaml`` + ``model_weights.ckpt`` — exactly
what mridc/core/connectors/save_restore_connector.py:32-56 writes), registers
it in the pretrained registry, restores it through ``from_pretrained`` (which
converts the torch weights via utils/torch_import.py), and checks the restored
model reproduces the trained reference's reconstruction and its SSIM.

Downloading a real wdika cloud checkpoint was attempted on 2026-08-19 and is
blocked in this environment (no DNS egress: huggingface.co and api.github.com
both fail with "Name or service not known"), so the trained archive is
generated locally in-test — the fallback VERDICT r4 #6 prescribes. The
reference registers no concrete PretrainedModelInfo entries itself (verified:
no ``PretrainedModelInfo(`` constructor calls under /root/reference/mridc), so
local/URL archives are the entire from_pretrained surface to match.
"""

import io
import tarfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp
import yaml

import reference_loader

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    return {
        "fft": reference_loader.load("mridc.collections.common.parts.fft"),
        "rim_block": reference_loader.load("mridc.collections.reconstruction.nn.rim.rim_block"),
    }


def _make_task(ref, b=1, c=3, h=16, w=16, seed=11):
    """Synthetic learnable recon task: smooth complex image -> coil kspace ->
    1D-ish mask. Returns torch tensors (y, sens, mask, target_rv)."""
    rng = np.random.default_rng(seed)
    # smooth image: low-pass filtered noise
    x = rng.standard_normal((b, h, w)) + 1j * rng.standard_normal((b, h, w))
    k = np.fft.fftshift(np.fft.fft2(x), axes=(-2, -1))
    lp = np.zeros((h, w))
    lp[h // 2 - 3 : h // 2 + 3, w // 2 - 3 : w // 2 + 3] = 1.0
    x = np.fft.ifft2(np.fft.ifftshift(k * lp, axes=(-2, -1)))
    x = (x / np.abs(x).max()).astype(np.complex64)
    sens = rng.standard_normal((b, c, h, w)) + 1j * rng.standard_normal((b, c, h, w))
    sens /= np.sqrt((np.abs(sens) ** 2).sum(1, keepdims=True))
    coil = x[:, None] * sens.astype(np.complex64)
    coil_rv = torch.from_numpy(np.stack([coil.real, coil.imag], -1).astype(np.float32))
    kfull = ref["fft"].fft2(coil_rv, centered=True, normalization="ortho", spatial_dims=[-2, -1])
    mask = np.zeros((1, 1, h, w, 1), np.float32)
    mask[..., ::2, :] = 1.0
    mask[..., w // 2 - 3 : w // 2 + 3, :] = 1.0
    mask_t = torch.from_numpy(mask)
    y = kfull * mask_t
    sens_rv = torch.from_numpy(np.stack([sens.real, sens.imag], -1).astype(np.float32))
    target_rv = torch.from_numpy(np.stack([x.real, x.imag], -1).astype(np.float32))
    return y, sens_rv, mask_t, target_rv


class _TorchCIRIM(torch.nn.Module):
    """The reference CIRIM body: ``self.cirim`` ModuleList of RIMBlocks — the
    exact parameter namespace (``cirim.{i}...``) the full reference model
    saves (mridc/collections/reconstruction/nn/cirim.py:45-69)."""

    def __init__(self, rim_block_cls, num_cascades, time_steps):
        super().__init__()
        self.cirim = torch.nn.ModuleList(
            [
                rim_block_cls(
                    recurrent_layer="IndRNN",
                    conv_filters=[8, 8, 2], conv_kernels=[5, 3, 3], conv_dilations=[1, 2, 1],
                    conv_bias=[True, True, False],
                    recurrent_filters=[8, 8, 0], recurrent_kernels=[1, 1, 0],
                    recurrent_dilations=[1, 1, 0], recurrent_bias=[True, True, False],
                    depth=2, time_steps=time_steps, no_dc=True,
                    fft_centered=True, fft_normalization="ortho",
                    spatial_dims=[-2, -1], coil_dim=1,
                )
                for _ in range(num_cascades)
            ]
        )

    def forward(self, y, sens, mask):
        # the reference forward loop (cirim.py:105-127): prediction threads
        # through cascades, hidden state resets, keep_prediction from casc 1
        prediction = y.clone()
        preds = None
        for i, blk in enumerate(self.cirim):
            prediction, _ = blk(
                prediction, y, sens, mask,
                prediction=None, hx=None, sigma=1.0,
                keep_prediction=False if i == 0 else True,
            )
            preds = prediction
        return preds[-1]  # final cascade, final time step: [B, H, W, 2]


def _save_reference_archive(path, model, cfg):
    """Write a reference-format .mridc: model_config.yaml + model_weights.ckpt
    (torch pickle), the layout of save_restore_connector.save_to."""
    ckpt = io.BytesIO()
    torch.save({"state_dict": model.state_dict()}, ckpt)
    cfg_bytes = yaml.safe_dump(cfg, sort_keys=False).encode()
    with tarfile.open(path, "w:gz") as tar:
        for name, data in (("model_config.yaml", cfg_bytes), ("model_weights.ckpt", ckpt.getvalue())):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    return path


def test_trained_reference_archive_roundtrip(ref, tmp_path):
    """Train reference RIMBlocks -> .mridc -> from_pretrained -> same recon."""
    from mridc_tpu.metrics.reconstruction import ssim
    from mridc_tpu.models.pretrained import (
        PretrainedModelInfo,
        from_pretrained,
        get_available_model_names,
        register_pretrained_model,
    )

    torch.manual_seed(42)
    net = _TorchCIRIM(ref["rim_block"].RIMBlock, num_cascades=2, time_steps=4)
    y, sens, mask, target = _make_task(ref)

    opt = torch.optim.Adam(net.parameters(), lr=3e-3)
    losses = []
    for _ in range(30):
        opt.zero_grad()
        out = net(y, sens, mask)
        loss = torch.nn.functional.l1_loss(out, target)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    assert losses[-1] < losses[0] * 0.9, f"reference training did not converge: {losses}"

    net.eval()
    with torch.no_grad():
        want = net(y, sens, mask).numpy()

    # reference model_config.yaml carries the whole model cfg including the
    # dataloader/optim subtrees — the restore must tolerate them
    cfg = {
        "model_name": "CIRIM",
        "num_cascades": 2, "time_steps": 4,
        "recurrent_layer": "IndRNN",
        "conv_filters": [8, 8, 2], "conv_kernels": [5, 3, 3], "conv_dilations": [1, 2, 1],
        "recurrent_filters": [8, 8, 0], "recurrent_kernels": [1, 1, 0],
        "recurrent_dilations": [1, 1, 0],
        "no_dc": True, "keep_prediction": True,
        "fft_centered": True, "fft_normalization": "ortho",
        "coil_combination_method": "SENSE",
        "train_ds": {"data_path": "/does/not/matter", "batch_size": 1},
        "optim": {"name": "adam", "lr": 0.001},
    }
    path = _save_reference_archive(tmp_path / "cirim_trained.mridc", net, cfg)

    info = register_pretrained_model(
        PretrainedModelInfo(
            pretrained_model_name="cirim_trained_local_fixture",
            description="reference RIMBlock x2, trained 12 steps in torch (local interop fixture)",
            location=str(path),
        )
    )
    assert info.pretrained_model_name in get_available_model_names()

    model, params, rcfg = from_pretrained("cirim_trained_local_fixture")
    assert rcfg["num_cascades"] == 2
    got = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(y.numpy()), jnp.asarray(sens.numpy()), jnp.asarray(mask.numpy()[..., 0]),
        ).prediction
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

    def mag(x):
        m = np.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
        return m / m.max()

    # the restored model reproduces the trained reference's quality: SSIM of
    # the two reconstructions, and SSIM-vs-target agreement to < 1e-3
    assert ssim(mag(want), mag(got)) >= 0.999
    s_ref = ssim(mag(target.numpy()), mag(want))
    s_ours = ssim(mag(target.numpy()), mag(got))
    assert abs(s_ref - s_ours) < 1e-3, (s_ref, s_ours)


def test_reference_archive_via_direct_path(ref, tmp_path):
    """from_pretrained also takes a bare path to a reference torch archive
    (no registry entry), the reference's restore_from(path) equivalent."""
    from mridc_tpu.models.pretrained import from_pretrained

    torch.manual_seed(7)
    net = _TorchCIRIM(ref["rim_block"].RIMBlock, num_cascades=1, time_steps=4).eval()
    y, sens, mask, _ = _make_task(ref, seed=5)
    with torch.no_grad():
        want = net(y, sens, mask).numpy()
    cfg = {
        "model_name": "CIRIM", "num_cascades": 1, "time_steps": 4,
        "conv_filters": [8, 8, 2], "recurrent_filters": [8, 8, 0],
        "no_dc": True, "fft_centered": True, "fft_normalization": "ortho",
    }
    path = _save_reference_archive(tmp_path / "cirim_rand.mridc", net, cfg)
    model, params, _ = from_pretrained(str(path))
    got = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(y.numpy()), jnp.asarray(sens.numpy()), jnp.asarray(mask.numpy()[..., 0]),
        ).prediction
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
