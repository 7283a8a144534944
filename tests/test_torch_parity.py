"""Golden weight-level parity: reference (torch) CIRIM forward vs flax CIRIM
with imported weights.

The torch side re-states the reference compute graph exactly
(reference: mridc/collections/reconstruction/nn/rim/{rim_block,rim_utils,
conv_layers,rnn_cells}.py — replication-padded convs, IndRNN cells,
log-likelihood gradient DC, 8 time steps, keep_prediction cascades) with
reference-format state-dict keys, which are then imported through
mridc_tpu.utils.torch_import.
"""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mridc_tpu.models import build_model
from mridc_tpu.utils.torch_import import import_cirim_params

B, C, H, W = 1, 3, 24, 24
CASCADES, T, F = 2, 8, 8


class _TorchRIM(torch.nn.Module):
    """Reference-faithful CIRIM forward (IndRNN, conv filters [F, F, 2])."""

    def __init__(self):
        super().__init__()
        self.cirim = torch.nn.ModuleList()
        for _ in range(CASCADES):
            block = torch.nn.Module()
            layer0 = torch.nn.Module()
            layer0.convs = torch.nn.Module()
            layer0.convs.conv_layer = torch.nn.Conv2d(4, F, 5, padding=0, bias=True)
            layer0.rnn = torch.nn.Module()
            layer0.rnn.ih = torch.nn.Conv2d(F, F, 1, bias=True)
            layer0.rnn.hh = torch.nn.Parameter(torch.randn(1, F, 1, 1) * 0.1)
            layer1 = torch.nn.Module()
            layer1.convs = torch.nn.Module()
            layer1.convs.conv_layer = torch.nn.Conv2d(F, F, 3, padding=0, dilation=2, bias=True)
            layer1.rnn = torch.nn.Module()
            layer1.rnn.ih = torch.nn.Conv2d(F, F, 1, bias=True)
            layer1.rnn.hh = torch.nn.Parameter(torch.randn(1, F, 1, 1) * 0.1)
            block.layers = torch.nn.ModuleList([layer0, layer1])
            final = torch.nn.Module()
            final.conv_layer = torch.nn.Conv2d(F, 2, 3, padding=0, bias=False)
            block.final_layer = torch.nn.ModuleList([final])
            self.cirim.append(block)

    @staticmethod
    def _fft2c(x):
        return torch.fft.fftshift(
            torch.fft.fft2(torch.fft.ifftshift(x, dim=(-2, -1)), norm="ortho"), dim=(-2, -1)
        )

    @staticmethod
    def _ifft2c(x):
        return torch.fft.fftshift(
            torch.fft.ifft2(torch.fft.ifftshift(x, dim=(-2, -1)), norm="ortho"), dim=(-2, -1)
        )

    @staticmethod
    def _conv(layer, x, pad):
        x = torch.nn.functional.pad(x, (pad, pad, pad, pad), mode="replicate")
        return layer(x)

    def forward(self, y, sens, mask):
        eta = (self._ifft2c(y) * sens.conj()).sum(1)
        for block in self.cirim:
            h0 = torch.zeros(B, F, H, W)
            h1 = torch.zeros(B, F, H, W)
            for _ in range(T):
                pred_k = self._fft2c(eta.unsqueeze(1) * sens)
                resid = self._ifft2c(mask * (pred_k - y))
                grad = (resid * sens.conj()).sum(1)
                x = torch.stack([eta.real, eta.imag, grad.real, grad.imag], 1)
                x = torch.relu(self._conv(block.layers[0].convs.conv_layer, x, 2))
                h0 = torch.relu(block.layers[0].rnn.ih(x) + block.layers[0].rnn.hh * h0)
                x = torch.relu(self._conv(block.layers[1].convs.conv_layer, h0, 2))
                h1 = torch.relu(block.layers[1].rnn.ih(x) + block.layers[1].rnn.hh * h1)
                dx = self._conv(block.final_layer[0].conv_layer, h1, 1)
                eta = eta + torch.complex(dx[:, 0], dx[:, 1])
        return eta


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    y = (rng.standard_normal((B, C, H, W)) + 1j * rng.standard_normal((B, C, H, W))).astype(np.complex64)
    sens = (rng.standard_normal((B, C, H, W)) + 1j * rng.standard_normal((B, C, H, W))).astype(np.complex64)
    sens /= np.sqrt((np.abs(sens) ** 2).sum(1, keepdims=True))
    mask = (rng.random((B, 1, H, W)) < 0.5).astype(np.float32)
    return y, sens, mask


def test_cirim_weight_parity_with_torch(data):
    y, sens, mask = data
    torch.manual_seed(0)
    ref = _TorchRIM().eval()
    with torch.no_grad():
        want = ref(torch.from_numpy(y), torch.from_numpy(sens), torch.from_numpy(mask)).numpy()

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = import_cirim_params(state, CASCADES)

    cfg = {
        "model_name": "CIRIM",
        "num_cascades": CASCADES,
        "time_steps": T,
        "recurrent_layer": "IndRNN",
        "conv_filters": [F, F, 2],
        "conv_kernels": [5, 3, 3],
        "conv_dilations": [1, 2, 1],
        "conv_bias": [True, True, False],
        "recurrent_filters": [F, F, 0],
        "recurrent_kernels": [1, 1, 0],
        "recurrent_dilations": [1, 1, 0],
        "fft_centered": True,
        "fft_normalization": "ortho",
    }
    model = build_model(cfg)
    rv = lambda x: np.stack([x.real, x.imag], -1).astype(np.float32)  # noqa: E731
    out = model.apply({"params": params}, jnp.asarray(rv(y)), jnp.asarray(rv(sens)), jnp.asarray(mask))
    got = np.asarray(out.prediction)
    got_c = got[..., 0] + 1j * got[..., 1]
    np.testing.assert_allclose(got_c, want, rtol=2e-3, atol=2e-4)
