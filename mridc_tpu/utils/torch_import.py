"""Import reference (PyTorch) checkpoints into mridc_tpu flax params.

Functional parity with reference checkpoint formats:
``.mridc`` tar archives contain ``model_weights.ckpt`` (torch state dict;
reference: mridc/core/connectors/save_restore_connector.py:60) and PTL
``.ckpt`` files carry the dict under ``state_dict``.

Conversions: conv weights OIHW -> HWIO; 1x1 recurrent convs likewise; IndRNN's
``hh`` [1, C, 1, 1] -> [1, 1, 1, C]. GRU/MGU gate order (r, z, n) matches the
reference's ``chunk(3, 1)`` ordering so no gate permutation is needed.
"""

from __future__ import annotations

import io
import tarfile
from typing import Dict

import numpy as np

__all__ = ["load_torch_state_dict", "oihw_to_hwio", "iohw_to_hwio_flipped", "import_cirim_params", "import_normunet_params", "import_varnet_params", "import_ccnn_params", "import_crnn_params", "import_didn_params", "import_convlstm_cell_params", "import_convlstm_unet_params", "import_attention_gate_params", "import_attention_unet_params", "oidhw_to_dhwio", "import_torch_batchnorm_params", "import_lambda_layer_params", "import_lambda_block_params", "import_lambda_unet_params", "import_vnet_params", "import_unet_basic_block_params", "import_unet_up_block_params", "import_dynunet_params", "import_vit_params", "import_unetr_params", "import_sensitivity_model_params", "import_residual_network_params", "import_rim_block_params", "import_unet_params", "import_idslr_encoder_params", "import_idslr_decoder_params", "import_conv_nonlinear_params", "iodhw_to_dhwio_flipped", "import_unet3d_params", "import_reference_model_params"]


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """Read a torch state dict from a .ckpt / .pt / .mridc archive as numpy."""
    import torch

    path = str(path)
    if path.endswith(".mridc") or tarfile.is_tarfile(path):
        with tarfile.open(path, "r:*") as tar:
            names = [n for n in tar.getnames() if n.endswith("model_weights.ckpt")]
            payload = tar.extractfile(names[0]).read()
        state = torch.load(io.BytesIO(payload), map_location="cpu", weights_only=False)
    else:
        state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in state.items() if hasattr(v, "detach")}


def oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def import_cirim_params(state: Dict[str, np.ndarray], num_cascades: int) -> Dict:
    """Build the flax param tree for :class:`mridc_tpu.models.recon.CIRIM` from
    a reference CIRIM state dict (keys ``cirim.{i}.layers.{h}...``,
    reference: mridc/collections/reconstruction/nn/rim/rim_block.py).

    Returns the stacked-cascade tree used by the nn.scan cascade axis.
    """

    def stack(key_fmt, convert):
        return np.stack([convert(state[key_fmt.format(i=i)]) for i in range(num_cascades)], 0)

    params = {
        "ScanCheckpoint_Cascade_0": {
            "RIMBlock_0": {
                "ScanCheckpoint_RIMStep_0": {
                    "ConvNonlinear_0": {
                        "Conv_0": {
                            "kernel": stack("cirim.{i}.layers.0.convs.conv_layer.weight", oihw_to_hwio),
                            "bias": stack("cirim.{i}.layers.0.convs.conv_layer.bias", lambda x: x),
                        }
                    },
                    "ConvNonlinear_1": {
                        "Conv_0": {
                            "kernel": stack("cirim.{i}.layers.1.convs.conv_layer.weight", oihw_to_hwio),
                            "bias": stack("cirim.{i}.layers.1.convs.conv_layer.bias", lambda x: x),
                        }
                    },
                    "ConvNonlinear_2": {
                        "Conv_0": {
                            "kernel": stack("cirim.{i}.final_layer.0.conv_layer.weight", oihw_to_hwio),
                        }
                    },
                    "IndRNNCell_0": {
                        "Conv_0": {
                            "kernel": stack("cirim.{i}.layers.0.rnn.ih.weight", oihw_to_hwio),
                            "bias": stack("cirim.{i}.layers.0.rnn.ih.bias", lambda x: x),
                        },
                        "hh": stack("cirim.{i}.layers.0.rnn.hh", lambda x: np.transpose(x, (0, 2, 3, 1))),
                    },
                    "IndRNNCell_1": {
                        "Conv_0": {
                            "kernel": stack("cirim.{i}.layers.1.rnn.ih.weight", oihw_to_hwio),
                            "bias": stack("cirim.{i}.layers.1.rnn.ih.bias", lambda x: x),
                        },
                        "hh": stack("cirim.{i}.layers.1.rnn.hh", lambda x: np.transpose(x, (0, 2, 3, 1))),
                    },
                }
            }
        }
    }
    return params


def iohw_to_hwio_flipped(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kH, kW) -> flax ConvTranspose
    (kH, kW, in, out) with spatial flip (flax's transpose_kernel=False
    convention applies the kernel un-flipped to the dilated input)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def import_normunet_params(state: Dict[str, np.ndarray], chans: int, num_pools: int,
                           prefix: str = "unet.") -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.unet.NormUnet` from a reference
    fastMRI-style NormUnet state dict (reference
    mridc/collections/reconstruction/nn/unet_base/unet_block.py:11 ``NormUnet``,
    :145 ``Unet`` — ConvBlock convs at layers.0/layers.4, transpose convs at
    up_transpose_conv.{i}.layers.0, final 1x1 at up_conv.{last}.1)."""

    def conv(key):
        return {"kernel": oihw_to_hwio(state[prefix + key])}

    tree: Dict = {}
    blocks = 0
    for i in range(num_pools):
        tree[f"ConvBlock_{blocks}"] = {
            "Conv_0": conv(f"down_sample_layers.{i}.layers.0.weight"),
            "Conv_1": conv(f"down_sample_layers.{i}.layers.4.weight"),
        }
        blocks += 1
    tree[f"ConvBlock_{blocks}"] = {
        "Conv_0": conv("conv.layers.0.weight"),
        "Conv_1": conv("conv.layers.4.weight"),
    }
    blocks += 1
    for i in range(num_pools):
        tree[f"TransposeConvBlock_{i}"] = {
            "ConvTranspose_0": {"kernel": iohw_to_hwio_flipped(state[prefix + f"up_transpose_conv.{i}.layers.0.weight"])}
        }
        key0 = f"up_conv.{i}.layers.0.weight" if i < num_pools - 1 else f"up_conv.{i}.0.layers.0.weight"
        key1 = f"up_conv.{i}.layers.4.weight" if i < num_pools - 1 else f"up_conv.{i}.0.layers.4.weight"
        tree[f"ConvBlock_{blocks}"] = {"Conv_0": conv(key0), "Conv_1": conv(key1)}
        blocks += 1
    tree["Conv_0"] = {
        "kernel": oihw_to_hwio(state[prefix + f"up_conv.{num_pools - 1}.1.weight"]),
        "bias": state[prefix + f"up_conv.{num_pools - 1}.1.bias"],
    }
    return {"Unet_0": tree}


def import_varnet_params(state: Dict[str, np.ndarray], num_cascades: int, chans: int,
                         num_pools: int) -> Dict:
    """Flax param tree for :class:`mridc_tpu.models.recon.VarNet` from a
    reference E2EVN state dict (reference mridc/collections/reconstruction/nn/
    vn.py:39 ``cascades`` ModuleList of varnet/vn_block.py:11 ``VarNetBlock``:
    keys ``cascades.{i}.model.unet...`` + ``cascades.{i}.dc_weight``)."""
    tree: Dict = {}
    for i in range(num_cascades):
        sub = {k[len(f"cascades.{i}.model."):]: v for k, v in state.items()
               if k.startswith(f"cascades.{i}.model.")}
        tree[f"_VarNetBlock_{i}"] = {
            "dc_weight": state[f"cascades.{i}.dc_weight"],
            "NormUnet_0": import_normunet_params(sub, chans=chans, num_pools=num_pools),
        }
    return tree


def import_ccnn_params(state: Dict[str, np.ndarray], num_cascades: int, n_convs: int = 5) -> Dict:
    """Flax param tree for :class:`mridc_tpu.models.recon.CascadeNet` from a
    reference CascadeNet state dict (reference reconstruction/nn/ccnn.py:19,
    cascadenet/ccnn_block.py:11 + conv/conv2d.py: Sequential of Conv2d with a
    single PReLU module instance shared across layers via the mutable default
    argument — its one alpha is broadcast to every per-layer prelu here)."""
    tree: Dict = {}
    for i in range(num_cascades):
        prefix = f"cascades.{i}.model.conv."
        # sequential indices: conv at 2*j (no batchnorm), prelu between
        casc: Dict = {}
        for j in range(n_convs):
            casc[f"Conv_{j}"] = {
                "kernel": oihw_to_hwio(state[prefix + f"{2 * j}.weight"]),
                "bias": state[prefix + f"{2 * j}.bias"],
            }
        alpha_keys = [k for k in state if k.startswith(prefix) and k.endswith(".weight") and
                      state[k].ndim == 1 and state[k].size == 1]
        alpha = state[alpha_keys[0]] if alpha_keys else np.full((1,), 0.25, np.float32)
        for j in range(n_convs - 1):
            casc[f"prelu_{j}"] = np.asarray(alpha, np.float32).reshape(1)
        tree[f"Conv2dCascade_{i}"] = casc
        tree[f"dc_weight_{i}"] = state[f"cascades.{i}.dc_weight"]
    return tree


def import_crnn_params(state: Dict[str, np.ndarray], n_convs: int = 3,
                       prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.models.recon.CRNNet` from a
    reference RecurrentConvolutionalNetBlock state dict (reference
    convrecnet/crnn_block.py:33 — ONE conv stack + dc_weight shared across all
    iterations; ours broadcasts the same params through `nn.scan`)."""
    casc: Dict = {}
    for j in range(n_convs):
        casc[f"Conv_{j}"] = {
            "kernel": oihw_to_hwio(state[prefix + f"model.conv.{2 * j}.weight"]),
            "bias": state[prefix + f"model.conv.{2 * j}.bias"],
        }
    alpha_keys = [k for k in state if k.startswith(prefix + "model.conv.") and
                  state[k].ndim == 1 and state[k].size == 1 and k.endswith(".weight")]
    alpha = state[alpha_keys[0]] if alpha_keys else np.full((1,), 0.25, np.float32)
    for j in range(n_convs - 1):
        casc[f"prelu_{j}"] = np.asarray(alpha, np.float32).reshape(1)
    return {"Scan_CRNNIter_0": {"Conv2dCascade_0": casc, "dc_weight": state[prefix + "dc_weight"]}}


def import_didn_params(state: Dict[str, np.ndarray], num_dubs: int, num_convs_recon: int,
                       prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.didn.DIDN` from a reference
    DIDN state dict (reference reconstruction/nn/didn/didn.py:242 — conv_in/
    down, DUBs (:104), ONE shared recon block (:54), recon_agg, conv, subpixel
    up2, conv_out)."""

    def pconv(conv_key, prelu_key=None):
        out = {"Conv_0": {"kernel": oihw_to_hwio(state[prefix + conv_key + ".weight"]),
                          "bias": state[prefix + conv_key + ".bias"]}}
        if prelu_key is not None:
            out["prelu"] = np.asarray(state[prefix + prelu_key + ".weight"], np.float32).reshape(1)
        return out

    def subpixel(conv_key):
        return {"Conv_0": {"kernel": oihw_to_hwio(state[prefix + conv_key + ".weight"]),
                           "bias": state[prefix + conv_key + ".bias"]}}

    tree: Dict = {
        "_PConv_0": pconv("conv_in.0", "conv_in.1"),
        "_PConv_1": pconv("down"),
    }
    for i in range(num_dubs):
        d = f"dubs.{i}."
        tree[f"DUB_{i}"] = {
            "_PConv_0": pconv(d + "conv1_1.0", d + "conv1_1.1"),
            "_PConv_1": pconv(d + "conv1_1.2", d + "conv1_1.3"),
            "_PConv_2": pconv(d + "down1"),
            "_PConv_3": pconv(d + "conv2_1.0", d + "conv2_1.1"),
            "_PConv_4": pconv(d + "down2"),
            "_PConv_5": pconv(d + "conv3_1.0", d + "conv3_1.1"),
            "Subpixel_0": subpixel(d + "up1.0.conv"),
            "Conv_0": {"kernel": oihw_to_hwio(state[prefix + d + "conv_agg_1.weight"]),
                       "bias": state[prefix + d + "conv_agg_1.bias"]},
            "_PConv_6": pconv(d + "conv2_2.0", d + "conv2_2.1"),
            "Subpixel_1": subpixel(d + "up2.0.conv"),
            "Conv_1": {"kernel": oihw_to_hwio(state[prefix + d + "conv_agg_2.weight"]),
                       "bias": state[prefix + d + "conv_agg_2.bias"]},
            "_PConv_7": pconv(d + "conv1_2.0", d + "conv1_2.1"),
            "_PConv_8": pconv(d + "conv1_2.2", d + "conv1_2.3"),
            "_PConv_9": pconv(d + "conv_out.0", d + "conv_out.1"),
        }
    recon: Dict = {}
    for j in range(num_convs_recon - 1):
        recon[f"_PConv_{j}"] = pconv(f"recon_block.convs.{j}.0", f"recon_block.convs.{j}.1")
    recon[f"_PConv_{num_convs_recon - 1}"] = pconv(f"recon_block.convs.{num_convs_recon - 1}")
    tree["ReconBlock_0"] = recon
    tree["Conv_0"] = {"kernel": oihw_to_hwio(state[prefix + "recon_agg.weight"]),
                      "bias": state[prefix + "recon_agg.bias"]}
    tree["_PConv_2"] = pconv("conv.0", "conv.1")
    tree["Subpixel_0"] = subpixel("up2.conv")
    tree["_PConv_3"] = pconv("conv_out")
    return tree


def import_convlstm_cell_params(state: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.convlstm.ConvLSTMCell` from a
    reference ConvLSTMCell state dict (reference multitask/rs/nn/seranet_base/
    convlstm.py:12 — single 4-gate conv over [x, h])."""
    out = {"kernel": oihw_to_hwio(state[prefix + "conv.weight"])}
    if prefix + "conv.bias" in state:
        out["bias"] = state[prefix + "conv.bias"]
    return {"Conv_0": out}


def import_convlstm_unet_params(state: Dict[str, np.ndarray], chans: int, num_pools: int,
                                prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.convlstm.ConvLSTMNormUnet`
    from a reference ConvLSTMNormUnet state dict (reference
    seranet_base/convlstm_unet.py:13: ``convlstm.cell_list.0.conv`` +
    fastMRI ``unet.*``)."""
    sub = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)} if prefix else dict(state)
    return {
        "ConvLSTM_0": {
            "ConvLSTMCell_0": import_convlstm_cell_params(sub, prefix="convlstm.cell_list.0.")
        },
        **import_normunet_params(sub, chans=chans, num_pools=num_pools, prefix="unet."),
    }


def import_attention_gate_params(state: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.seg_blocks.AttentionGate`
    (reference segmentation/nn/attention_unet_base/attention_unet_block.py:10:
    ``W_x.0`` strided conv, ``W_g.0`` 1x1, ``psi.0`` 1x1)."""
    return {
        "Conv_0": {"kernel": oihw_to_hwio(state[prefix + "W_x.0.weight"])},
        "Conv_1": {"kernel": oihw_to_hwio(state[prefix + "W_g.0.weight"]),
                   "bias": state[prefix + "W_g.0.bias"]},
        "Conv_2": {"kernel": oihw_to_hwio(state[prefix + "psi.0.weight"]),
                   "bias": state[prefix + "psi.0.bias"]},
    }


def import_attention_unet_params(state: Dict[str, np.ndarray], chans: int, num_pools: int,
                                 prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.seg_blocks.AttentionUnet`
    (reference attention_unet_block.py:67: fastMRI trunks + per-level gates;
    final level is Sequential(ConvBlock, 1x1 Conv))."""

    def conv(key):
        return {"kernel": oihw_to_hwio(state[prefix + key])}

    tree: Dict = {}
    blocks = 0
    for i in range(num_pools):
        tree[f"ConvBlock_{blocks}"] = {
            "Conv_0": conv(f"down_sample_layers.{i}.layers.0.weight"),
            "Conv_1": conv(f"down_sample_layers.{i}.layers.4.weight"),
        }
        blocks += 1
    tree[f"ConvBlock_{blocks}"] = {
        "Conv_0": conv("conv.layers.0.weight"),
        "Conv_1": conv("conv.layers.4.weight"),
    }
    blocks += 1
    for i in range(num_pools):
        tree[f"AttentionGate_{i}"] = import_attention_gate_params(state, prefix=prefix + f"up_attention_gates.{i}.")
        tree[f"TransposeConvBlock_{i}"] = {
            "ConvTranspose_0": {"kernel": iohw_to_hwio_flipped(state[prefix + f"up_transpose_conv.{i}.layers.0.weight"])}
        }
        key0 = f"up_conv.{i}.layers.0.weight" if i < num_pools - 1 else f"up_conv.{i}.0.layers.0.weight"
        key1 = f"up_conv.{i}.layers.4.weight" if i < num_pools - 1 else f"up_conv.{i}.0.layers.4.weight"
        tree[f"ConvBlock_{blocks}"] = {"Conv_0": conv(key0), "Conv_1": conv(key1)}
        blocks += 1
    tree["Conv_0"] = {
        "kernel": oihw_to_hwio(state[prefix + f"up_conv.{num_pools - 1}.1.weight"]),
        "bias": state[prefix + f"up_conv.{num_pools - 1}.1.bias"],
    }
    return tree


def oidhw_to_dhwio(w: np.ndarray) -> np.ndarray:
    """torch Conv3d (out, in, kD, kH, kW) -> flax (kD, kH, kW, in, out)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def import_torch_batchnorm_params(state: Dict[str, np.ndarray], prefix: str) -> Dict:
    """Params for :class:`mridc_tpu.nn.layers.TorchBatchNorm` (scale/bias +
    frozen running stats) from torch BatchNorm keys."""
    return {
        "scale": state[prefix + "weight"],
        "bias": state[prefix + "bias"],
        "mean": state[prefix + "running_mean"],
        "var": state[prefix + "running_var"],
    }


def import_lambda_layer_params(state: Dict[str, np.ndarray], prefix: str = "",
                               temporal: bool = False) -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.seg_blocks.LambdaLayer`
    (reference segmentation/nn/lambda_unet_base/lambda_unet_block.py:11:
    ``to_q.0`` conv + ``to_q.1`` BN, ``to_k.0``, ``to_v.0`` + ``to_v.1`` BN,
    ``pos_conv`` Conv3d, optional ``temp_conv``)."""
    tree = {
        "Conv_0": {"kernel": oihw_to_hwio(state[prefix + "to_q.0.weight"])},
        "TorchBatchNorm_0": import_torch_batchnorm_params(state, prefix + "to_q.1."),
        "Conv_1": {"kernel": oihw_to_hwio(state[prefix + "to_k.0.weight"])},
        "Conv_2": {"kernel": oihw_to_hwio(state[prefix + "to_v.0.weight"])},
        "TorchBatchNorm_1": import_torch_batchnorm_params(state, prefix + "to_v.1."),
        "Conv_3": {"kernel": oidhw_to_dhwio(state[prefix + "pos_conv.weight"]),
                   "bias": state[prefix + "pos_conv.bias"]},
    }
    if temporal:
        tree["Conv_4"] = {"kernel": oihw_to_hwio(state[prefix + "temp_conv.weight"]),
                          "bias": state[prefix + "temp_conv.bias"]}
    return tree


def import_lambda_block_params(state: Dict[str, np.ndarray], prefix: str = "",
                               temporal: bool = False) -> Dict:
    """LambdaBlock = two LambdaLayers at ``layers.0`` / ``layers.4``
    (reference lambda_unet_block.py:134 Sequential layout)."""
    return {
        "LambdaLayer_0": import_lambda_layer_params(state, prefix + "layers.0.", temporal),
        "LambdaLayer_1": import_lambda_layer_params(state, prefix + "layers.4.", temporal),
    }


def import_lambda_unet_params(state: Dict[str, np.ndarray], num_pools: int,
                              prefix: str = "", temporal: bool = False) -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.seg_blocks.LambdaUnet`
    (reference lambda_unet_block.py:214)."""
    tree: Dict = {}
    blocks = 0
    for i in range(num_pools):
        tree[f"LambdaBlock_{blocks}"] = import_lambda_block_params(
            state, prefix + f"down_sample_layers.{i}.", temporal)
        blocks += 1
    tree[f"LambdaBlock_{blocks}"] = import_lambda_block_params(state, prefix + "conv.", temporal)
    blocks += 1
    for i in range(num_pools):
        tree[f"TransposeConvBlock_{i}"] = {
            "ConvTranspose_0": {"kernel": iohw_to_hwio_flipped(state[prefix + f"up_transpose_conv.{i}.layers.0.weight"])}
        }
        sub_prefix = f"up_conv.{i}." if i < num_pools - 1 else f"up_conv.{i}.0."
        tree[f"LambdaBlock_{blocks}"] = import_lambda_block_params(state, prefix + sub_prefix, temporal)
        blocks += 1
    tree["Conv_0"] = {
        "kernel": oihw_to_hwio(state[prefix + f"up_conv.{num_pools - 1}.1.weight"]),
        "bias": state[prefix + f"up_conv.{num_pools - 1}.1.bias"],
    }
    return tree


def import_vnet_params(state: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.seg_blocks.VNet` from a
    reference VNet state dict (reference segmentation/nn/vnet_base/
    vnet_block.py:260, medzoo fixed topology; BatchNorm running stats
    imported into TorchBatchNorm)."""

    def conv(key, bias=True):
        out = {"kernel": oihw_to_hwio(state[prefix + key + ".weight"])}
        if bias and prefix + key + ".bias" in state:
            out["bias"] = state[prefix + key + ".bias"]
        return out

    def bn(key):
        return import_torch_batchnorm_params(state, prefix + key + ".")

    def luconvs(base, n):
        out = {}
        for j in range(n):
            out[f"_LUConv_{j}"] = {
                "Conv_0": conv(f"{base}.{j}.layers.0"),
                "TorchBatchNorm_0": bn(f"{base}.{j}.layers.1"),
            }
        return out

    def down(name, convs):
        return {
            "Conv_0": conv(f"{name}.down_conv"),
            "TorchBatchNorm_0": bn(f"{name}.bn1"),
            **luconvs(f"{name}.ops", convs),
        }

    def up(name, convs):
        return {
            "ConvTranspose_0": {
                "kernel": iohw_to_hwio_flipped(state[prefix + f"{name}.up_conv.weight"]),
                "bias": state[prefix + f"{name}.up_conv.bias"],
            },
            "TorchBatchNorm_0": bn(f"{name}.bn1"),
            **luconvs(f"{name}.ops", convs),
        }

    return {
        "Conv_0": conv("in_tr.conv_block.0"),
        "TorchBatchNorm_0": bn("in_tr.conv_block.1"),
        "_VNetDown_0": down("down_tr32", 1),
        "_VNetDown_1": down("down_tr64", 2),
        "_VNetDown_2": down("down_tr128", 3),
        "_VNetDown_3": down("down_tr256", 2),
        "_VNetUp_0": up("up_tr256", 2),
        "_VNetUp_1": up("up_tr128", 2),
        "_VNetUp_2": up("up_tr64", 1),
        "_VNetUp_3": up("up_tr32", 1),
        "Conv_1": conv("out_tr.conv_block.0"),
        "TorchBatchNorm_1": bn("out_tr.conv_block.1"),
        "Conv_2": conv("out_tr.conv2"),
    }


def _monai_conv(state: Dict[str, np.ndarray], key: str) -> Dict:
    out = {"kernel": oihw_to_hwio(state[key + ".weight"])}
    if key + ".bias" in state:
        out["bias"] = state[key + ".bias"]
    return out


def import_unet_basic_block_params(state: Dict[str, np.ndarray], prefix: str = "",
                                   res: bool = False) -> Dict:
    """MONAI UnetBasicBlock/UnetResBlock (reference unetr_block.py:548/:355)."""
    tree = {
        "Conv_0": _monai_conv(state, prefix + "conv1.conv"),
        "Conv_1": _monai_conv(state, prefix + "conv2.conv"),
    }
    if res and prefix + "conv3.conv.weight" in state:
        tree["Conv_2"] = _monai_conv(state, prefix + "conv3.conv")
    return tree


def import_unet_up_block_params(state: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """MONAI UnetUpBlock (reference unetr_block.py:462)."""
    t = {"kernel": iohw_to_hwio_flipped(state[prefix + "transp_conv.conv.weight"])}
    if prefix + "transp_conv.conv.bias" in state:
        t["bias"] = state[prefix + "transp_conv.conv.bias"]
    return {
        "_TorchConvTranspose_0": {"ConvTranspose_0": t},
        "UnetBasicBlock_0": import_unet_basic_block_params(state, prefix + "conv_block."),
    }


def import_dynunet_params(state: Dict[str, np.ndarray], num_levels: int,
                          res_block: bool = False, deep_supr_num: int = 0,
                          prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.seg_blocks.DynUNet` from a
    reference DynUNet state dict (reference dynunet_base/dynunet_block.py:90;
    torch names input_block/downsamples.{i}/bottleneck/upsamples.{i} in
    deepest-first order/output_block/deep_supervision_heads.{i})."""
    block = "UnetResBlock" if res_block else "UnetBasicBlock"
    tree: Dict = {f"{block}_0": import_unet_basic_block_params(state, prefix + "input_block.", res_block)}
    for i in range(num_levels - 2):
        tree[f"{block}_{i + 1}"] = import_unet_basic_block_params(
            state, prefix + f"downsamples.{i}.", res_block)
    tree[f"{block}_{num_levels - 1}"] = import_unet_basic_block_params(
        state, prefix + "bottleneck.", res_block)
    out_blocks = 0
    for i in range(num_levels - 1):
        tree[f"UnetUpBlock_{i}"] = import_unet_up_block_params(state, prefix + f"upsamples.{i}.")
        j = num_levels - 2 - i
        if deep_supr_num and 0 < j <= deep_supr_num:
            # my forward meets heads deepest-first; MONAI heads list is index-1-first
            tree[f"UnetOutBlock_{out_blocks}"] = {
                "Conv_0": _monai_conv(state, prefix + f"deep_supervision_heads.{j - 1}.conv.conv")
            }
            out_blocks += 1
    tree[f"UnetOutBlock_{out_blocks}"] = {"Conv_0": _monai_conv(state, prefix + "output_block.conv.conv")}
    return tree


def _dense(state: Dict[str, np.ndarray], key: str) -> Dict:
    out = {"kernel": np.transpose(state[key + ".weight"])}
    if key + ".bias" in state:
        out["bias"] = state[key + ".bias"]
    return out


def import_vit_params(state: Dict[str, np.ndarray], num_layers: int = 12,
                      pos_embed: str = "conv", prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.seg_blocks.ViT` (reference
    vit_base/vit_block.py:17: patch_embedding + blocks.{i} + norm)."""
    pe: Dict = {"position_embeddings": state[prefix + "patch_embedding.position_embeddings"][:]}
    if pos_embed == "conv":
        pe["Conv_0"] = {
            "kernel": oihw_to_hwio(state[prefix + "patch_embedding.patch_embeddings.weight"]),
            "bias": state[prefix + "patch_embedding.patch_embeddings.bias"],
        }
    else:
        pe["Dense_0"] = _dense(state, prefix + "patch_embedding.patch_embeddings.1")
    tree: Dict = {"PatchEmbedding_0": pe}
    for i in range(num_layers):
        b = prefix + f"blocks.{i}."
        tree[f"TransformerBlock_{i}"] = {
            "SABlock_0": {
                "Dense_0": _dense(state, b + "attn.qkv"),
                "Dense_1": _dense(state, b + "attn.out_proj"),
            },
            "MLPBlock_0": {
                "Dense_0": _dense(state, b + "mlp.linear1"),
                "Dense_1": _dense(state, b + "mlp.linear2"),
            },
        }
    tree["_LayerNorm_0"] = {"scale": state[prefix + "norm.weight"], "bias": state[prefix + "norm.bias"]}
    return tree


def import_unetr_params(state: Dict[str, np.ndarray], res_block: bool = True,
                        conv_block: bool = True, prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.seg_blocks.UNETR` (reference
    unetr_block.py:635)."""
    block = "UnetResBlock" if res_block else "UnetBasicBlock"

    def basic(p):
        return import_unet_basic_block_params(state, p, res_block)

    def pr_up(p, num_layer):
        tree = {"_TorchConvTranspose_0": {"ConvTranspose_0": {
            "kernel": iohw_to_hwio_flipped(state[p + "transp_conv_init.conv.weight"])}}}
        for i in range(num_layer):
            tree[f"_TorchConvTranspose_{i + 1}"] = {"ConvTranspose_0": {
                "kernel": iohw_to_hwio_flipped(state[p + f"blocks.{i}.0.conv.weight"])}}
            if conv_block:
                tree[f"{block}_{i}"] = import_unet_basic_block_params(state, p + f"blocks.{i}.1.", res_block)
        return tree

    def up(p):
        return {
            "_TorchConvTranspose_0": {"ConvTranspose_0": {
                "kernel": iohw_to_hwio_flipped(state[p + "transp_conv.conv.weight"])}},
            f"{block}_0": import_unet_basic_block_params(state, p + "conv_block.", res_block),
        }

    # encoder1/2/3/4 wrap their block in UnetrBasicBlock.layer
    return {
        "ViT_0": import_vit_params(state, prefix=prefix + "vit."),
        f"{block}_0": basic(prefix + "encoder1.layer."),
        "UnetrPrUpBlock_0": pr_up(prefix + "encoder2.", 2),
        "UnetrPrUpBlock_1": pr_up(prefix + "encoder3.", 1),
        "UnetrPrUpBlock_2": pr_up(prefix + "encoder4.", 0),
        "UnetrUpBlock_0": up(prefix + "decoder5."),
        "UnetrUpBlock_1": up(prefix + "decoder4."),
        "UnetrUpBlock_2": up(prefix + "decoder3."),
        "UnetrUpBlock_3": up(prefix + "decoder2."),
        "UnetOutBlock_0": {"Conv_0": _monai_conv(state, prefix + "out.conv.conv")},
    }


def import_sensitivity_model_params(state: Dict[str, np.ndarray], chans: int,
                                    num_pools: int, prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.sens.SensitivityModel` from a
    reference BaseSensitivityModel state dict (common/nn/base.py:276:
    ``norm_unet.unet.*``)."""
    return {"NormUnet_0": import_normunet_params(state, chans=chans, num_pools=num_pools,
                                                 prefix=prefix + "norm_unet.unet.")}


def import_residual_network_params(state: Dict[str, np.ndarray], nb_res_blocks: int,
                                   prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.models.recon.resnet.ResidualNetwork`
    (reference resnet_base/resnet_block.py:12). Flax creation-order naming:
    Conv_0=conv1, per block Conv_{2i+1}=layers2.i (outer), Conv_{2i+2}=
    layers1.i (inner), then last_layer, final_layer."""
    tree: Dict = {"Conv_0": {"kernel": oihw_to_hwio(state[prefix + "conv1.weight"])}}
    for i in range(nb_res_blocks):
        tree[f"Conv_{2 * i + 1}"] = {"kernel": oihw_to_hwio(state[prefix + f"layers2.{i}.weight"])}
        tree[f"Conv_{2 * i + 2}"] = {"kernel": oihw_to_hwio(state[prefix + f"layers1.{i}.weight"])}
    tree[f"Conv_{2 * nb_res_blocks + 1}"] = {"kernel": oihw_to_hwio(state[prefix + "last_layer.weight"])}
    tree[f"Conv_{2 * nb_res_blocks + 2}"] = {"kernel": oihw_to_hwio(state[prefix + "final_layer.weight"])}
    return tree


def import_rim_block_params(state: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """Unstacked flax param tree for one :class:`mridc_tpu.nn.rim.RIMBlock`
    (reference rim/rim_block.py layout; used by MTLRS where blocks are
    separate modules rather than a scanned cascade axis)."""
    return {
        "ScanCheckpoint_RIMStep_0": {
            "ConvNonlinear_0": {"Conv_0": {
                "kernel": oihw_to_hwio(state[prefix + "layers.0.convs.conv_layer.weight"]),
                "bias": state[prefix + "layers.0.convs.conv_layer.bias"],
            }},
            "ConvNonlinear_1": {"Conv_0": {
                "kernel": oihw_to_hwio(state[prefix + "layers.1.convs.conv_layer.weight"]),
                "bias": state[prefix + "layers.1.convs.conv_layer.bias"],
            }},
            "ConvNonlinear_2": {"Conv_0": {
                "kernel": oihw_to_hwio(state[prefix + "final_layer.0.conv_layer.weight"]),
            }},
            "IndRNNCell_0": {
                "Conv_0": {"kernel": oihw_to_hwio(state[prefix + "layers.0.rnn.ih.weight"]),
                           "bias": state[prefix + "layers.0.rnn.ih.bias"]},
                "hh": np.transpose(state[prefix + "layers.0.rnn.hh"], (0, 2, 3, 1)),
            },
            "IndRNNCell_1": {
                "Conv_0": {"kernel": oihw_to_hwio(state[prefix + "layers.1.rnn.ih.weight"]),
                           "bias": state[prefix + "layers.1.rnn.ih.bias"]},
                "hh": np.transpose(state[prefix + "layers.1.rnn.hh"], (0, 2, 3, 1)),
            },
        }
    }


def import_unet_params(state: Dict[str, np.ndarray], num_pools: int, prefix: str = "") -> Dict:
    """Flax param tree for the bare fastMRI :class:`mridc_tpu.nn.unet.Unet`
    (reference unet_base/unet_block.py:145) — the NormUnet importer's inner
    tree without the NormUnet wrapper."""
    return import_normunet_params(state, chans=0, num_pools=num_pools, prefix=prefix)["Unet_0"]


def import_idslr_encoder_params(state: Dict[str, np.ndarray], num_pools: int, prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.models.multitask.blocks.UnetEncoder`
    from a reference idslr_block.UnetEncoder state dict (reference
    multitask/rs/nn/idslr_base/idslr_block.py:51 — ConvBlock convs at
    down_sample_layers.{i}.layers.{0,4}, bottleneck at conv.layers.{0,4})."""

    def conv(key):
        return {"kernel": oihw_to_hwio(state[prefix + key])}

    tree: Dict = {}
    for i in range(num_pools):
        tree[f"ConvBlock_{i}"] = {
            "Conv_0": conv(f"down_sample_layers.{i}.layers.0.weight"),
            "Conv_1": conv(f"down_sample_layers.{i}.layers.4.weight"),
        }
    tree[f"ConvBlock_{num_pools}"] = {
        "Conv_0": conv("conv.layers.0.weight"),
        "Conv_1": conv("conv.layers.4.weight"),
    }
    return tree


def import_idslr_decoder_params(state: Dict[str, np.ndarray], num_pools: int, prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.models.multitask.blocks.UnetDecoder`
    from a reference idslr_block.UnetDecoder state dict (reference
    idslr_block.py:193 — transpose convs at up_transpose_conv.{i}.layers.0,
    up convs at up_conv.{i}.layers.{0,4} (last level nested in a Sequential
    with the final 1x1 at up_conv.{last}.1))."""

    def conv(key):
        return {"kernel": oihw_to_hwio(state[prefix + key])}

    tree: Dict = {}
    for i in range(num_pools):
        tree[f"TransposeConvBlock_{i}"] = {
            "ConvTranspose_0": {
                "kernel": iohw_to_hwio_flipped(state[prefix + f"up_transpose_conv.{i}.layers.0.weight"])
            }
        }
        key0 = f"up_conv.{i}.layers.0.weight" if i < num_pools - 1 else f"up_conv.{i}.0.layers.0.weight"
        key1 = f"up_conv.{i}.layers.4.weight" if i < num_pools - 1 else f"up_conv.{i}.0.layers.4.weight"
        tree[f"ConvBlock_{i}"] = {"Conv_0": conv(key0), "Conv_1": conv(key1)}
    final = {"kernel": oihw_to_hwio(state[prefix + f"up_conv.{num_pools - 1}.1.weight"])}
    if prefix + f"up_conv.{num_pools - 1}.1.bias" in state:
        final["bias"] = state[prefix + f"up_conv.{num_pools - 1}.1.bias"]
    tree["Conv_0"] = final
    return tree


def import_conv_nonlinear_params(state: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.layers.ConvNonlinear` from a
    reference rim/conv_layers.py:44 ``ConvNonlinear`` state dict."""
    tree = {"kernel": oihw_to_hwio(state[prefix + "conv_layer.weight"])}
    if prefix + "conv_layer.bias" in state:
        tree["bias"] = state[prefix + "conv_layer.bias"]
    return {"Conv_0": tree}


def iodhw_to_dhwio_flipped(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d (in, out, kD, kH, kW) -> flax ConvTranspose
    (kD, kH, kW, in, out) with spatial flip (see iohw_to_hwio_flipped)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1])


def import_unet3d_params(state: Dict[str, np.ndarray], num_pools: int, prefix: str = "") -> Dict:
    """Flax param tree for :class:`mridc_tpu.nn.seg_blocks.UNet3D` from a
    reference UNet3D state dict (reference
    segmentation/nn/unet3d_base/unet3d_block.py:72 — Conv3dBlock convs at
    layers.{0,4}, transpose convs at up_transpose_conv.{i}.layers.0, final
    1x1x1 at up_conv.{last}.1)."""

    def conv(key):
        return {"kernel": oidhw_to_dhwio(state[prefix + key])}

    tree: Dict = {}
    blocks = 0
    for i in range(num_pools):
        tree[f"Conv3dBlock_{blocks}"] = {
            "Conv_0": conv(f"down_sample_layers.{i}.layers.0.weight"),
            "Conv_1": conv(f"down_sample_layers.{i}.layers.4.weight"),
        }
        blocks += 1
    tree[f"Conv3dBlock_{blocks}"] = {
        "Conv_0": conv("conv.layers.0.weight"),
        "Conv_1": conv("conv.layers.4.weight"),
    }
    blocks += 1
    for i in range(num_pools):
        tree[f"TransposeConv3dBlock_{i}"] = {
            "ConvTranspose_0": {
                "kernel": iodhw_to_dhwio_flipped(state[prefix + f"up_transpose_conv.{i}.layers.0.weight"])
            }
        }
        key0 = f"up_conv.{i}.layers.0.weight" if i < num_pools - 1 else f"up_conv.{i}.0.layers.0.weight"
        key1 = f"up_conv.{i}.layers.4.weight" if i < num_pools - 1 else f"up_conv.{i}.0.layers.4.weight"
        tree[f"Conv3dBlock_{blocks}"] = {"Conv_0": conv(key0), "Conv_1": conv(key1)}
        blocks += 1
    tree["Conv_0"] = {
        "kernel": oidhw_to_dhwio(state[prefix + f"up_conv.{num_pools - 1}.1.weight"]),
        "bias": state[prefix + f"up_conv.{num_pools - 1}.1.bias"],
    }
    return tree


def import_reference_model_params(cfg: Dict, state: Dict[str, np.ndarray]) -> Dict:
    """Full-model converter: reference torch state dict -> our flax param tree,
    dispatched on ``cfg['model_name']``. This is the weight half of restoring a
    reference ``.mridc`` archive end-to-end (reference
    mridc/core/connectors/save_restore_connector.py:157 ``load_state_dict`` —
    here the state dict is converted instead of loaded in place).

    Supports the flagship reconstruction models (CIRIM, VN/E2EVN, CCNN) plus
    the shared ``use_sens_net`` wrapper (reference reconstruction/nn/base.py:406
    ``self.sens_net``); extend per model as archives show up.
    """
    name = str(cfg.get("model_name", "")).upper()
    body = {k: v for k, v in state.items() if not k.startswith("sens_net.")}
    if name == "CIRIM":
        inner_cls, inner = "CIRIM", import_cirim_params(body, num_cascades=int(cfg.get("num_cascades", 1)))
    elif name in ("VN", "E2EVN", "VARNET"):
        inner_cls, inner = "VarNet", import_varnet_params(
            body,
            num_cascades=int(cfg.get("num_cascades", 8)),
            chans=int(cfg.get("channels", 18)),
            num_pools=int(cfg.get("pooling_layers", 4)),
        )
    elif name in ("CCNN", "CASCADENET"):
        inner_cls, inner = "CascadeNet", import_ccnn_params(
            body,
            num_cascades=int(cfg.get("num_cascades", 10)),
            n_convs=int(cfg.get("n_convs", 5)),
        )
    else:
        raise NotImplementedError(
            f"no reference-archive weight converter for model {name!r} yet "
            "(supported: CIRIM, VN/E2EVN/VarNet, CCNN/CascadeNet); use the "
            "per-block importers in mridc_tpu.utils.torch_import directly"
        )
    if not cfg.get("use_sens_net", False):
        return inner
    sens = import_sensitivity_model_params(
        state,
        chans=int(cfg.get("sens_chans", 8)),
        num_pools=int(cfg.get("sens_pools", 4)),
        prefix="sens_net.",
    )
    return {"SensitivityModel_0": sens, f"{inner_cls}_0": inner}
