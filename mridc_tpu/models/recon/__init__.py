from mridc_tpu.models.recon.ccnn import CascadeNet
from mridc_tpu.models.recon.cirim import CIRIM
from mridc_tpu.models.recon.crnn import CRNNet
from mridc_tpu.models.recon.unet import UNet
from mridc_tpu.models.recon.vn import VarNet
from mridc_tpu.models.recon.zf import ZF

__all__ = ["CascadeNet", "CIRIM", "CRNNet", "UNet", "VarNet", "ZF"]
