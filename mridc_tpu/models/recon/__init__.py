from mridc_tpu.models.recon.ccnn import CascadeNet
from mridc_tpu.models.recon.cirim import CIRIM
from mridc_tpu.models.recon.crnn import CRNNet
from mridc_tpu.models.recon.cs import CS, PICS
from mridc_tpu.models.recon.dunet import DUNet
from mridc_tpu.models.recon.jointicnet import JointICNet
from mridc_tpu.models.recon.kikinet import KIKINet
from mridc_tpu.models.recon.lpd import LPDNet
from mridc_tpu.models.recon.multidomainnet import MultiDomainNet
from mridc_tpu.models.recon.resnet import ProximalGradient, ResNet
from mridc_tpu.models.recon.rvn import RecurrentVarNet
from mridc_tpu.models.recon.unet import UNet
from mridc_tpu.models.recon.vn import VarNet
from mridc_tpu.models.recon.vsnet import VSNet
from mridc_tpu.models.recon.xpdnet import XPDNet
from mridc_tpu.models.recon.zf import ZF

__all__ = [
    "CascadeNet", "CIRIM", "CRNNet", "CS", "PICS", "DUNet", "JointICNet",
    "KIKINet", "LPDNet", "MultiDomainNet", "ProximalGradient", "ResNet",
    "RecurrentVarNet", "UNet", "VarNet", "VSNet", "XPDNet", "ZF",
]
