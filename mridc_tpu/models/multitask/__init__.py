from mridc_tpu.models.multitask.blocks import KSpaceDC, UnetDecoder, UnetEncoder
from mridc_tpu.models.multitask.models import IDSLR, IDSLRUNet, MTLRS, RecSegUNet, SERANet, SegNet

__all__ = ["KSpaceDC", "UnetDecoder", "UnetEncoder", "IDSLR", "IDSLRUNet", "MTLRS", "RecSegUNet", "SERANet", "SegNet"]
