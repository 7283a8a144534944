from mridc_tpu.losses.aggregator import AggregatorLoss
from mridc_tpu.losses.segmentation import CrossEntropyLoss, Dice
from mridc_tpu.losses.ssim import SSIMLoss

__all__ = ["AggregatorLoss", "CrossEntropyLoss", "Dice", "SSIMLoss"]
