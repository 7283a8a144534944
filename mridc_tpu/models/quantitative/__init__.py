from mridc_tpu.models.quantitative.qcirim import qCIRIM, qRIMBlock
from mridc_tpu.models.quantitative.qvn import qVarNet
from mridc_tpu.models.quantitative.signal_model import (
    analytical_log_likelihood_gradient,
    megre_signal,
    rescale_by_max,
)

__all__ = ["qCIRIM", "qRIMBlock", "qVarNet", "megre_signal", "analytical_log_likelihood_gradient", "rescale_by_max"]
