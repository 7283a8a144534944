from mridc_tpu.models.registry import MODEL_REGISTRY, available_models, build_model, register_model
from mridc_tpu.models.pretrained import (
    PretrainedModelInfo,
    from_pretrained,
    get_available_model_names,
    list_available_models,
    register_pretrained_model,
)

__all__ = [
    "MODEL_REGISTRY", "available_models", "build_model", "register_model",
    "PretrainedModelInfo", "from_pretrained", "get_available_model_names",
    "list_available_models", "register_pretrained_model",
]
