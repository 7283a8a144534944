from mridc_tpu.models.registry import MODEL_REGISTRY, available_models, build_model, register_model

__all__ = ["MODEL_REGISTRY", "available_models", "build_model", "register_model"]
