from mofo_tpu.models.registry import create_model, list_models
from mofo_tpu.models.pretrain import PretrainVisionTransformer
from mofo_tpu.models.classifier import VisionTransformer
from mofo_tpu.models.bb_focused import VisionTransformerBBFocused

__all__ = [
    "create_model",
    "list_models",
    "PretrainVisionTransformer",
    "VisionTransformer",
    "VisionTransformerBBFocused",
]
