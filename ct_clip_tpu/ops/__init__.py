from .norms import (ClipLayerNorm, GammaLayerNorm, StandardLayerNorm,
                    l2norm, layer_norm)
from .mlp import ClipFeedForward, MaskgitFeedForward, geglu
from .attention import (PEG, ClipAttention, ClipTransformer,
                        ContinuousPositionBias, MaskgitTransformer,
                        QKNormAttention, alibi_bias, apply_rotary,
                        rotary_freqs)
from .vq import CosineVQ
from .resample import preprocess_batch, preprocess_volume

__all__ = [
    "ClipLayerNorm", "GammaLayerNorm", "StandardLayerNorm", "l2norm",
    "layer_norm", "ClipFeedForward", "MaskgitFeedForward", "geglu", "PEG",
    "ClipAttention", "ClipTransformer", "ContinuousPositionBias",
    "MaskgitTransformer", "QKNormAttention", "alibi_bias", "apply_rotary",
    "rotary_freqs", "CosineVQ", "preprocess_batch", "preprocess_volume",
]
