"""ct_clip_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of ibrahimethemhamamci/CT-CLIP: 3D medical vision-language
contrastive pretraining, zero-shot pathology classification, fine-tuning
(VocabFine / LiPro), retrieval, report labeling, and the MaskGIT generative
stack — rebuilt TPU-first, not ported."""

__version__ = "0.1.0"

from .config import (PATHOLOGIES, BertConfig, CTCLIPConfig, CTViTConfig,
                     MaskGitConfig, MeshConfig, PreprocessConfig,
                     RadBertConfig, TrainConfig)

__all__ = [
    "PATHOLOGIES", "BertConfig", "CTCLIPConfig", "CTViTConfig",
    "MaskGitConfig", "MeshConfig", "PreprocessConfig", "RadBertConfig",
    "TrainConfig",
]
