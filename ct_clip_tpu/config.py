"""Typed configuration for the CT-CLIP TPU framework.

The reference duplicates model hyperparameters as constructor kwargs across six
entry scripts (e.g. /root/reference/scripts/run_train.py:17-42 ==
run_zero_shot.py:11-34 == ct_lipro_train.py:47-58).  Here there is a single
typed config tree with the reference defaults baked in.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp

# The 18 CT-RATE pathologies (reference: scripts/zero_shot.py:121).
PATHOLOGIES: Tuple[str, ...] = (
    "Medical material",
    "Arterial wall calcification",
    "Cardiomegaly",
    "Pericardial effusion",
    "Coronary artery wall calcification",
    "Hiatal hernia",
    "Lymphadenopathy",
    "Emphysema",
    "Atelectasis",
    "Lung nodule",
    "Lung opacity",
    "Pulmonary fibrotic sequela",
    "Pleural effusion",
    "Mosaic attenuation pattern",
    "Peribronchial thickening",
    "Consolidation",
    "Bronchiectasis",
    "Interlobular septal thickening",
)


def _asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


class _Base:
    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2, default=str)


@dataclass(frozen=True)
class CTViTConfig(_Base):
    """3D factorized ViT + VQ image tower (reference: scripts/run_train.py:17-27,
    transformer_maskgit/ctvit.py:118-188)."""

    dim: int = 512
    codebook_size: int = 8192
    image_size: int = 480
    patch_size: int = 20
    temporal_patch_size: int = 10
    spatial_depth: int = 4
    temporal_depth: int = 4
    dim_head: int = 32
    heads: int = 8
    channels: int = 1
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    # VQ (reference: ctvit.py:188 -> vector_quantize_pytorch defaults)
    vq_decay: float = 0.8
    vq_commitment_weight: float = 1.0
    vq_eps: float = 1e-5
    # Mesh axis to psum VQ EMA statistics over.  Leave None under plain pjit
    # (global-batch semantics make per-call stats already global); set to the
    # data axis when the tower runs inside shard_map, where each shard sees
    # only its local tokens.
    vq_axis_name: Optional[str] = None
    # VQ assignment precision: True = true-f32 similarities (f32-reference
    # argmax parity, what EMA training needs), False = one bf16 MXU pass
    # (~4e-3 tie margin, 6x faster), None = exact in training / fast in
    # inference (ops/vq.py CosineVQ.exact_sim).
    vq_exact_sim: Optional[bool] = None
    # Temporal extent of the production volume in frames (240 slices).
    num_frames: int = 240
    # Whether to build the decoder mirror (the reference's decoder is dead code,
    # ctvit.py:325-335 reference attrs never created; we build a working one).
    with_decoder: bool = False
    # Per-block jax.checkpoint (the torch.utils.checkpoint toggle,
    # ct_clip.py:64-74); trades recompute for HBM during training.
    remat: bool = False

    @property
    def patch_hw(self) -> int:
        return self.image_size // self.patch_size  # 24

    @property
    def patch_t(self) -> int:
        return self.num_frames // self.temporal_patch_size  # 24

    @property
    def patch_dim(self) -> int:
        return self.channels * self.temporal_patch_size * self.patch_size ** 2


@dataclass(frozen=True)
class BertConfig(_Base):
    """HF-BertModel-compatible text tower (CXR-BERT specialized shape).

    Reference loads `microsoft/BiomedVLP-CXR-BERT-specialized` as a plain
    BertModel (scripts/run_train.py:9)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    pad_token_id: int = 0
    with_pooler: bool = True
    remat: bool = False  # per-layer jax.checkpoint during training


@dataclass(frozen=True)
class CTCLIPConfig(_Base):
    """Dual-tower CLIP (reference: CT_CLIP/ct_clip/ct_clip.py:407-585,
    production kwargs scripts/run_train.py:31-42)."""

    dim_text: int = 768
    dim_image: int = 294912  # 24*24*512 flattened post-temporal-pool grid
    dim_latent: int = 512
    use_all_token_embeds: bool = False  # FILIP fine-grained loss
    text_has_cls_token: bool = False  # drop token 0 in FILIP mode (ct_clip.py:421,754)
    visual_has_cls_token: bool = False  # (ct_clip.py:433,755)
    decoupled_contrastive_learning: bool = False  # DCL
    extra_latent_projection: bool = False  # CLOOB
    use_mlm: bool = False
    text_ssl_loss_weight: float = 0.05
    use_visual_ssl: bool = False
    visual_ssl_type: str = "simsiam"  # or "simclr" (ct_clip.py:516-528)
    # NetWrapper hidden-layer tap equivalent (ct_clip.py:444 + visual_ssl.py
    # :141-203): "temporal" = temporal-transformer token output (default),
    # "spatial" = spatial-transformer token output, "pooled" = the temporal-
    # mean pooled embedding.  Token taps flatten to (b*n, d) rows like the
    # reference's NetWrapper flatten.
    visual_ssl_tap: str = "temporal"
    image_ssl_loss_weight: float = 0.05
    multiview_loss_weight: float = 0.1
    temperature_init: float = 1.0
    # TPU addition: gather negatives across the data axis of the mesh
    # (capability stubbed but unused in reference CT_CLIP/ct_clip/distributed.py).
    gather_negatives: bool = True

    ctvit: CTViTConfig = field(default_factory=CTViTConfig)
    bert: BertConfig = field(default_factory=BertConfig)


@dataclass(frozen=True)
class PreprocessConfig(_Base):
    """Volume preprocessing (reference: scripts/data.py:92-162 train path,
    scripts/data_inference_nii.py:96-165 inference path)."""

    target_spacing: Tuple[float, float, float] = (1.5, 0.75, 0.75)  # (z, x, y) mm
    hu_min: float = -1000.0
    hu_max: float = 1000.0
    norm_scale: float = 1000.0
    target_shape: Tuple[int, int, int] = (480, 480, 240)  # (h, w, d) pre-permute
    pad_value: float = -1.0
    # train clips HU after resample (data.py:122), infer clips before
    # (data_inference_nii.py:115); both supported.
    clip_before_resample: bool = False


@dataclass(frozen=True)
class MeshConfig(_Base):
    """Device mesh layout. data = batch sharding (DDP/FSDP equivalent),
    model = optional tensor sharding for the 294912x512 projection.

    fsdp selects the ZeRO stage for the `data` axis (the TPU equivalent of
    the reference's `accelerate launch --use_fsdp`, scripts/README.md:16-20):
      "none"  — params + optimizer state replicated (plain DDP);
      "zero1" — Adam moments sharded over `data`, params replicated;
      "full"  — params AND moments sharded over `data` (XLA inserts the
                 all-gathers at use sites, reduce-scatters for grads)."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel_size: int = 1
    fsdp: str = "none"
    # Megatron-style tensor parallelism over `model`: column-shards the
    # q/k/v + FFN-in projections, row-shards the out projections (GSPMD
    # inserts the psums).  Off by default — the fused Pallas sublayers are
    # data-parallel-oriented (a sharded operand to a custom call is gathered
    # first), so TP pays off only for the XLA attention path / very large
    # towers.
    tensor_parallel: bool = False
    # leaves below this many elements stay replicated under fsdp (LN scales,
    # biases, per-dim QK scales: sharding them buys nothing, costs collectives)
    fsdp_min_size: int = 2 ** 16

    def __post_init__(self):
        if self.fsdp not in ("none", "zero1", "full"):
            raise ValueError("MeshConfig.fsdp must be 'none', 'zero1' or "
                             f"'full', got {self.fsdp!r}")


@dataclass(frozen=True)
class TrainConfig(_Base):
    """Pretraining loop (reference defaults: scripts/CTCLIPTrainer.py:128-131,
    scripts/run_train.py:52-55)."""

    num_train_steps: int = 100001
    batch_size: int = 8
    lr: float = 1.25e-6
    wd: float = 0.0
    max_grad_norm: float = 0.5
    warmup_steps: int = 0  # reference runs constant LR
    save_results_every: int = 100
    save_model_every: int = 2000
    seed: int = 42
    compute_dtype: str = "bfloat16"  # autocast equivalent
    # jax.checkpoint on transformer blocks.  Rarely worth it on TPU: the
    # fused sublayer kernels' custom VJPs recompute flash-style from the
    # sublayer input (the same residual remat would store), so remat saves
    # no memory on the fused path and re-runs the attention forwards
    # (measured +24 ms on the 300 ms batch-8 step).  Keep for the XLA
    # fallback paths or memory-constrained multi-chip fits.
    remat: bool = False
    mesh: MeshConfig = field(default_factory=MeshConfig)

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


@dataclass(frozen=True)
class RadBertConfig(_Base):
    """RadBERT-RoBERTa-4m multilabel text classifier
    (reference: text_classifier/classifier.py:5-18)."""

    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    pad_token_id: int = 1
    num_labels: int = 18


@dataclass(frozen=True)
class MaskGitConfig(_Base):
    """Bidirectional token transformer over VQ ids
    (reference: transformer_maskgit/MaskGITTransformer.py:103-211)."""

    dim: int = 512
    depth: int = 6
    dim_head: int = 64
    heads: int = 8
    max_seq_len: int = 13824 + 1
    t5_dim: int = 768
    unconditional: bool = False
    steps: int = 18
    cond_scale: float = 5.0
