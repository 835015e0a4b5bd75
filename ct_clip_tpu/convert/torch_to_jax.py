"""torch -> JAX weight converters.

Keyed to the reference's state-dict layouts:
  * HF BertModel / RobertaModel (text tower, scripts/run_train.py:9)
  * CTViT (transformer_maskgit/ctvit.py:118-272; `CTViT.load` at :268-272)
  * CTCLIP (CT_CLIP/ct_clip/ct_clip.py:587-597) and the trainer package dict
    {model:..., optim:...} (scripts/CTCLIPTrainer.py:209-213)
  * RadBertClassifier (text_classifier/classifier.py)

Only numpy is required at call time; state-dict values may be torch tensors
or numpy arrays.  torch.load itself is only needed for reading .pt files.
"""
from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from ..config import BertConfig, CTCLIPConfig, CTViTConfig, RadBertConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd: Mapping, key: str, bias: bool = True) -> Dict:
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _ln(sd: Mapping, key: str) -> Tuple[np.ndarray, np.ndarray]:
    return _np(sd[f"{key}.weight"]), _np(sd[f"{key}.bias"])


def bert_params_from_torch(sd: Mapping, cfg: BertConfig | RadBertConfig,
                           prefix: str = "") -> Dict:
    """HF BertModel/RobertaModel state dict -> flax BertModel params."""
    p = prefix
    emb_scale, emb_bias = _ln(sd, f"{p}embeddings.LayerNorm")
    params: Dict = {
        "embeddings": {
            "word_embeddings": {"embedding": _np(sd[f"{p}embeddings.word_embeddings.weight"])},
            "position_embeddings": {"embedding": _np(sd[f"{p}embeddings.position_embeddings.weight"])},
            "token_type_embeddings": {"embedding": _np(sd[f"{p}embeddings.token_type_embeddings.weight"])},
            "ln_scale": emb_scale,
            "ln_bias": emb_bias,
        }
    }
    for i in range(cfg.num_hidden_layers):
        lp = f"{p}encoder.layer.{i}."
        attn_scale, attn_bias = _ln(sd, f"{lp}attention.output.LayerNorm")
        out_scale, out_bias = _ln(sd, f"{lp}output.LayerNorm")
        params[f"layer_{i}"] = {
            "attention_self": {
                "query": _linear(sd, f"{lp}attention.self.query"),
                "key": _linear(sd, f"{lp}attention.self.key"),
                "value": _linear(sd, f"{lp}attention.self.value"),
            },
            "attention_output_dense": _linear(sd, f"{lp}attention.output.dense"),
            "attention_ln_scale": attn_scale,
            "attention_ln_bias": attn_bias,
            "intermediate_dense": _linear(sd, f"{lp}intermediate.dense"),
            "output_dense": _linear(sd, f"{lp}output.dense"),
            "output_ln_scale": out_scale,
            "output_ln_bias": out_bias,
        }
    if f"{p}pooler.dense.weight" in sd:
        params["pooler_dense"] = _linear(sd, f"{p}pooler.dense")
    return params


def _maskgit_attention(sd: Mapping, key: str, num_null_kv: int = 0) -> Dict:
    out = {
        "norm": {"gamma": _np(sd[f"{key}.norm.gamma"])},
        "to_q": _linear(sd, f"{key}.to_q", bias=False),
        "to_kv": _linear(sd, f"{key}.to_kv", bias=False),
        "to_out": _linear(sd, f"{key}.to_out", bias=False),
        "q_scale": _np(sd[f"{key}.q_scale"]),
        "k_scale": _np(sd[f"{key}.k_scale"]),
    }
    null_kv = _np(sd[f"{key}.null_kv"])
    if null_kv.size > 0:
        out["null_kv"] = null_kv
    if f"{key}.context_norm.gamma" in sd:
        out["context_norm"] = {"gamma": _np(sd[f"{key}.context_norm.gamma"])}
    return out


def _maskgit_ff(sd: Mapping, key: str) -> Dict:
    # Sequential: 0=LayerNorm, 1=Linear(wi), 2=GEGLU, 3=Dropout, 4=Linear(wo)
    scale, bias = _ln(sd, f"{key}.0")
    return {
        "norm": {"scale": scale, "bias": bias},
        "wi": _linear(sd, f"{key}.1", bias=False),
        "wo": _linear(sd, f"{key}.4", bias=False),
    }


def _peg(sd: Mapping, key: str) -> Dict:
    # torch Conv3d weight (out, in/groups=1, kt, kh, kw) -> flax (kt, kh, kw, 1, out)
    w = _np(sd[f"{key}.dsconv.weight"]).transpose(2, 3, 4, 1, 0)
    return {"dsconv": {"kernel": w, "bias": _np(sd[f"{key}.dsconv.bias"])}}


def maskgit_transformer_from_torch(sd: Mapping, prefix: str, depth: int,
                                   peg: bool = True,
                                   has_cross_attn: bool = False) -> Dict:
    """transformer_maskgit Transformer (attention.py:280-333) -> flax params.
    torch layer list per depth: [0]=PEG, [1]=self-attn, [2]=cross-attn, [3]=FF."""
    params: Dict = {"norm_out": {"gamma": _np(sd[f"{prefix}.norm_out.gamma"])}}
    for i in range(depth):
        lp = f"{prefix}.layers.{i}"
        if peg:
            params[f"layers_{i}_peg"] = _peg(sd, f"{lp}.0")
        params[f"layers_{i}_attn"] = _maskgit_attention(sd, f"{lp}.1")
        if has_cross_attn:
            params[f"layers_{i}_cross_attn"] = _maskgit_attention(sd, f"{lp}.2")
        params[f"layers_{i}_ff"] = _maskgit_ff(sd, f"{lp}.3")
    return params


def _cpb(sd: Mapping, prefix: str, layers: int = 2) -> Dict:
    # net.0 = Sequential(Linear, LeakyReLU); ...; net.{layers} = Linear
    params = {"net_0": _linear(sd, f"{prefix}.net.0.0")}
    for li in range(1, layers):
        params[f"net_{li}"] = _linear(sd, f"{prefix}.net.{li}.0")
    params["net_out"] = _linear(sd, f"{prefix}.net.{layers}")
    return params


def ctvit_params_from_torch(sd: Mapping, cfg: CTViTConfig,
                            prefix: str = "") -> Tuple[Dict, Dict]:
    """CTViT state dict -> (params, vq_state).  Covers the production encoder
    path; decoder params are converted only if present (reference's decoder
    modules are never constructed)."""
    p = prefix
    ln_in = _ln(sd, f"{p}to_patch_emb.1")
    ln_out = _ln(sd, f"{p}to_patch_emb.3")
    proj = _linear(sd, f"{p}to_patch_emb.2")
    params: Dict = {
        "patch_norm_in_scale": ln_in[0],
        "patch_norm_in_bias": ln_in[1],
        "patch_proj_kernel": proj["kernel"],
        "patch_proj_bias": proj["bias"],
        "patch_norm_out": {"scale": ln_out[0], "bias": ln_out[1]},
        "spatial_rel_pos_bias": _cpb(sd, f"{p}spatial_rel_pos_bias"),
        "enc_spatial_transformer": maskgit_transformer_from_torch(
            sd, f"{p}enc_spatial_transformer", cfg.spatial_depth),
        "enc_temporal_transformer": maskgit_transformer_from_torch(
            sd, f"{p}enc_temporal_transformer", cfg.temporal_depth),
    }
    vq_state = {
        "vq": {
            "embed": _np(sd[f"{p}vq._codebook.embed"]).reshape(cfg.codebook_size, cfg.dim),
            "cluster_size": _np(sd[f"{p}vq._codebook.cluster_size"]).reshape(cfg.codebook_size),
        }
    }
    return params, vq_state


def ctclip_params_from_torch(sd: Mapping, cfg: CTCLIPConfig) -> Dict:
    """Full CTCLIP state dict (ct_clip.py:587-597) -> flax variables
    {'params': ..., 'vq': ...}.  Accepts the trainer package dict too."""
    if "model" in sd and not any(k.startswith("text_transformer") for k in sd):
        sd = sd["model"]  # CTCLIPTrainer.py:209-213 save format
    sd = {k.removeprefix("module."): v for k, v in sd.items()}  # DataParallel

    vit_params, vq_state = ctvit_params_from_torch(sd, cfg.ctvit,
                                                   prefix="visual_transformer.")
    params = {
        "text_transformer": bert_params_from_torch(sd, cfg.bert,
                                                   prefix="text_transformer."),
        "visual_transformer": vit_params,
        "to_text_latent": _linear(sd, "to_text_latent", bias=False),
        "to_visual_latent": _linear(sd, "to_visual_latent", bias=False),
        "temperature": _np(sd["temperature"]).reshape(()),
    }
    # CLOOB extra projections exist in every reference checkpoint
    # (ct_clip.py:580-582 deep copies) but are flax params only when the
    # model actually uses them.
    if cfg.extra_latent_projection:
        params["to_text_latent_extra"] = _linear(sd, "to_text_latent_extra",
                                                 bias=False)
        params["to_visual_latent_extra"] = _linear(sd, "to_visual_latent_extra",
                                                   bias=False)
    return {"params": params, "vq": {"visual_transformer": vq_state}}


def radbert_params_from_torch(sd: Mapping, cfg: RadBertConfig) -> Dict:
    """RadBertClassifier state dict (text_classifier/classifier.py) -> flax."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    return {
        "encoder": bert_params_from_torch(sd, cfg, prefix="model."),
        "classifier": _linear(sd, "fc1"),
    }


def load_ctclip_checkpoint(path: str, cfg: CTCLIPConfig) -> Dict:
    """Read a reference .pt checkpoint (CT-CLIP_v2.pt layout) into flax
    variables.  Requires torch at call time."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return ctclip_params_from_torch(sd, cfg)
