"""Text conditioning for the generative stack.

The reference lazily loads a frozen HF `google/t5-v1_1-base` encoder and
mean-masks its output (transformer_maskgit/t5.py:64-104).  Air-gapped
environments have no HF weights, so conditioning is a pluggable protocol:
any callable texts -> (b, n, d) float embeddings with zero rows at padding.

`t5_encode_text` uses the HF torch T5 encoder when available (exact
reference behavior: tokenize, encode, zero out masked positions); otherwise
raise with a clear message so callers inject their own embedder (e.g. the
CXR-BERT tower).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

T5_NAME = "google/t5-v1_1-base"
MAX_LENGTH = 256

_t5_cache = {}


def t5_encode_text(texts: Sequence[str], name: str = T5_NAME,
                   max_length: int = MAX_LENGTH) -> np.ndarray:
    """(b, n, d) embeddings with masked positions zeroed (t5.py:88-104)."""
    try:
        import torch
        from transformers import T5EncoderModel, T5Tokenizer

        if name not in _t5_cache:
            _t5_cache[name] = (T5Tokenizer.from_pretrained(name),
                               T5EncoderModel.from_pretrained(name).eval())
        tok, model = _t5_cache[name]
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            f"T5 weights unavailable ({e}); pass your own text_embed_fn "
            "(texts -> (b, n, d) array with zeroed pad rows)") from e

    import torch

    enc = tok(list(texts), return_tensors="pt", padding="longest",
              truncation=True, max_length=max_length)
    with torch.no_grad():
        out = _t5_cache[name][1](input_ids=enc.input_ids,
                                 attention_mask=enc.attention_mask)
    hidden = out.last_hidden_state
    hidden = hidden * enc.attention_mask[..., None]
    return hidden.numpy()


def jax_t5_embedder(cfg, variables, tokenizer,
                    max_length: int = MAX_LENGTH) -> Callable:
    """texts -> (b, n, d) conditioning embeddings from the TPU-native
    T5Encoder (models/t5_encoder.py), pad rows zeroed — the same contract
    as the reference's t5_encode_text (t5.py:88-104) but jitted on device.
    `variables` come from `convert_hf_t5_encoder` (pretrained) or
    `T5Encoder(cfg).init` (from-scratch)."""
    import jax
    import jax.numpy as jnp

    from .t5_encoder import T5Encoder

    model = T5Encoder(cfg)

    @jax.jit
    def encode_v(vars_, ids, mask):
        hidden = model.apply(vars_, ids, mask)
        return hidden * mask[..., None].astype(hidden.dtype)

    # weights threaded as a jit argument, not a closure constant (constants
    # are embedded via device->host fetches at lowering — see bench.py)
    encode = lambda ids, mask: encode_v(variables, ids, mask)

    def embed(texts: Sequence[str]) -> np.ndarray:
        enc = tokenizer(list(texts), padding="longest", truncation=True,
                        max_length=max_length)
        return np.asarray(encode(jnp.asarray(enc["input_ids"]),
                                 jnp.asarray(enc["attention_mask"])))

    return embed


def load_t5_jax(name: str = T5_NAME, dtype=None):
    """Load HF T5 weights from disk into the TPU-native encoder; returns
    (embed_fn, cfg).  Needs the HF checkpoint locally (zero-egress safe)."""
    from transformers import T5Config, T5EncoderModel, T5Tokenizer

    from .t5_encoder import T5EncoderConfig, convert_hf_t5_encoder

    hf_cfg = T5Config.from_pretrained(name)
    cfg = T5EncoderConfig(
        vocab_size=hf_cfg.vocab_size, d_model=hf_cfg.d_model,
        d_kv=hf_cfg.d_kv, num_heads=hf_cfg.num_heads, d_ff=hf_cfg.d_ff,
        num_layers=hf_cfg.num_layers,
        relative_attention_num_buckets=hf_cfg.relative_attention_num_buckets,
        relative_attention_max_distance=getattr(
            hf_cfg, "relative_attention_max_distance", 128),
        gated_gelu="gated" in hf_cfg.feed_forward_proj,
        **({"dtype": dtype} if dtype is not None else {}))
    variables = convert_hf_t5_encoder(
        T5EncoderModel.from_pretrained(name).state_dict(), cfg)
    return jax_t5_embedder(cfg, variables, T5Tokenizer.from_pretrained(name)), cfg


def bert_text_embedder(model, variables, tokenizer,
                       max_length: int = 512) -> Callable:
    """Build a conditioning embedder from the CXR-BERT tower (air-gapped
    alternative to T5 with the same zero-padded contract)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def encode_v(vars_, ids, mask):
        hidden, _ = model.apply(vars_, ids, mask)
        return hidden * mask[..., None]

    encode = lambda ids, mask: encode_v(variables, ids, mask)

    def embed(texts: Sequence[str]) -> np.ndarray:
        enc = tokenizer(list(texts), padding="max_length", truncation=True,
                        max_length=max_length)
        return np.asarray(encode(jnp.asarray(enc["input_ids"]),
                                 jnp.asarray(enc["attention_mask"])))

    return embed
