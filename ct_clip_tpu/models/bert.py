"""HF-compatible BERT / RoBERTa encoders in flax.

The reference's text tower is `transformers.BertModel` loaded with the
CXR-BERT-specialized weights (scripts/run_train.py:9, ct_clip.py:685), and the
label-generation subsystem uses RoBERTa (`zzxslp/RadBERT-RoBERTa-4m`,
text_classifier/classifier.py:10).  This module implements both in flax with
exact HF numerics (post-LN residuals, gelu-erf, eps from config, additive
attention mask of dtype-min) so converted torch checkpoints reproduce the
reference latents; golden-tested against transformers' torch BertModel /
RobertaModel in tests/test_bert.py.

TPU notes: the whole stack is dense matmuls at seq len 512 — straight MXU
work; computed in the configured dtype with f32 softmax and f32 layernorm.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import BertConfig, RadBertConfig
from ..ops.norms import layer_norm

MASK_MIN = jnp.finfo(jnp.float32).min


class BertEmbeddings(nn.Module):
    vocab_size: int
    hidden_size: int
    max_position_embeddings: int
    type_vocab_size: int
    eps: float
    dropout: float
    pad_token_id: int = 0
    roberta_positions: bool = False  # RoBERTa offsets positions past pads
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic=True):
        b, n = input_ids.shape
        word = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        if self.roberta_positions:
            # create_position_ids_from_input_ids: pads keep padding_idx,
            # others count from padding_idx+1
            mask = (input_ids != self.pad_token_id).astype(jnp.int32)
            pos_ids = jnp.cumsum(mask, axis=1) * mask + self.pad_token_id
        else:
            pos_ids = jnp.broadcast_to(jnp.arange(n)[None], (b, n))
        pos = nn.Embed(self.max_position_embeddings, self.hidden_size,
                       dtype=self.dtype, name="position_embeddings")(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        tok_type = nn.Embed(self.type_vocab_size, self.hidden_size,
                            dtype=self.dtype, name="token_type_embeddings")(token_type_ids)
        x = word + pos + tok_type
        scale = self.param("ln_scale", nn.initializers.ones, (self.hidden_size,))
        bias = self.param("ln_bias", nn.initializers.zeros, (self.hidden_size,))
        x = layer_norm(x, scale, bias, self.eps)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class BertSelfAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, deterministic=True):
        b, n, _ = x.shape
        h = self.num_heads
        dh = self.hidden_size // h

        def proj(name):
            return nn.Dense(self.hidden_size, dtype=self.dtype, name=name)(x) \
                .reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = proj("query"), proj("key"), proj("value")
        dropout_active = self.dropout > 0 and not deterministic
        if not dropout_active:
            # fused Pallas attention with the pad mask as a per-key additive
            # bias — scores never round-trip HBM (ops/pallas/attention.py);
            # identical-numerics XLA fallback off-TPU
            from ..ops.pallas.attention import fused_attention

            out = fused_attention(q * (dh ** -0.5), k, v,
                                  key_bias=attn_bias[:, 0, 0, :])
            return out.transpose(0, 2, 1, 3).reshape(b, n, self.hidden_size)
        rng = self.make_rng("dropout")
        from ..ops.pallas.attention import _plan as _attn_plan
        from ..ops.pallas.attention import fused_attention_kbias_dropout

        if _attn_plan(q.shape, q.dtype.itemsize, None) is not None:
            # attention-prob dropout drawn from the TPU PRNG inside the
            # kernel — the (b, h, n, n) scores and mask never hit HBM
            # (~38 ms/step across the 12 layers on the XLA path)
            seed = jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
            out = fused_attention_kbias_dropout(
                q * (dh ** -0.5), k, v, attn_bias[:, 0, 0, :], seed,
                self.dropout)
            return out.transpose(0, 2, 1, 3).reshape(b, n, self.hidden_size)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=jnp.float32) / jnp.sqrt(dh).astype(jnp.float32)
        sim = sim + attn_bias  # (b, 1, 1, n) additive mask
        attn = jax.nn.softmax(sim, axis=-1)
        keep = jax.random.bernoulli(rng, 1.0 - self.dropout, attn.shape)
        attn = attn * keep / (1.0 - self.dropout)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        return out.transpose(0, 2, 1, 3).reshape(b, n, self.hidden_size)


class BertLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    eps: float
    dropout: float
    attention_dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, deterministic=True):
        attn_out = BertSelfAttention(self.hidden_size, self.num_heads,
                                     self.attention_dropout, dtype=self.dtype,
                                     name="attention_self")(x, attn_bias, deterministic)
        attn_out = nn.Dense(self.hidden_size, dtype=self.dtype,
                            name="attention_output_dense")(attn_out)
        attn_out = nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)
        s1 = self.param("attention_ln_scale", nn.initializers.ones, (self.hidden_size,))
        b1 = self.param("attention_ln_bias", nn.initializers.zeros, (self.hidden_size,))
        x = layer_norm(x + attn_out, s1, b1, self.eps)

        inter = nn.Dense(self.intermediate_size, dtype=self.dtype,
                         name="intermediate_dense")(x)
        inter = jax.nn.gelu(inter, approximate=False)
        out = nn.Dense(self.hidden_size, dtype=self.dtype, name="output_dense")(inter)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        s2 = self.param("output_ln_scale", nn.initializers.ones, (self.hidden_size,))
        b2 = self.param("output_ln_bias", nn.initializers.zeros, (self.hidden_size,))
        return layer_norm(x + out, s2, b2, self.eps)


class BertModel(nn.Module):
    """transformers.BertModel equivalent (used for CXR-BERT).  Set
    `roberta_positions=True` + RadBertConfig for RobertaModel semantics."""

    config: BertConfig | RadBertConfig
    roberta_positions: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic: bool = True):
        cfg = self.config
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        x = BertEmbeddings(
            cfg.vocab_size, cfg.hidden_size, cfg.max_position_embeddings,
            cfg.type_vocab_size, cfg.layer_norm_eps, cfg.hidden_dropout,
            pad_token_id=cfg.pad_token_id, roberta_positions=self.roberta_positions,
            dtype=self.dtype, name="embeddings")(
                input_ids, token_type_ids, deterministic)

        attn_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * MASK_MIN

        # per-layer jax.checkpoint; param names unchanged under nn.remat
        Layer = (nn.remat(BertLayer, static_argnums=(3,))
                 if getattr(cfg, "remat", False) else BertLayer)
        for i in range(cfg.num_hidden_layers):
            x = Layer(cfg.hidden_size, cfg.num_attention_heads,
                      cfg.intermediate_size, cfg.layer_norm_eps,
                      cfg.hidden_dropout, cfg.attention_dropout,
                      dtype=self.dtype, name=f"layer_{i}")(
                          x, attn_bias, deterministic)

        pooled = None
        if getattr(cfg, "with_pooler", True):
            pooled = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                              name="pooler_dense")(x[:, 0])
            pooled = jnp.tanh(pooled)
        return x, pooled


class RadBertClassifier(nn.Module):
    """RoBERTa encoder + Linear(hidden -> 18) on the pooler output
    (text_classifier/classifier.py:5-18)."""

    config: RadBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, deterministic=True):
        _, pooled = BertModel(self.config, roberta_positions=True,
                              dtype=self.dtype, name="encoder")(
                                  input_ids, attention_mask,
                                  deterministic=deterministic)
        return nn.Dense(self.config.num_labels, dtype=self.dtype,
                        name="classifier")(pooled)
