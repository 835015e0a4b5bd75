"""Golden parity: flax BertModel / RobertaModel vs HF transformers (torch CPU),
with randomly initialized weights moved across via the converter."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from ct_clip_tpu.config import BertConfig, RadBertConfig
from ct_clip_tpu.models import BertModel
from ct_clip_tpu.convert.torch_to_jax import bert_params_from_torch

TINY = dict(vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=40)


def _hf_bert(tiny_cfg):
    from transformers import BertConfig as HFBertConfig, BertModel as HFBertModel
    hf = HFBertModel(HFBertConfig(
        vocab_size=tiny_cfg.vocab_size, hidden_size=tiny_cfg.hidden_size,
        num_hidden_layers=tiny_cfg.num_hidden_layers,
        num_attention_heads=tiny_cfg.num_attention_heads,
        intermediate_size=tiny_cfg.intermediate_size,
        max_position_embeddings=tiny_cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0))
    hf.eval()
    return hf


def test_bert_matches_hf_transformers():
    torch.manual_seed(0)
    cfg = BertConfig(**TINY, hidden_dropout=0.0, attention_dropout=0.0)
    hf = _hf_bert(cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, size=(2, 11))
    mask = np.ones((2, 11), np.int64)
    mask[0, 7:] = 0
    mask[1, 9:] = 0

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
    ref_hidden = out.last_hidden_state.numpy()
    ref_pooled = out.pooler_output.numpy()

    params = bert_params_from_torch(hf.state_dict(), cfg)
    model = BertModel(cfg)
    hidden, pooled = model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=2e-4)


def test_roberta_matches_hf_transformers():
    torch.manual_seed(0)
    from transformers import RobertaConfig as HFC, RobertaModel as HFM
    cfg = RadBertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=40, type_vocab_size=1,
                        hidden_dropout=0.0, attention_dropout=0.0)
    hf = HFM(HFC(vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
                 num_hidden_layers=cfg.num_hidden_layers,
                 num_attention_heads=cfg.num_attention_heads,
                 intermediate_size=cfg.intermediate_size,
                 max_position_embeddings=cfg.max_position_embeddings,
                 type_vocab_size=1, pad_token_id=1,
                 hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0))
    hf.eval()

    rng = np.random.RandomState(1)
    ids = rng.randint(2, cfg.vocab_size, size=(2, 9))
    mask = np.ones((2, 9), np.int64)
    ids[1, 6:] = 1  # pad
    mask[1, 6:] = 0

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
    ref_hidden = out.last_hidden_state.numpy()
    ref_pooled = out.pooler_output.numpy()

    params = bert_params_from_torch(hf.state_dict(), cfg, prefix="")
    model = BertModel(cfg, roberta_positions=True)
    hidden, pooled = model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=2e-4)
