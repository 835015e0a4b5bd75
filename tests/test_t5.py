"""JAX-native T5 encoder: numerics parity vs the HF torch T5EncoderModel
the reference conditions on (transformer_maskgit/t5.py:18-104)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ct_clip_tpu.models.t5_encoder import (T5Encoder, T5EncoderConfig,  # noqa: E402
                                           convert_hf_t5_encoder,
                                           relative_position_bucket)


def _tiny_hf(gated: bool):
    from transformers import T5Config, T5EncoderModel

    hf_cfg = T5Config(
        vocab_size=96, d_model=32, d_kv=8, num_heads=4, d_ff=48,
        num_layers=3, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu" if gated else "relu",
        is_encoder_decoder=False, use_cache=False)
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()
    cfg = T5EncoderConfig(vocab_size=96, d_model=32, d_kv=8, num_heads=4,
                          d_ff=48, num_layers=3, gated_gelu=gated)
    return model, cfg


@pytest.mark.parametrize("gated", [True, False])
def test_t5_encoder_matches_hf(gated):
    hf, cfg = _tiny_hf(gated)
    rng = np.random.RandomState(3)
    b, n = 2, 24  # n > 2*max_exact -> exercises the log-spaced buckets
    ids = rng.randint(0, 96, (b, n))
    mask = np.ones((b, n), np.int64)
    mask[0, 17:] = 0
    mask[1, 9:] = 0

    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    variables = convert_hf_t5_encoder(hf.state_dict(), cfg)
    got = np.asarray(T5Encoder(cfg).apply(variables, jnp.asarray(ids),
                                          jnp.asarray(mask)))
    # compare only unmasked rows: HF computes pad rows too but their values
    # are unspecified downstream (the reference zeroes them, t5.py:96-104)
    for r in range(b):
        keep = mask[r].astype(bool)
        np.testing.assert_allclose(got[r][keep], want[r][keep], atol=2e-4)


def test_relative_position_bucket_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    pos = np.arange(-300, 300)
    want = T5Attention._relative_position_bucket(
        torch.tensor(pos), bidirectional=True, num_buckets=32,
        max_distance=128).numpy()
    got = np.asarray(relative_position_bucket(jnp.asarray(pos), 32, 128))
    np.testing.assert_array_equal(got, want)


def test_t5_text_conditioning_embedder():
    """load_t5_jax wraps the encoder into the texts -> (b, n, d) contract
    with zeroed pad rows (t5.py:88-104)."""
    from ct_clip_tpu.models.t5 import jax_t5_embedder

    hf, cfg = _tiny_hf(True)

    class _Tok:
        def __call__(self, texts, **kw):
            n = kw.get("max_length", 8)
            ids = [[(7 + 13 * i + j) % 96 for j in range(min(len(t), n))]
                   for i, t in enumerate(texts)]
            maxlen = max(len(x) for x in ids)
            return {
                "input_ids": [x + [0] * (maxlen - len(x)) for x in ids],
                "attention_mask": [[1] * len(x) + [0] * (maxlen - len(x))
                                   for x in ids],
            }

    variables = convert_hf_t5_encoder(hf.state_dict(), cfg)
    embed = jax_t5_embedder(cfg, variables, _Tok(), max_length=16)
    out = embed(["pleural effusion", "ok"])
    assert out.shape[0] == 2 and out.shape[-1] == cfg.d_model
    assert np.abs(out[1, 2:]).max() == 0.0  # pad rows zeroed
    assert np.abs(out[0, :2]).max() > 0.0
