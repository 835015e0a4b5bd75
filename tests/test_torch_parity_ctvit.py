"""Torch-transcription parity for the full CTViT encoder stack.

The strongest air-gapped proxy for CT-CLIP_v2.pt checkpoint parity
(SURVEY.md build-plan milestone 4): the reference CTViT encoder semantics —
patch embed (ctvit.py:170-175), continuous position bias
(attention.py:229-276), QK-norm attention (attention.py:88-181), PEG
(attention.py:55-84), GEGLU feedforward (attention.py:38-51), cosine VQ
(vector-quantize-pytorch 1.1.2 CosineSimCodebook as configured at
ctvit.py:188), factorized encode (ctvit.py:282-307, incl. the temporal PEG
memory-reinterpretation quirk) — are hand-written here in plain torch, the
torch weights are loaded through convert/torch_to_jax.py, and the flax
CTViT's `return_encoded_tokens=True` output (the production CLIP path,
ct_clip.py:715) must match numerically.  This verifies the converter's
values (not just shapes) and every encoder op end to end.
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

# tiny geometry: every structural feature active, CPU-fast
DIM, HEADS, DIM_HEAD = 16, 2, 8
IMAGE, PATCH, TPATCH, FRAMES = 16, 8, 2, 4
DEPTH_S, DEPTH_T, CODEBOOK = 2, 2, 32
SCALE = 8.0


class TGammaLN(nn.Module):
    """Bias-less LayerNorm (attention.py:28-35)."""

    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(dim))
        self.register_buffer("beta", torch.zeros(dim))

    def forward(self, x):
        return F.layer_norm(x, x.shape[-1:], self.gamma, self.beta)


class TGEGLU(nn.Module):
    def forward(self, x):
        x, gate = x.chunk(2, dim=-1)
        return F.gelu(gate) * x


def t_feedforward(dim, mult=4):
    inner = int(mult * (2 / 3) * dim)
    return nn.Sequential(nn.LayerNorm(dim),
                         nn.Linear(dim, inner * 2, bias=False), TGEGLU(),
                         nn.Dropout(0.0), nn.Linear(inner, dim, bias=False))


class TPEG(nn.Module):
    """Causal depthwise 3D conv positional encoding (attention.py:55-84)."""

    def __init__(self, dim):
        super().__init__()
        self.dsconv = nn.Conv3d(dim, dim, 3, groups=dim)

    def forward(self, x, shape):
        orig_shape = x.shape
        # reference: x.reshape(*shape, -1) — a raw memory reinterpretation
        # when x arrives as ((b h w), t, d) from the temporal stage
        x = x.reshape(*shape, -1)
        x = x.permute(0, 4, 1, 2, 3)  # b ... d -> b d ...
        x = F.pad(x, (1, 1, 1, 1, 2, 0), value=0.0)  # causal frame pad
        x = self.dsconv(x)
        x = x.permute(0, 2, 3, 4, 1)
        return x.reshape(orig_shape)


class TAttention(nn.Module):
    """QK-norm attention, self-attention config (attention.py:88-181:
    num_null_kv=0, no mask, optional additive bias, scale=8)."""

    def __init__(self, dim, heads, dim_head):
        super().__init__()
        self.heads = heads
        inner = heads * dim_head
        self.norm = TGammaLN(dim)
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(dim, inner * 2, bias=False)
        self.q_scale = nn.Parameter(torch.ones(dim_head))
        self.k_scale = nn.Parameter(torch.ones(dim_head))
        self.null_kv = nn.Parameter(torch.randn(heads, 0, dim_head))
        self.to_out = nn.Linear(inner, dim, bias=False)

    def forward(self, x, attn_bias=None):
        b, n, _ = x.shape
        h = self.heads
        # kv_input is captured BEFORE the norm (attention.py:139-143: the
        # reference norms only the query input in self-attention)
        kv_input = x
        x = self.norm(x)
        q = self.to_q(x)
        k, v = self.to_kv(kv_input).chunk(2, dim=-1)
        q, k, v = (t.reshape(b, n, h, -1).permute(0, 2, 1, 3)
                   for t in (q, k, v))
        q, k = F.normalize(q, dim=-1), F.normalize(k, dim=-1)
        q = q * self.q_scale
        k = k * self.k_scale
        sim = torch.einsum("bhid,bhjd->bhij", q, k) * SCALE
        if attn_bias is not None:
            sim = sim + attn_bias
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bhij,bhjd->bhid", attn, v)
        out = out.permute(0, 2, 1, 3).reshape(b, n, -1)
        return self.to_out(out)


class TTransformer(nn.Module):
    """attention.py:280-333 layer order: PEG -> self-attn -> FF, each
    residual; final bias-less norm.  ModuleDict keys mirror the reference's
    ModuleList indices so state_dict keys line up ([0]=PEG, [1]=attn,
    [3]=FF)."""

    def __init__(self, dim, depth, heads, dim_head):
        super().__init__()
        self.layers = nn.ModuleList([
            nn.ModuleDict({"0": TPEG(dim),
                           "1": TAttention(dim, heads, dim_head),
                           "3": t_feedforward(dim)})
            for _ in range(depth)])
        self.norm_out = TGammaLN(dim)

    def forward(self, x, video_shape, attn_bias=None):
        for layer in self.layers:
            x = layer["0"](x, shape=video_shape) + x
            x = layer["1"](x, attn_bias=attn_bias) + x
            x = layer["3"](x) + x
        return self.norm_out(x)


class TCPB(nn.Module):
    """ContinuousPositionBias, num_dims=2, layers=2, log_dist
    (attention.py:229-276)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.net = nn.ModuleList([
            nn.Sequential(nn.Linear(2, dim), nn.LeakyReLU(0.1)),
            nn.Sequential(nn.Linear(dim, dim), nn.LeakyReLU(0.1)),
            nn.Linear(dim, heads)])

    def forward(self, h, w):
        pos = torch.stack(torch.meshgrid(torch.arange(h), torch.arange(w),
                                         indexing="ij"), dim=-1)
        grid = pos.reshape(-1, 2).float()
        rel = grid[:, None, :] - grid[None, :, :]
        rel = torch.sign(rel) * torch.log(rel.abs() + 1)
        for layer in self.net:
            rel = layer(rel)
        return rel.permute(2, 0, 1)  # (heads, i, j)


class TCodebookHolder(nn.Module):
    def __init__(self, codebook_size, dim):
        super().__init__()
        embed = F.normalize(torch.randn(codebook_size, dim), dim=-1)
        self.register_buffer("embed", embed)
        self.register_buffer("cluster_size", torch.zeros(codebook_size))


class TVQ(nn.Module):
    """Cosine-sim VQ eval forward (vqpt 1.1.2: l2norm input + codes, argmax
    dot product, quantize = stored embed row, straight-through)."""

    def __init__(self, codebook_size, dim):
        super().__init__()
        self._codebook = TCodebookHolder(codebook_size, dim)

    def forward(self, x):
        flat = F.normalize(x, dim=-1)
        codes = F.normalize(self._codebook.embed, dim=-1)
        ind = (flat @ codes.t()).argmax(dim=-1)
        quantize = self._codebook.embed[ind]
        return x + (quantize - x).detach(), ind


class TCTViT(nn.Module):
    def __init__(self):
        super().__init__()
        pd = TPATCH * PATCH * PATCH  # channels=1
        self.to_patch_emb = nn.Sequential(
            nn.Identity(),  # stands in for the Rearrange at index 0
            nn.LayerNorm(pd), nn.Linear(pd, DIM), nn.LayerNorm(DIM))
        self.spatial_rel_pos_bias = TCPB(DIM, HEADS)
        self.enc_spatial_transformer = TTransformer(DIM, DEPTH_S, HEADS,
                                                    DIM_HEAD)
        self.enc_temporal_transformer = TTransformer(DIM, DEPTH_T, HEADS,
                                                     DIM_HEAD)
        self.vq = TVQ(CODEBOOK, DIM)

    def forward(self, video, return_pre_vq: bool = False):
        """video (b, c, f, H, W) -> encoded+quantized tokens (b, t, h, w, d)
        (the ctvit.py:353-412 return_encoded_tokens path)."""
        b, c, f, H, W = video.shape
        pt, p = TPATCH, PATCH
        t, h, w = f // pt, H // p, W // p
        # Rearrange 'b c (t pt) (h p1) (w p2) -> b t h w (c pt p1 p2)'
        x = video.reshape(b, c, t, pt, h, p, w, p)
        x = x.permute(0, 2, 4, 6, 1, 3, 5, 7).reshape(b, t, h, w, -1)
        tokens = self.to_patch_emb(x)

        video_shape = (b, t, h, w)
        # spatial (ctvit.py:282-298)
        x = tokens.reshape(b * t, h * w, -1)
        bias = self.spatial_rel_pos_bias(h, w)
        x = self.enc_spatial_transformer(x, video_shape, attn_bias=bias)
        x = x.reshape(b, t, h, w, -1)
        # temporal (ctvit.py:299-303): true rearrange in, PEG inside
        # reinterprets ((b h w), t, d) memory as (b, t, h, w, d)
        x = x.permute(0, 2, 3, 1, 4).reshape(b * h * w, t, -1)
        x = self.enc_temporal_transformer(x, video_shape)
        x = x.reshape(b, h, w, t, -1).permute(0, 3, 1, 2, 4)
        # VQ over packed tokens (ctvit.py:396-403)
        flat = x.reshape(b, t * h * w, -1)
        if return_pre_vq:
            return flat
        quant, _ = self.vq(flat)
        return quant.reshape(b, t, h, w, -1)


def test_ctvit_encoder_matches_torch_transcription():
    from ct_clip_tpu import CTViTConfig
    from ct_clip_tpu.convert.torch_to_jax import ctvit_params_from_torch
    from ct_clip_tpu.models.ctvit import CTViT, from_torch_layout

    torch.manual_seed(0)
    tmodel = TCTViT().eval()
    # non-trivial learned scales and codebook so QK-norm scaling is exercised
    with torch.no_grad():
        for layer in (list(tmodel.enc_spatial_transformer.layers)
                      + list(tmodel.enc_temporal_transformer.layers)):
            layer["1"].q_scale.mul_(torch.rand(DIM_HEAD) + 0.5)
            layer["1"].k_scale.mul_(torch.rand(DIM_HEAD) + 0.5)

    video_t = torch.randn(2, 1, FRAMES, IMAGE, IMAGE)
    with torch.no_grad():
        ref = tmodel(video_t).numpy()
        ref_pre_vq = tmodel(video_t, return_pre_vq=True).numpy()

    cfg = CTViTConfig(dim=DIM, codebook_size=CODEBOOK, image_size=IMAGE,
                      patch_size=PATCH, temporal_patch_size=TPATCH,
                      num_frames=FRAMES, spatial_depth=DEPTH_S,
                      temporal_depth=DEPTH_T, dim_head=DIM_HEAD, heads=HEADS)
    params, vq_state = ctvit_params_from_torch(tmodel.state_dict(), cfg)
    model = CTViT(cfg)
    video_j = from_torch_layout(jnp.asarray(video_t.numpy()))
    got = np.asarray(model.apply({"params": params, "vq": vq_state}, video_j,
                                 return_encoded_tokens=True))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    # ALSO compare the continuous pre-VQ features: the quantized output is a
    # codebook row lookup, so identical indices would mask any encoder
    # divergence below the assignment-flip threshold (this caught a real
    # pre-norm-vs-post-norm kv discrepancy once).
    variables = {"params": params, "vq": vq_state}
    tokens = model.apply(variables, video_j.astype(jnp.float32),
                         method=CTViT.embed_patches)
    pre_vq = model.apply(variables, tokens, method=CTViT.encode)
    b, t, h, w, d = pre_vq.shape
    np.testing.assert_allclose(np.asarray(pre_vq).reshape(b, t * h * w, d),
                               ref_pre_vq, atol=1e-4, rtol=1e-4)
