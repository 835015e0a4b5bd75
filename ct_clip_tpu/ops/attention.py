"""Attention blocks.

Two families, mirroring the reference's two stacks:

* `QKNormAttention` / `MaskgitTransformer` — transformer_maskgit/attention.py:
  88-181/280-333.  QK l2-norm with learned per-dim scales (fixed logit scale 8),
  optional null key/values, additive attention bias (continuous position bias),
  ALiBi for causal, PEG depthwise-conv positional encoding.

* `ClipAttention` / `ClipTransformer` — CT_CLIP/ct_clip/ct_clip.py:198-286.
  Plain scaled dot-product with fused qkv projection, f32 softmax, optional
  rotary embedding and causal mask; used by the fallback text/vision towers.

All attention math runs in f32 softmax; matmuls go through the MXU with
`preferred_element_type=f32` semantics via jnp.einsum on f32/bf16 operands.
Sequence lengths here are tiny (576 spatial / 24 temporal / 512 text) so plain
XLA attention maps well onto the MXU; a Pallas fused path is provided in
ops/pallas for the spatial stage.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .mlp import ClipFeedForward, MaskgitFeedForward
from .norms import ClipLayerNorm, GammaLayerNorm, l2norm

NEG_INF = -3.4028234663852886e38  # -torch.finfo(float32).max


def alibi_slopes(heads: int) -> jnp.ndarray:
    """ALiBi per-head slopes (transformer_maskgit/attention.py:203-213)."""

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(heads).is_integer():
        s = pow2_slopes(heads)
    else:
        closest = 2 ** math.floor(math.log2(heads))
        s = (pow2_slopes(closest)
             + pow2_slopes(2 * closest)[0::2][: heads - closest])
    return jnp.asarray(s, dtype=jnp.float32)


def alibi_bias(heads: int, i: int, j: int) -> jnp.ndarray:
    """(heads, i, j) ALiBi bias (attention.py:195-200): -|j_pos - i_pos| * slope
    with the query block right-aligned against the keys."""
    i_arange = jnp.arange(j - i, j)
    j_arange = jnp.arange(j)
    bias = -jnp.abs(j_arange[None, None, :] - i_arange[None, :, None])
    return bias.astype(jnp.float32) * alibi_slopes(heads)[:, None, None]


def relative_position_grid(dims: Tuple[int, ...], log_dist: bool = True) -> jnp.ndarray:
    """(N, N, len(dims)) signed-log relative coordinates for an nd grid
    (transformer_maskgit/attention.py:262-270)."""
    axes = [jnp.arange(d) for d in dims]
    grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, len(dims))
    rel = grid[:, None, :] - grid[None, :, :]
    rel = rel.astype(jnp.float32)
    if log_dist:
        rel = jnp.sign(rel) * jnp.log(jnp.abs(rel) + 1.0)
    return rel


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _cpb_expand(table, dims):
    """(prod(2d-1), heads) offset table -> (N, N, heads) pairwise bias via a
    static index map (N = prod(dims)).

    Forward is a plain gather.  The custom VJP replaces XLA's
    gather-gradient — a serial (N^2, heads) -> (offsets, heads) scatter-add,
    2.2 ms/step at the production spatial shape plus reorder copies, and
    GSPMD-hostile — with two tiny indicator matmuls, exploiting that the
    offset index factorizes per axis (idx = idx_h * (2w-1) + idx_w):
    d_table = Eh @ reorder(g) @ Ew^T with Eh[a, (ih,jh)] = [ih-jh+h-1 = a].
    MXU work is ~0.25 GFLOP; numerics are exact (f32 sums of the same
    terms, different association).  Non-2D dims fall back to scatter."""
    import numpy as np

    idx = _cpb_index_map(dims)
    return jnp.take(table, jnp.asarray(idx), axis=0)


def _cpb_index_map(dims):
    import numpy as np

    pos = np.stack(np.meshgrid(*[np.arange(d) for d in dims],
                               indexing="ij"), axis=-1).reshape(-1, len(dims))
    rel = pos[:, None, :] - pos[None, :, :]
    idx = np.zeros(rel.shape[:2], np.int32)
    for a, d in enumerate(dims):
        idx = idx * (2 * d - 1) + (rel[..., a] + d - 1)
    return idx


def _axis_indicator(d: int):
    """(2d-1, d*d) f32 with E[a, i*d + j] = [i - j + d - 1 == a]."""
    import numpy as np

    i = np.arange(d)
    rel = (i[:, None] - i[None, :] + d - 1).reshape(-1)   # (d*d,)
    return (np.arange(2 * d - 1)[:, None] == rel[None, :]).astype(np.float32)


def _cpb_expand_fwd(table, dims):
    return _cpb_expand(table, dims), None


def _cpb_expand_bwd(dims, _, g):
    gf = g.astype(jnp.float32)
    if len(dims) == 2:
        h, w = dims
        hh = jnp.asarray(_axis_indicator(h))  # (2h-1, h*h)
        ww = jnp.asarray(_axis_indicator(w))  # (2w-1, w*w)
        heads = g.shape[-1]
        # (hw, hw, H) -> (ih, jh, iw, jw, H) pair-major per axis
        g5 = gf.reshape(h, w, h, w, heads).transpose(0, 2, 1, 3, 4)
        # HIGHEST precision: TPU's default matmul precision truncates f32
        # operands to one bf16 pass (~3e-3 rel on the table grad, measured);
        # these matmuls are ~0.25 GFLOP, exactness is free
        hp = jax.lax.Precision.HIGHEST
        t1 = jnp.matmul(hh, g5.reshape(h * h, w * w * heads), precision=hp)
        t2 = jnp.matmul(ww, t1.reshape(2 * h - 1, w * w, heads)
                        .transpose(1, 0, 2).reshape(w * w, -1), precision=hp)
        dt = (t2.reshape(2 * w - 1, 2 * h - 1, heads)
              .transpose(1, 0, 2).reshape((2 * h - 1) * (2 * w - 1), heads))
        return (dt.astype(g.dtype),)
    idx = jnp.asarray(_cpb_index_map(dims))
    n_off = 1
    for d in dims:
        n_off *= 2 * d - 1
    dt = jnp.zeros((n_off, g.shape[-1]), gf.dtype).at[idx].add(gf)
    return (dt.astype(g.dtype),)


_cpb_expand.defvjp(_cpb_expand_fwd, _cpb_expand_bwd)


class ContinuousPositionBias(nn.Module):
    """MLP over log-distance relative coords -> per-head bias
    (transformer_maskgit/attention.py:229-276; SwinV2 arXiv:2111.09883)."""

    dim: int
    heads: int
    num_dims: int = 2
    layers: int = 2
    log_dist: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, *dimensions: int) -> jnp.ndarray:
        # The bias value depends only on the RELATIVE offset, so run the MLP
        # over the prod(2d-1) distinct offsets instead of all N^2 pairs
        # (576^2 -> 47^2 for the spatial stage, ~150x less MLP work; the
        # reference evaluates the full pair grid) and gather with a static
        # index map.  Numerics are bit-identical: equal offsets give equal
        # MLP inputs.  XLA also lowered the full-grid Dense stack to slow
        # f32 1x1 convolutions (~9 ms/step profiled).
        import numpy as np

        nd = len(dimensions)
        offsets = [np.arange(-(d - 1), d) for d in dimensions]
        uniq = np.stack(np.meshgrid(*offsets, indexing="ij"),
                        axis=-1).reshape(-1, nd).astype(np.float32)
        if self.log_dist:
            uniq = np.sign(uniq) * np.log(np.abs(uniq) + 1.0)

        x = jnp.asarray(uniq)
        x = nn.Dense(self.dim, dtype=jnp.float32, name="net_0")(x)
        x = nn.leaky_relu(x, negative_slope=0.1)
        for li in range(self.layers - 1):
            x = nn.Dense(self.dim, dtype=jnp.float32, name=f"net_{li + 1}")(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
        x = nn.Dense(self.heads, dtype=jnp.float32, name="net_out")(x)
        # gather with a matmul-form VJP (training runs this every step;
        # XLA's gather-grad is a slow serial scatter, see _cpb_expand)
        bias = _cpb_expand(x, tuple(dimensions))  # (N, N, heads)
        return jnp.transpose(bias, (2, 0, 1))  # (heads, N, N)


def _sdpa(q, k, v, bias=None, mask=None, causal=False, heads_alibi=None,
          dropout_rng=None, dropout_rate=0.0, deterministic=True):
    """Shared softmax(QK^T + bias) V core.  q,k,v: (b, h, n, d); softmax in f32."""
    dropout_active = dropout_rate > 0.0 and not deterministic
    if (not causal and mask is None and not dropout_active
            and q.shape[-2] == k.shape[-2]):
        # fused Pallas path: scores stay in VMEM (ops/pallas/attention.py);
        # identical numerics, XLA fallback off-TPU
        from .pallas.attention import fused_attention

        return fused_attention(q, k, v, bias)
    sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
    i, j = sim.shape[-2], sim.shape[-1]
    if bias is not None:
        sim = sim + bias.astype(jnp.float32)
    if mask is not None:
        # mask: (b, j) True = attend
        sim = jnp.where(mask[:, None, None, :], sim, NEG_INF)
    if causal:
        if heads_alibi is not None:
            sim = sim + alibi_bias(heads_alibi, i, j)[None]
        causal_mask = jnp.triu(jnp.ones((i, j), dtype=bool), k=j - i + 1)
        sim = jnp.where(causal_mask[None, None], NEG_INF, sim)
    attn = jax.nn.softmax(sim, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = attn * keep / (1.0 - dropout_rate)
    attn = attn.astype(v.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


class QKNormAttention(nn.Module):
    """transformer_maskgit/attention.py:88-181."""

    dim: int
    dim_context: Optional[int] = None
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    num_null_kv: int = 0
    norm_context: bool = True
    dropout: float = 0.0
    scale: float = 8.0
    dtype: jnp.dtype = jnp.float32
    residual: bool = False  # fold the transformer's `attn(x) + x` in-kernel

    @nn.compact
    def __call__(self, x, mask=None, context=None, attn_bias=None,
                 deterministic: bool = True):
        from .mlp import _DenseKernel

        b = x.shape[0]
        h, dh = self.heads, self.dim_head
        dim_context = self.dim_context if self.dim_context is not None else self.dim

        if context is not None and self.norm_context:
            context = GammaLayerNorm(dim_context, name="context_norm")(context)
        kv_input = context if context is not None else x

        from .norms import _GammaParam, layer_norm

        # kv_input above is captured from the PRE-norm x (attention.py:139-143)
        x_pre = x
        gamma = _GammaParam(self.dim, name="norm")()
        x = layer_norm(x, gamma)  # == GammaLayerNorm (eps 1e-5)

        wq = _DenseKernel(self.dim, h * dh, name="to_q")()
        wkv = _DenseKernel(dim_context, h * dh * 2, name="to_kv")()

        dropout_active = self.dropout > 0 and not deterministic
        if x.ndim == 4:
            # NATIVE grid layout (b, n, S, dim): the temporal stage's
            # sequences read straight from the (b, t, h*w, d) token grid —
            # no sequence-major transpose ever exists (the caller gates
            # this path, ctvit.py encode).
            assert (mask is None and attn_bias is None and context is None
                    and not self.causal and self.num_null_kv == 0
                    and not dropout_active), \
                "grid-layout attention supports the plain temporal stage only"
            from .pallas.small_attention import \
                fused_small_qknorm_attention_grid

            q_scale = self.param("q_scale", nn.initializers.ones, (dh,))
            k_scale = self.param("k_scale", nn.initializers.ones, (dh,))
            wout = _DenseKernel(h * dh, self.dim, name="to_out")()
            return fused_small_qknorm_attention_grid(
                x_pre, gamma, wq, wkv, q_scale, k_scale, wout,
                h, dh, self.scale, self.dtype, self.residual)

        if (x.shape[1] < 128 and mask is None and attn_bias is None
                and context is None and not self.causal
                and self.num_null_kv == 0 and not dropout_active):
            # Small-sequence path (the CTViT temporal stage, n=24).
            q_scale = self.param("q_scale", nn.initializers.ones, (dh,))
            k_scale = self.param("k_scale", nn.initializers.ones, (dh,))

            from .pallas.small_attention import (_plan,
                                                 fused_small_qknorm_attention)

            if _plan(x.shape[0], x.shape[1], self.dim, h, dh) is not None:
                # One fused Pallas pass (LN + projections + per-head QK-norm
                # + block-diagonal packed attention + out proj): 8.0 ->
                # 0.93 ms per layer call at the production temporal shape.
                wout = _DenseKernel(h * dh, self.dim, name="to_out")()
                return fused_small_qknorm_attention(
                    x_pre, gamma, wq, wkv, q_scale, k_scale, wout,
                    h, dh, self.scale, self.dtype, self.residual)

            # XLA fallback: project each head separately so the
            # (b, n, h, dh) -> (b, h, n, dh) relayout never materializes —
            # measured 11.6 -> 8.0 ms per layer call at production shape.
            xc = x.astype(self.dtype)
            # k/v come from the PRE-norm input (attention.py:139-143:
            # kv_input is captured before x = self.norm(x))
            kvc = kv_input.astype(self.dtype)
            outs = []
            for hh in range(h):
                sl = slice(hh * dh, (hh + 1) * dh)
                sv = slice(h * dh + hh * dh, h * dh + (hh + 1) * dh)
                qh = xc @ wq[:, sl].astype(self.dtype)
                kh = kvc @ wkv[:, sl].astype(self.dtype)
                vh = kvc @ wkv[:, sv].astype(self.dtype)
                qh = l2norm(qh) * q_scale.astype(qh.dtype) * self.scale
                kh = l2norm(kh) * k_scale.astype(kh.dtype)
                sim = jnp.einsum("bid,bjd->bij", qh, kh,
                                 preferred_element_type=jnp.float32)
                attn = jax.nn.softmax(sim, axis=-1).astype(vh.dtype)
                outs.append(jnp.einsum("bij,bjd->bid", attn, vh))
            out = jnp.concatenate(outs, axis=-1)
            wout = _DenseKernel(h * dh, self.dim, name="to_out")()
            out = out @ wout.astype(self.dtype)
            return out + x_pre if self.residual else out

        from .pallas.spatial_attention import _plan as _spatial_plan

        if (attn_bias is not None and attn_bias.ndim == 3
                and attn_bias.shape == (h, x.shape[1], x.shape[1])
                and mask is None and context is None and not self.causal
                and self.num_null_kv == 0 and not dropout_active
                and _spatial_plan(x.shape[0], x.shape[1], self.dim, h, dh)):
            # Spatial-stage path (the CTViT 576-token planes with CPB bias):
            # one fused Pallas sublayer — no head-major relayout ever exists
            # (~12 ms/step of layout copies at production shape otherwise).
            from .pallas.spatial_attention import \
                fused_spatial_qknorm_attention

            q_scale = self.param("q_scale", nn.initializers.ones, (dh,))
            k_scale = self.param("k_scale", nn.initializers.ones, (dh,))
            wout = _DenseKernel(h * dh, self.dim, name="to_out")()
            return fused_spatial_qknorm_attention(
                x_pre, gamma, wq, wkv, q_scale, k_scale, wout,
                attn_bias, h, dh, self.scale, self.dtype, self.residual)

        q = x.astype(self.dtype) @ wq.astype(self.dtype)
        kv = kv_input.astype(self.dtype) @ wkv.astype(self.dtype)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))

        # null key/values: stored interleaved (h, 2*n, dh); even rows are keys,
        # odd rows values (reference rearrange 'h (n r) d', r=2, attention.py:147-150).
        # Only created when n > 0 (orbax cannot serialize zero-size arrays).
        if self.num_null_kv > 0:
            null_kv = self.param("null_kv", nn.initializers.normal(1.0),
                                 (h, 2 * self.num_null_kv, dh))
            nk = jnp.broadcast_to(null_kv[None, :, 0::2, :], (b, h, self.num_null_kv, dh))
            nv = jnp.broadcast_to(null_kv[None, :, 1::2, :], (b, h, self.num_null_kv, dh))
            k = jnp.concatenate([nk.astype(k.dtype), k], axis=-2)
            v = jnp.concatenate([nv.astype(v.dtype), v], axis=-2)

        q_scale = self.param("q_scale", nn.initializers.ones, (dh,))
        k_scale = self.param("k_scale", nn.initializers.ones, (dh,))
        q = l2norm(q) * q_scale.astype(q.dtype)
        k = l2norm(k) * k_scale.astype(k.dtype)

        if attn_bias is not None:
            # pad bias over the null kv positions (attention.py:160-162)
            attn_bias = jnp.pad(attn_bias, [(0, 0)] * (attn_bias.ndim - 1)
                                + [(self.num_null_kv, 0)])
            if attn_bias.ndim == 3:
                attn_bias = attn_bias[None]
        if mask is not None:
            mask = jnp.pad(mask, [(0, 0), (self.num_null_kv, 0)], constant_values=True)

        rng = self.make_rng("dropout") if dropout_active else None
        out = _sdpa(q * self.scale, k, v, bias=attn_bias, mask=mask,
                    causal=self.causal, heads_alibi=h if self.causal else None,
                    dropout_rng=rng, dropout_rate=self.dropout,
                    deterministic=deterministic)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, h * dh)
        wout = _DenseKernel(h * dh, self.dim, name="to_out")()
        out = out @ wout.astype(self.dtype)
        return out + x_pre if self.residual else out


def apply_rotary(freqs, t):
    """ct_clip.py:166-171 (rotate-half convention)."""
    rot_dim = freqs.shape[-1]
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    x1, x2 = jnp.split(t_rot, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    t_rot = t_rot * jnp.cos(freqs) + rotated * jnp.sin(freqs)
    return jnp.concatenate([t_rot, t_pass], axis=-1)


def rotary_freqs(seq_len: int, dim: int) -> jnp.ndarray:
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.concatenate([freqs, freqs], axis=-1)


class ClipAttention(nn.Module):
    """CT_CLIP/ct_clip/ct_clip.py:198-240 (fused qkv, f32 softmax, out LN)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, rotary_pos_emb=None, deterministic=True):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        qkv = nn.Dense(h * dh * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        q = q * (dh ** -0.5)
        if rotary_pos_emb is not None:
            # reference applies rotary to q, k AND v (ct_clip.py:217-219)
            q, k, v = (apply_rotary(rotary_pos_emb, t) for t in (q, k, v))

        rng = self.make_rng("dropout") if (self.dropout > 0 and not deterministic) else None
        out = _sdpa(q, k, v, mask=mask, causal=self.causal,
                    dropout_rng=rng, dropout_rate=self.dropout,
                    deterministic=deterministic)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)
        return ClipLayerNorm(self.dim, name="out_norm")(out)


class PEG(nn.Module):
    """Positional encoding generator: 3x3x3 depthwise conv over the (t, h, w)
    grid with causal frame padding (transformer_maskgit/attention.py:56-84).

    Input must already be shaped (b, t, h, w, d) by the caller; the reference's
    reshape semantics (including the temporal-stage memory reinterpretation,
    ctvit.py:299-303 + attention.py:69-70) live in the Transformer wrapper.

    With residual=True the residual stream is computed in self.dtype (x is
    cast before the fused conv+add), so callers must keep x in self.dtype —
    an f32 residual stream fed to a bfloat16 PEG would be silently
    downcast.  Asserted below.
    """

    dim: int
    causal: bool = False
    residual: bool = False
    dtype: jnp.dtype = jnp.float32
    # rotated=True computes the reference's temporal-stage semantics on the
    # NATIVE (b, t, h, w, d) grid: the reference reinterprets
    # (b,h,w,t,d)-ordered memory as (b,t,h,w,d) (ctvit.py:299-303), which
    # for cubic grids (t == h == w) equals relabeling axes (t,h,w)->(h,w,t)
    # — i.e. the SAME conv with the kernel tap axes rotated and the causal
    # pad moved to the h axis.  No transpose of the activations is needed.
    rotated: bool = False

    @nn.compact
    def __call__(self, x):
        # raw params with nn.Conv's exact tree ({dsconv: {kernel, bias}}) and
        # initializers, so checkpoints are unchanged; the op itself is a
        # Pallas stencil in the token-native (..., c) layout on TPU
        # (ops/pallas/peg.py) with a lax.conv fallback elsewhere.
        # residual=True folds the transformer's `peg(x) + x` into the same
        # kernel pass.
        class _ConvParams(nn.Module):
            dim: int

            @nn.compact
            def __call__(self):
                k = self.param("kernel", nn.initializers.lecun_normal(),
                               (3, 3, 3, 1, self.dim))
                b = self.param("bias", nn.initializers.zeros, (self.dim,))
                return k, b

        kernel, bias = _ConvParams(self.dim, name="dsconv")()
        from .pallas.peg import peg_conv

        if self.residual and x.dtype != self.dtype:
            raise ValueError(
                f"PEG(residual=True) would downcast the {x.dtype} residual "
                f"stream to {self.dtype}; pass x in self.dtype")
        if self.rotated:
            assert x.shape[1] == x.shape[2] == x.shape[3], \
                "rotated PEG (native temporal layout) needs a cubic grid"
            # K_y[c, a, b] = K[a, b, c]: tap axes relabeled (t,h,w)->(h,w,t)
            kernel = jnp.transpose(kernel, (2, 0, 1, 3, 4))
            return peg_conv(x.astype(self.dtype), kernel, bias, self.causal,
                            self.residual, 1)
        return peg_conv(x.astype(self.dtype), kernel, bias, self.causal,
                        self.residual)


class MaskgitTransformer(nn.Module):
    """transformer_maskgit/attention.py:280-333: [PEG?, self-attn, cross-attn?,
    FF] x depth + final LN, all residual."""

    dim: int
    depth: int
    dim_context: Optional[int] = None
    causal: bool = False
    dim_head: int = 64
    heads: int = 8
    ff_mult: float = 4.0
    peg: bool = False
    peg_causal: bool = False
    attn_num_null_kv: int = 2
    has_cross_attn: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, video_shape: Optional[Tuple[int, int, int, int]] = None,
                 attn_bias=None, context=None, self_attn_mask=None,
                 cross_attn_context_mask=None, deterministic: bool = True,
                 grid_layout: bool = False):
        # Per-block gradient checkpointing, the jax.checkpoint equivalent of
        # the reference's torch.utils.checkpoint toggle (ct_clip.py:64-74).
        # nn.remat preserves parameter names, so checkpoints are unaffected.
        if self.remat:
            Attn = nn.remat(QKNormAttention, static_argnums=(5,))
            FF = nn.remat(MaskgitFeedForward, static_argnums=(2,))
        else:
            Attn, FF = QKNormAttention, MaskgitFeedForward

        # grid_layout=True: x is the NATIVE (b, t, h*w, d) token grid (the
        # temporal stage without the (b,h,w,t,d) transpose).  Requires a
        # cubic grid (t == h == w): the reference's PEG memory
        # reinterpretation is then a pure axis relabeling, computed by the
        # rotated PEG below (see PEG.rotated); attention reads t-columns
        # straight from the grid (QKNormAttention 4-D input).
        if grid_layout:
            b_, t_, h_, w_ = video_shape
            assert t_ == h_ == w_ and x.shape[:2] == (b_, t_) \
                and x.shape[2] == h_ * w_, \
                f"grid_layout needs cubic (b,t,h*w,d) input, got {x.shape}"

        for layer in range(self.depth):
            if self.peg:
                # Replicate reference PEG reshape: x.reshape(*video_shape, d).
                # For the spatial stage this recovers the true (b,t,h,w,d) grid;
                # for the temporal stage it reinterprets (b,h,w,t,d)-ordered
                # memory as (b,t,h,w,d) — intentional parity with ctvit.py:301.
                # In grid_layout the stream IS (b,t,h,w,d): the rotated PEG
                # reproduces the reinterpreted semantics without a transpose.
                d = x.shape[-1]
                grid = x.reshape(*video_shape, d)
                peg_out = PEG(self.dim, causal=self.peg_causal, residual=True,
                              dtype=self.dtype, rotated=grid_layout,
                              name=f"layers_{layer}_peg")(grid)
                x = peg_out.reshape(x.shape)

            # residual adds are folded into the sublayer kernels (saves a
            # full HBM read+write of the stream per sublayer on TPU)
            x = Attn(
                self.dim, dim_head=self.dim_head, heads=self.heads,
                causal=self.causal, dropout=self.attn_dropout, dtype=self.dtype,
                residual=True, name=f"layers_{layer}_attn")(
                    x, self_attn_mask, None, attn_bias, deterministic)

            if self.has_cross_attn and context is not None:
                x = Attn(
                    self.dim, dim_context=self.dim_context, dim_head=self.dim_head,
                    heads=self.heads, causal=False, num_null_kv=self.attn_num_null_kv,
                    dropout=self.attn_dropout, dtype=self.dtype,
                    residual=True, name=f"layers_{layer}_cross_attn")(
                        x, cross_attn_context_mask, context, None,
                        deterministic)

            x = FF(self.dim, mult=self.ff_mult, dropout=self.ff_dropout,
                   dtype=self.dtype, residual=True,
                   name=f"layers_{layer}_ff")(x, deterministic)

        return GammaLayerNorm(self.dim, name="norm_out")(x)


class ClipTransformer(nn.Module):
    """CT_CLIP/ct_clip/ct_clip.py:242-286: PreNorm(attn)+x, PreNorm(ff)+x,
    final norm (the fallback text/vision tower stack)."""

    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    ff_mult: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rotary_pos_emb=None, mask=None, deterministic=True):
        x = ClipLayerNorm(self.dim, name="norm_in")(x)  # ct_clip.py:278
        for layer in range(self.depth):
            y = ClipLayerNorm(self.dim, name=f"layers_{layer}_attn_prenorm")(x)
            x = ClipAttention(self.dim, dim_head=self.dim_head, heads=self.heads,
                              causal=self.causal, dropout=self.attn_dropout,
                              dtype=self.dtype, name=f"layers_{layer}_attn")(
                                  y, mask=mask, rotary_pos_emb=rotary_pos_emb,
                                  deterministic=deterministic) + x
            y = ClipLayerNorm(self.dim, name=f"layers_{layer}_ff_prenorm")(x)
            x = ClipFeedForward(self.dim, mult=self.ff_mult, dropout=self.ff_dropout,
                                dtype=self.dtype, name=f"layers_{layer}_ff")(
                                    y, deterministic=deterministic) + x
        return ClipLayerNorm(self.dim, name="norm_out")(x)
