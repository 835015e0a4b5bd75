"""Import the REAL reference sources from /root/reference for parity tests.

The reference packages (`transformer_maskgit`, `ct_clip`) import three
dependencies this image does not ship and two CUDA hard-codings this CPU box
cannot satisfy; this module provides the minimum, clearly-separated harness
to run the *unmodified* reference code anyway:

  * ``beartype`` — identity-decorator shim (the reference only uses
    ``@beartype`` and ``beartype.typing`` re-exports).
  * ``torchvision`` — attribute-stub shim; the reference imports it at module
    scope (ctvit.py:10-13, visual_ssl.py:9) but the paths under test never
    call into it (``use_vgg_and_gan=False``, no augmentations).
  * ``vector_quantize_pytorch`` — a faithful torch transcription of the
    pinned version's cosine-sim codebook (vector-quantize-pytorch==1.1.2,
    transformer_maskgit/setup.py:19) as configured at ctvit.py:188
    (``use_cosine_sim=True``, decay 0.8, commitment weight 1.0, no kmeans
    init, no dead-code expiry).  This doubles as the EMA-trajectory oracle
    for CosineVQ training parity.
  * the reference hard-codes ``torch.device('cuda')`` inside
    ``CTViT.encode``/``decode`` (ctvit.py:291,330) and
    ``ContinuousPositionBias.forward`` (attention.py:261) — ``cpu_patch``
    rebinds the module-global ``torch`` name of the *reference* modules to a
    proxy whose ``device()`` always returns CPU, leaving torch itself and
    every other caller untouched.

Package imports use a stub-package trick (a synthetic package whose
``__path__`` points into /root/reference) so that submodules load verbatim
from the reference tree without executing the package ``__init__``'s heavy
re-exports (MaskGITTransformer pulls in T5/ imageio paths we don't need).
"""
from __future__ import annotations

import importlib
import sys
import types

REF_MASKGIT = "/root/reference/transformer_maskgit/transformer_maskgit"
REF_CTCLIP = "/root/reference/CT_CLIP/ct_clip"


def install_shims() -> None:
    """Idempotently register beartype / torchvision / vqpt shim modules."""
    if "vector_quantize_pytorch" in sys.modules:
        return

    # --- beartype: identity decorator + typing passthrough ----------------
    bt = types.ModuleType("beartype")

    def _beartype(fn=None, **_kw):
        if fn is None:
            return lambda f: f
        return fn

    bt.beartype = _beartype
    bt_typing = types.ModuleType("beartype.typing")
    import typing as _typing

    bt_typing.__getattr__ = lambda name: getattr(_typing, name)
    bt_door = types.ModuleType("beartype.door")
    bt_door.is_bearable = lambda obj, hint: True
    bt.typing = bt_typing
    bt.door = bt_door
    sys.modules["beartype"] = bt
    sys.modules["beartype.typing"] = bt_typing
    sys.modules["beartype.door"] = bt_door

    # --- torchvision: import-safe attribute stubs --------------------------
    def _stub(name: str) -> types.ModuleType:
        mod = types.ModuleType(name)

        def _missing(attr, _name=name):
            if attr.startswith("__"):  # dunder probes (inspect, pickling)
                raise AttributeError(attr)
            raise AttributeError(
                f"reference test shim: {_name}.{attr} is not available "
                "(torchvision is stubbed; the paths under test must not "
                "call it)")

        mod.__getattr__ = _missing
        # a concrete spec so importlib.util.find_spec(...) (transformers'
        # availability probe) sees a well-formed module instead of crashing
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return mod

    tv = _stub("torchvision")
    tv.transforms = _stub("torchvision.transforms")
    tv.utils = _stub("torchvision.utils")
    tv.datasets = _stub("torchvision.datasets")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.utils"] = tv.utils
    sys.modules["torchvision.datasets"] = tv.datasets

    # --- vector_quantize_pytorch==1.1.2, cosine codebook path -------------
    import torch
    import torch.nn.functional as F
    from torch import nn

    def l2norm(t):
        return F.normalize(t, p=2, dim=-1)

    def ema_inplace(moving_avg, new, decay):
        moving_avg.data.mul_(decay).add_(new, alpha=1.0 - decay)

    class CosineSimCodebook(nn.Module):
        """vqpt 1.1.2 CosineSimCodebook, kmeans_init=False, single-GPU:
        l2-normalized inputs and codes, argmax dot-product assignment,
        lookup from the RAW (unnormalized) stored embed, EMA of cluster
        sizes on raw bins, EMA of the embed toward the l2-normalized
        cluster means with empty bins frozen at their old rows."""

        def __init__(self, dim, codebook_size, decay=0.8, eps=1e-5,
                     threshold_ema_dead_code=0):
            super().__init__()
            self.decay = decay
            self.eps = eps
            self.codebook_size = codebook_size
            self.threshold_ema_dead_code = threshold_ema_dead_code
            embed = l2norm(torch.randn(codebook_size, dim))
            self.register_buffer("embed", embed)
            self.register_buffer("cluster_size", torch.zeros(codebook_size))
            self.register_buffer("initted", torch.Tensor([True]))

        def forward(self, x):
            shape, dtype = x.shape, x.dtype
            flatten = x.reshape(-1, shape[-1])
            flatten = l2norm(flatten)

            embed = l2norm(self.embed)
            dist = flatten @ embed.t()
            embed_ind = dist.argmax(dim=-1)
            embed_onehot = F.one_hot(embed_ind, self.codebook_size).type(dtype)
            embed_ind = embed_ind.view(*shape[:-1])
            quantize = F.embedding(embed_ind, self.embed)

            if self.training:
                bins = embed_onehot.sum(0)
                ema_inplace(self.cluster_size, bins, self.decay)

                zero_mask = bins == 0
                bins_min_clamped = bins.masked_fill(zero_mask, 1.0)

                embed_sum = flatten.t() @ embed_onehot
                embed_normalized = (embed_sum / bins_min_clamped.unsqueeze(0)).t()
                embed_normalized = l2norm(embed_normalized)
                embed_normalized = torch.where(zero_mask[..., None],
                                               self.embed, embed_normalized)
                ema_inplace(self.embed, embed_normalized, self.decay)
                assert self.threshold_ema_dead_code == 0, \
                    "shim: dead-code expiry not transcribed (ctvit.py:188 " \
                    "uses the default threshold of 0)"

            return quantize, embed_ind

    class VectorQuantize(nn.Module):
        """vqpt 1.1.2 VectorQuantize for the exact ctvit.py:188 config:
        codebook_dim == dim (identity project in/out), channel-last input,
        single head, straight-through in train mode, MSE commitment loss
        (optionally masked)."""

        def __init__(self, dim, codebook_size, use_cosine_sim=False,
                     decay=0.8, commitment_weight=1.0, eps=1e-5,
                     threshold_ema_dead_code=0, **_kwargs):
            super().__init__()
            assert use_cosine_sim, (
                "shim transcribes the cosine codebook only "
                "(the reference always sets use_cosine_sim=True)")
            self.codebook_size = codebook_size
            self.commitment_weight = commitment_weight
            self._codebook = CosineSimCodebook(
                dim, codebook_size, decay=decay, eps=eps,
                threshold_ema_dead_code=threshold_ema_dead_code)

        @property
        def codebook(self):
            return self._codebook.embed

        def forward(self, x, mask=None):
            quantize, embed_ind = self._codebook(x)

            if self.training:
                quantize = x + (quantize - x).detach()

            loss = torch.tensor([0.0], device=x.device,
                                requires_grad=self.training)
            if self.training and self.commitment_weight > 0:
                detached_quantize = quantize.detach()
                if mask is not None:
                    commit_loss = F.mse_loss(detached_quantize, x,
                                             reduction="none")
                    commit_loss = commit_loss[mask].mean()
                else:
                    commit_loss = F.mse_loss(detached_quantize, x)
                loss = loss + commit_loss * self.commitment_weight

            return quantize, embed_ind, loss

    vq_mod = types.ModuleType("vector_quantize_pytorch")
    vq_mod.VectorQuantize = VectorQuantize
    vq_mod.CosineSimCodebook = CosineSimCodebook
    vq_mod.__version__ = "1.1.2"  # transcription target
    sys.modules["vector_quantize_pytorch"] = vq_mod


def _stub_package(name: str, path: str) -> None:
    """Register `name` as a namespace-style package rooted at `path` without
    running its real __init__ (so individual reference submodules can be
    imported verbatim)."""
    if name in sys.modules:
        return
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    pkg.__package__ = name
    sys.modules[name] = pkg


class _CPUTorch:
    """Proxy for the `torch` module whose device() is pinned to CPU.

    Rebound onto the reference modules' `torch` global so their hard-coded
    torch.device('cuda') calls (ctvit.py:291, attention.py:261) produce CPU
    tensors; every other attribute passes straight through."""

    def __init__(self, real):
        self._real = real

    def __getattr__(self, name):
        if name == "device":
            real = self._real
            return lambda *a, **kw: real.device("cpu")
        return getattr(self._real, name)


def load_reference_maskgit():
    """Import the real transformer_maskgit attention + ctvit modules."""
    install_shims()
    _stub_package("transformer_maskgit", REF_MASKGIT)
    attention = importlib.import_module("transformer_maskgit.attention")
    ctvit = importlib.import_module("transformer_maskgit.ctvit")
    import torch

    proxy = _CPUTorch(torch)
    attention.torch = proxy
    ctvit.torch = proxy
    return attention, ctvit


class _NoNetworkTokenizer:
    """Stands in for BertTokenizer at CTCLIP.__init__ (ct_clip.py:585) —
    air-gapped CI cannot download microsoft/BiomedVLP-CXR-BERT-specialized,
    and the forward path under test never tokenizes."""

    @staticmethod
    def from_pretrained(*_a, **_kw):
        return None


def load_reference_ctclip():
    """Import the real ct_clip.ct_clip module (CTCLIP + loss math)."""
    install_shims()
    _stub_package("ct_clip", REF_CTCLIP)
    mod = importlib.import_module("ct_clip.ct_clip")
    import torch

    mod.torch = _CPUTorch(torch)
    mod.BertTokenizer = _NoNetworkTokenizer
    return mod


def load_reference_visual_ssl():
    """Import the real ct_clip.visual_ssl module (SimSiam/SimCLR heads +
    losses; the torchvision import is shimmed, and the paths under test
    never construct the 2D augmentation pipeline)."""
    install_shims()
    _stub_package("ct_clip", REF_CTCLIP)
    return importlib.import_module("ct_clip.visual_ssl")
