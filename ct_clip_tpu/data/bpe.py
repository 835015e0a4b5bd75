"""CLIP-style byte-pair-encoding tokenizer.

Capability parity with the reference's `SimpleTokenizer`
(CT_CLIP/ct_clip/tokenizer.py:58-167, itself the OpenAI CLIP BPE).  The
production CT-CLIP text path uses the HF CXR-BERT WordPiece tokenizer
(data/tokenizer.py); this BPE variant exists for the fallback
TextTransformer tower and for users migrating pipelines that tokenized with
it.

The 49152-merge vocabulary is a data asset, not code: pass its path
explicitly, set CTCLIP_BPE_VOCAB, or rely on the standard
`bpe_simple_vocab_16e6.txt` from the OpenAI CLIP release being on disk.
Text canonicalization: the reference runs ftfy.fix_text + html.unescape;
ftfy is optional here (identity for already-well-formed text, which is all
CT-RATE reports are) and used when importable.
"""
from __future__ import annotations

import html
import os
from functools import lru_cache
from pathlib import Path
from typing import Dict, List, Sequence, Tuple, Union

import numpy as np

SOT, EOT = "<|startoftext|>", "<|endoftext|>"
VOCAB_SIZE = 49408
_NUM_MERGES = 49152 - 256 - 2


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 reversible byte <-> printable-unicode table: printable latin-1
    bytes map to themselves, the rest to 256+k codepoints."""
    printable = (list(range(ord("!"), ord("~") + 1))
                 + list(range(ord("\xa1"), ord("\xac") + 1))
                 + list(range(ord("\xae"), ord("\xff") + 1)))
    table = {b: chr(b) for b in printable}
    n = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + n)
            n += 1
    return table


def _canonicalize(text: str) -> str:
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return " ".join(text.split()).strip().lower()


class SimpleBpeTokenizer:
    """encode/decode/tokenize with the CLIP merge table.

    `bpe_path`: merges file (first line is a version header; one merge pair
    per line).  Defaults to $CTCLIP_BPE_VOCAB.
    """

    def __init__(self, bpe_path: Union[str, Path, None] = None):
        import regex

        if bpe_path is None:
            bpe_path = os.environ.get("CTCLIP_BPE_VOCAB")
        if bpe_path is None or not Path(bpe_path).exists():
            raise FileNotFoundError(
                "BPE merges file not found; pass bpe_path or set "
                "CTCLIP_BPE_VOCAB to a bpe_simple_vocab_16e6.txt")
        lines = Path(bpe_path).read_text(encoding="utf8").split("\n")
        merges = [tuple(ln.split()) for ln in lines[1:_NUM_MERGES + 1]
                  if ln.strip()]

        byte_syms = list(bytes_to_unicode().values())
        vocab = (byte_syms + [s + "</w>" for s in byte_syms]
                 + ["".join(m) for m in merges] + [SOT, EOT])
        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.ranks: Dict[Tuple[str, str], int] = {
            m: i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.vocab_size = len(vocab)
        self._cache: Dict[str, str] = {SOT: SOT, EOT: EOT}
        # CLIP word splitter: contractions, letter runs, single digits,
        # punctuation runs, and the special tokens themselves
        self._pat = regex.compile(
            r"<\|startoftext\|>|<\|endoftext\|>"
            r"|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            regex.IGNORECASE)

    # ------------------------------------------------------------------ bpe
    def _merge_word(self, token: str) -> str:
        """Greedy lowest-rank pair merging of one byte-encoded word; the
        last symbol carries the </w> end-of-word marker."""
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        symbols: List[str] = list(token[:-1]) + [token[-1] + "</w>"]
        if len(symbols) == 1:
            return token + "</w>"
        while len(symbols) > 1:
            pairs = {(symbols[i], symbols[i + 1])
                     for i in range(len(symbols) - 1)}
            best = min(pairs, key=lambda p: self.ranks.get(p, float("inf")))
            if best not in self.ranks:
                break
            a, b = best
            out: List[str] = []
            i = 0
            while i < len(symbols):
                if (symbols[i] == a and i + 1 < len(symbols)
                        and symbols[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            symbols = out
        word = " ".join(symbols)
        self._cache[token] = word
        return word

    # ------------------------------------------------------------- encoding
    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for word in self._pat.findall(_canonicalize(text)):
            byte_word = "".join(self.byte_encoder[b]
                                for b in word.encode("utf-8"))
            ids.extend(self.encoder[s]
                       for s in self._merge_word(byte_word).split(" "))
        return ids

    def decode(self, ids: Sequence[int], remove_special: bool = True) -> str:
        ids = [int(i) for i in np.asarray(ids).reshape(-1)]
        if remove_special:
            special = {self.encoder[SOT], self.encoder[EOT], 0}
            ids = [i for i in ids if i not in special]
        text = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def tokenize(self, texts: Union[str, List[str]], context_length: int = 256,
                 truncate_text: bool = False,
                 pad_to_context_length: bool = False) -> np.ndarray:
        """Batch-encode to a padded (n, L) int array (tokenizer.py:139-167:
        zero padding to the batch max; error on overflow unless truncating)."""
        if isinstance(texts, str):
            texts = [texts]
        encoded = [self.encode(t) for t in texts]
        max_len = max((len(e) for e in encoded), default=0)
        if max_len > context_length:
            if truncate_text:
                encoded = [e[:context_length] for e in encoded]
                max_len = context_length
            else:
                raise RuntimeError(
                    f"input too long for context length {context_length}")
        if pad_to_context_length:
            max_len = context_length
        out = np.zeros((len(encoded), max_len), dtype=np.int64)
        for r, e in enumerate(encoded):
            out[r, : len(e)] = e
        return out
