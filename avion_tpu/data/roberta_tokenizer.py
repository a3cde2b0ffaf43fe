"""RoBERTa (GPT-2 scheme) byte-level BPE tokenizer — pure Python.

The legacy EgoVLP text tower (``egonlq/egovlp.py``; reference:
``egonlq/model/model.py:263-296`` encodes queries with a RoBERTa
tokenizer from ``transformers``) needs RoBERTa input ids.  This module
produces them in-repo from a local HuggingFace-format tokenizer
directory (``vocab.json`` + ``merges.txt`` — no hub access), so
``extract_features --legacy`` runs end-to-end from raw text.

The GPT-2 scheme differs from the CLIP BPE (``data/tokenizer.py``) in
every stage, so this is a sibling, not a subclass: no ftfy cleaning and
no lowercasing; a case-sensitive pre-tokenizer whose word pattern
captures ONE leading space (`` ?\\p{L}+``, folded into the ``Ġ``
byte symbol) instead of CLIP's whitespace-splitting; and merges over
raw byte symbols with no ``</w>`` word-end marker.  Specials are
``<s>/<pad>/</s>/<unk>/<mask>`` read from the vocab (RoBERTa ids
0/1/2/3/50264) rather than appended.

Parity is pinned by ``tests/test_roberta_tokenizer.py`` against
``transformers.RobertaTokenizer`` instantiated from the same local
files (the slow reference implementation, fully offline).
"""

from __future__ import annotations

import functools
import json
import os
import os.path as osp
from typing import Dict, List, Sequence, Tuple

import numpy as np
import regex as re

from avion_tpu.data.tokenizer import _byte_to_unicode

# GPT-2 pre-tokenizer (case-sensitive; a word token absorbs one
# preceding space, which the byte map renders as the Ġ symbol)
_GPT2_PAT = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d"""
    r"""| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


class ByteLevelBPE:
    """GPT-2-style byte-level BPE over an HF ``vocab.json`` +
    ``merges.txt`` pair."""

    def __init__(self, vocab: Dict[str, int],
                 merges: Sequence[Tuple[str, str]], unk_token: str = "<unk>"):
        self.encoder = dict(vocab)
        self.decoder = {i: t for t, i in self.encoder.items()}
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = _byte_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.unk_id = self.encoder.get(unk_token)
        self.cache: Dict[str, Tuple[str, ...]] = {}

    @classmethod
    def from_dir(cls, path: str) -> "ByteLevelBPE":
        with open(osp.join(path, "vocab.json"), encoding="utf-8") as f:
            vocab = json.load(f)
        merges: List[Tuple[str, str]] = []
        with open(osp.join(path, "merges.txt"), encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#version"):
                    continue
                a, b = line.split(" ")
                merges.append((a, b))
        return cls(vocab, merges)

    def _bpe(self, token: str) -> Tuple[str, ...]:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token)
        while len(word) > 1:
            pairs = set(zip(word, word[1:]))
            best = min(pairs,
                       key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        self.cache[token] = word
        return word

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in re.findall(_GPT2_PAT, text):
            mapped = "".join(self.byte_encoder[b]
                             for b in tok.encode("utf-8"))
            for piece in self._bpe(mapped):
                i = self.encoder.get(piece, self.unk_id)
                if i is None:
                    raise KeyError(f"token {piece!r} not in vocab and no "
                                   "<unk> defined")
                ids.append(i)
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text
                        if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace")


class RobertaTokenizer:
    """``<s> ids </s>`` framing + right padding + attention mask —
    call-compatible with the ``tokenizer=`` hook of
    ``egonlq.egovlp.EgoVLPFeatureExtractor`` (returns numpy arrays
    under ``input_ids`` / ``attention_mask``)."""

    def __init__(self, bpe: ByteLevelBPE,
                 bos_token: str = "<s>", eos_token: str = "</s>",
                 pad_token: str = "<pad>", model_max_length: int = 512):
        self.bpe = bpe
        self.bos_id = bpe.encoder[bos_token]
        self.eos_id = bpe.encoder[eos_token]
        self.pad_id = bpe.encoder[pad_token]
        # always-on truncation ceiling (roberta-base's 512): RoBERTa's
        # position table has max_positions rows and XLA gather CLAMPS
        # out-of-range indices instead of erroring, so an uncapped
        # pathological query would produce silently-garbage embeddings
        self.model_max_length = model_max_length

    @classmethod
    def from_dir(cls, path: str) -> "RobertaTokenizer":
        return cls(ByteLevelBPE.from_dir(path))

    def __call__(self, texts, max_length: int | None = None,
                 padding: bool = True, return_tensors: str = "np"):
        if return_tensors != "np":  # HF-call compatibility; numpy only
            raise ValueError("only return_tensors='np' is supported")
        if not padding:  # one rectangular ndarray is the only output
            raise ValueError("only padding=True is supported")
        if isinstance(texts, str):
            texts = [texts]
        rows = [[self.bos_id] + self.bpe.encode(t) + [self.eos_id]
                for t in texts]
        cap = min(max_length or self.model_max_length,
                  self.model_max_length)
        rows = [r[: cap - 1] + [self.eos_id] if len(r) > cap else r
                for r in rows]
        width = max(len(r) for r in rows)
        ids = np.full((len(rows), width), self.pad_id, np.int32)
        mask = np.zeros_like(ids)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return {"input_ids": ids, "attention_mask": mask}


@functools.lru_cache()
def load_roberta_tokenizer(path: str) -> RobertaTokenizer:
    """Load a RoBERTa tokenizer from a local HF-format directory
    (``vocab.json`` + ``merges.txt``)."""
    if not osp.isfile(osp.join(path, "vocab.json")):
        raise FileNotFoundError(
            f"no vocab.json under {path} — pass a local HF tokenizer "
            "directory (e.g. a downloaded roberta-base snapshot)")
    return RobertaTokenizer.from_dir(path)
