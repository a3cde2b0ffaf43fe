"""CLIP byte-level BPE tokenizer (pure Python, no torch).

Independent implementation of the standard CLIP BPE scheme used by the
reference (``avion/data/tokenizer.py``): byte→unicode remap, greedy
lowest-rank pair merging over the 16e6 merge table, ``<|startoftext|>``
/ ``<|endoftext|>`` specials, fixed 77-token context with truncation
(EOT forced into the last slot).  Output is numpy int32 (the reference
returns torch tensors; our pipeline is numpy→jax).

ftfy is unavailable in this image; ``_fix_text`` reimplements the
deterministic transforms of ``ftfy.fix_text``'s default config that
matter for caption text — UTF-8-as-cp1252 mojibake repair (iterated,
so double-encoding heals too), auto HTML unescape, control-char
removal, latin-ligature expansion, full/half-width folding, quote
uncurling and NFC — pinned by golden fixtures in
``tests/test_tokenizer.py`` against ftfy's documented outputs.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import unicodedata
from typing import List, Union

import numpy as np
import regex as re

_ASSET = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets",
                      "bpe_simple_vocab_16e6.txt.gz")

SOT_TOKEN = "<|startoftext|>"
EOT_TOKEN = "<|endoftext|>"
CONTEXT_LENGTH = 77


@functools.lru_cache()
def _byte_to_unicode():
    """Reversible byte→printable-unicode map (standard GPT-2/CLIP trick)."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapped = printable[:]
    offset = 0
    for b in range(256):
        if b not in printable:
            printable.append(b)
            mapped.append(256 + offset)
            offset += 1
    return dict(zip(printable, (chr(c) for c in mapped)))


# ftfy.fixes.uncurl_quotes: curly single/double quotes -> ASCII
_SINGLE_QUOTE_RE = re.compile("[ʼ‘-‛]")
_DOUBLE_QUOTE_RE = re.compile("[“-‟]")
# ftfy.fixes.fix_latin_ligatures
_LIGATURES = str.maketrans({
    "Ĳ": "IJ", "ĳ": "ij", "ﬀ": "ff", "ﬁ": "fi",
    "ﬂ": "fl", "ﬃ": "ffi", "ﬄ": "ffl", "ﬅ": "ft",
    "ﬆ": "st",
})


def _sloppy_cp1252_bytes(text: str) -> bytes:
    """Encode as windows-1252 with the latin-1 fallback ftfy's
    'sloppy-windows-1252' codec uses for the five undefined bytes."""
    out = bytearray()
    for ch in text:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            o = ord(ch)
            if o > 0xFF:
                raise
            out.append(o)
    return bytes(out)


def _fix_mojibake(text: str) -> str:
    """Iteratively undo UTF-8 bytes mis-decoded as cp1252/latin-1
    (ftfy fix_encoding's dominant case; iteration heals double
    mojibake).  Strict round-trip decode is the acceptance filter:
    ordinary accented text almost never forms valid multi-byte UTF-8
    when re-encoded, so it passes through untouched."""
    for _ in range(3):
        if text.isascii():
            break
        try:
            fixed = _sloppy_cp1252_bytes(text).decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            break
        if fixed == text:
            break
        text = fixed
    return text


def _fix_text(text: str) -> str:
    """The ftfy.fix_text default pipeline, deterministic subset
    (reference: avion/data/tokenizer.py:57-60 basic_clean)."""
    text = _fix_mojibake(text)
    # unescape_html='auto': only when it looks like HTML-escaped text
    if "<" not in text and "&" in text:
        text = html.unescape(text)
    # remove C0/C1 control chars except whitespace ones
    text = "".join(
        ch for ch in text
        if not (unicodedata.category(ch) == "Cc" and ch not in "\t\n\r\f")
    )
    text = text.translate(_LIGATURES)
    # fix_character_width: NFKC on full/half-width forms only
    if any("＀" <= ch <= "￯" or ch == "　" for ch in text):
        text = "".join(
            unicodedata.normalize("NFKC", ch)
            if ("＀" <= ch <= "￯" or ch == "　") else ch
            for ch in text
        )
    text = _SINGLE_QUOTE_RE.sub("'", text)
    text = _DOUBLE_QUOTE_RE.sub('"', text)
    return unicodedata.normalize("NFC", text)


def _clean(text: str) -> str:
    # reference basic_clean: ftfy.fix_text + html.unescape twice
    text = _fix_text(text)
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip()


class SimpleTokenizer:
    def __init__(self, bpe_path: str = _ASSET):
        self.byte_encoder = _byte_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with gzip.open(bpe_path) as f:
            lines = f.read().decode("utf-8").split("\n")
        # first line is a version header; the table holds 48894 merges
        merges = [tuple(line.split()) for line in lines[1 : 49152 - 256 - 2 + 1]]
        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += [SOT_TOKEN, EOT_TOKEN]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {SOT_TOKEN: SOT_TOKEN, EOT_TOKEN: EOT_TOKEN}
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )
        self.sot_token = self.encoder[SOT_TOKEN]
        self.eot_token = self.encoder[EOT_TOKEN]
        self.vocab_size = len(self.encoder)

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(a, b) for a, b in zip(word, word[1:])}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        tokens: List[int] = []
        text = _clean(text).lower()
        for tok in re.findall(self.pat, text):
            mapped = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            tokens.extend(self.encoder[t] for t in self._bpe(mapped).split(" "))
        return tokens

    def decode(self, tokens) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def __call__(self, texts, context_length: int = CONTEXT_LENGTH):
        return tokenize(texts, context_length, self)


@functools.lru_cache()
def _default_tokenizer() -> SimpleTokenizer:
    return SimpleTokenizer()


def tokenize(
    texts: Union[str, List[str]],
    context_length: int = CONTEXT_LENGTH,
    tokenizer: SimpleTokenizer | None = None,
) -> np.ndarray:
    """Tokenize to a fixed-size [N, context_length] int32 array with
    SOT/EOT and truncation that keeps EOT in the last slot
    (``avion/data/tokenizer.py:153-180``)."""
    if isinstance(texts, str):
        texts = [texts]
        squeeze = True
    else:
        squeeze = False
    tk = tokenizer or _default_tokenizer()
    out = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        ids = [tk.sot_token] + tk.encode(text) + [tk.eot_token]
        if len(ids) > context_length:
            ids = ids[:context_length]
            ids[-1] = tk.eot_token
        out[i, : len(ids)] = ids
    return out[0] if squeeze else out
