"""In-repo RoBERTa byte-level BPE vs transformers' slow reference.

Builds a fabricated HF-format tokenizer directory (vocab.json +
merges.txt, no network) and pins id-level parity of
``avion_tpu.data.roberta_tokenizer`` against
``transformers.RobertaTokenizer`` loaded from the SAME files —
pre-tokenizer splits, merge order, specials framing, padding masks and
truncation (reference consumer: ``egonlq/model/model.py:263-296``)."""

import json
import os.path as osp

import numpy as np
import pytest

from avion_tpu.data.roberta_tokenizer import (
    ByteLevelBPE,
    RobertaTokenizer,
    load_roberta_tokenizer,
)
from avion_tpu.data.tokenizer import _byte_to_unicode

TEXTS = [
    "the cat sat on the mat",
    "Hello, World!  It's the THE the...",
    "a",
    "",
    " leading space and trailing ",
    "café naïve ☕",
    "don't it's we're I'll they'd you've I'm",
    "tabs\tand\nnewlines  collapse?",
    "1234 56.78 9",
]


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    """Fabricated roberta-style tokenizer dir: specials at ids 0-4,
    all 256 byte symbols, and a realistic little merge table (every
    merge product present in the vocab, as HF requires)."""
    d = tmp_path_factory.mktemp("roberta_tok")
    merges = [
        ("t", "h"), ("th", "e"), ("Ġ", "t"), ("Ġt", "he"), ("Ġ", "a"),
        ("a", "t"), ("Ġ", "c"), ("Ġc", "at"), ("Ġ", "s"), ("Ġs", "at"),
        ("Ġ", "m"), ("Ġm", "at"), ("o", "n"), ("Ġ", "on"), ("l", "l"),
        ("e", "ll"), ("H", "ell"), ("Hell", "o"), ("Ġ", "W"), ("o", "r"),
        ("l", "d"), ("or", "ld"), ("ĠW", "orld"), ("'", "s"), ("'", "t"),
        ("Ġ", "i"), ("Ġi", "t"), ("e", "s"), ("Ġ", "n"), ("1", "2"),
        ("12", "3"), ("Ġ", "5"), ("Ġ5", "6"), (".", "."), ("..", "."),
        ("Ċ", "Ċ"), ("Ġ", "Ġ"), ("ĠĠ", "ĠĠ"),
    ]
    vocab = {}
    for s in ("<s>", "<pad>", "</s>", "<unk>", "<mask>"):
        vocab[s] = len(vocab)
    for ch in _byte_to_unicode().values():
        vocab[ch] = len(vocab)
    for a, b in merges:
        if a + b not in vocab:
            vocab[a + b] = len(vocab)
    with open(osp.join(d, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(osp.join(d, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(f"{a} {b}" for a, b in merges) + "\n")
    return str(d)


@pytest.fixture(scope="module")
def hf(tok_dir):
    transformers = pytest.importorskip("transformers")
    return transformers.RobertaTokenizer(
        osp.join(tok_dir, "vocab.json"), osp.join(tok_dir, "merges.txt"))


def test_encode_matches_transformers(tok_dir, hf):
    bpe = ByteLevelBPE.from_dir(tok_dir)
    for text in TEXTS:
        ours = bpe.encode(text)
        ref = hf.convert_tokens_to_ids(hf.tokenize(text))
        assert ours == ref, f"{text!r}: {ours} != {ref}"


def test_batch_call_matches_transformers(tok_dir, hf):
    tk = RobertaTokenizer.from_dir(tok_dir)
    enc = tk(TEXTS)
    ref = hf(TEXTS, padding=True, return_tensors="np")
    np.testing.assert_array_equal(enc["input_ids"],
                                  ref["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(enc["attention_mask"],
                                  ref["attention_mask"].astype(np.int32))


def test_truncation_matches_transformers(tok_dir, hf):
    tk = RobertaTokenizer.from_dir(tok_dir)
    enc = tk(TEXTS, max_length=6)
    ref = hf(TEXTS, padding=True, truncation=True, max_length=6,
             return_tensors="np")
    np.testing.assert_array_equal(enc["input_ids"],
                                  ref["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(enc["attention_mask"],
                                  ref["attention_mask"].astype(np.int32))


def test_specials_and_pad_semantics(tok_dir):
    tk = RobertaTokenizer.from_dir(tok_dir)
    enc = tk(["the cat", ""])
    ids, mask = enc["input_ids"], enc["attention_mask"]
    # <s>=0, </s>=2 frame every row; <pad>=1 fills the short row, and
    # mask marks exactly the non-pad prefix
    assert ids[0, 0] == 0 and ids[1, 0] == 0
    assert 2 in ids[0] and ids[1, 1] == 2
    assert (ids[1, 2:] == 1).all()
    assert mask[1].sum() == 2
    # the EgoVLP extractor derives masks via (ids != pad) when absent:
    # the two derivations agree
    assert ((ids != 1).astype(np.int32) == mask).all()


def test_decode_roundtrip(tok_dir):
    bpe = ByteLevelBPE.from_dir(tok_dir)
    for text in TEXTS:
        assert bpe.decode(bpe.encode(text)) == text


def test_unknown_byte_maps_to_unk():
    # a vocab missing some byte symbols: unknown pieces -> <unk>
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in "abc":
        vocab[ch] = len(vocab)
    bpe = ByteLevelBPE(vocab, [])
    assert bpe.encode("abz") == [vocab["a"], vocab["b"], 3]


def test_load_roberta_tokenizer_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_roberta_tokenizer(str(tmp_path))
