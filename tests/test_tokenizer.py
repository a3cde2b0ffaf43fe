import numpy as np
import pytest

from avion_tpu.data.tokenizer import SimpleTokenizer, tokenize


@pytest.fixture(scope="module")
def tk():
    return SimpleTokenizer()


def test_vocab_size(tk):
    assert tk.vocab_size == 49408
    assert tk.sot_token == 49406
    assert tk.eot_token == 49407


def test_known_golden_ids(tk):
    # Golden values from OpenAI CLIP's tokenizer (public, widely documented)
    assert tk.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]
    assert tk.encode("hello world") == [3306, 1002]
    assert tk.encode("a diagram") == [320, 22697]


def test_roundtrip(tk):
    # decode re-spaces punctuation (standard CLIP BPE behavior), so
    # roundtrip equality holds for plain word sequences
    for s in ["the person opens the drawer", "washes hands with soap",
              "c picks up a knife"]:
        ids = tk.encode(s)
        assert tk.decode(ids).strip() == s.lower()
    # punctuation-adjacent text survives modulo spacing
    ids = tk.encode("#C C picks up a knife")
    assert tk.decode(ids).split() == ["#", "c", "c", "picks", "up", "a", "knife"]


def test_tokenize_shape_and_specials(tk):
    out = tokenize(["a photo of a cat", "hi"], tokenizer=tk)
    assert out.shape == (2, 77)
    assert out.dtype == np.int32
    assert out[0, 0] == tk.sot_token
    assert out[0, 6] == tk.eot_token
    assert out[0, 7:].sum() == 0


def test_tokenize_truncation(tk):
    long = " ".join(["word"] * 200)
    out = tokenize(long, tokenizer=tk)
    assert out.shape == (77,)
    assert out[-1] == tk.eot_token
    assert out[0] == tk.sot_token


def test_tokenize_single_string_squeezes(tk):
    out = tokenize("hello", tokenizer=tk)
    assert out.shape == (77,)
