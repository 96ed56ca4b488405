"""CLIP BPE tokenizer: golden token ids + round trips."""

import os

import numpy as np
import pytest

from diffbir_tpu.models.tokenizer import ClipTokenizer, default_bpe_path


@pytest.fixture(scope="module")
def tk():
    try:
        return ClipTokenizer(default_bpe_path())
    except FileNotFoundError:
        pytest.skip("BPE merges file not available")


def test_vocab_size(tk):
    assert tk.vocab_size == 49408
    assert tk.sot_id == 49406 and tk.eot_id == 49407


def test_golden_ids(tk):
    # canonical CLIP encoding of the standard example
    ids = tk(["a photo of a cat"])
    assert ids.shape == (1, 77)
    assert ids[0, :7].tolist() == [49406, 320, 1125, 539, 320, 2368, 49407]
    assert ids[0, 7:].sum() == 0


def test_cleaning_and_case(tk):
    a = tk(["A  PHOTO of a CAT"])[0]
    b = tk(["a photo of a cat"])[0]
    np.testing.assert_array_equal(a, b)


def test_truncation(tk):
    long = " ".join(["word"] * 200)
    ids = tk([long])[0]
    assert ids[0] == tk.sot_id and ids[-1] == tk.eot_id
    assert len(ids) == 77


def test_decode_roundtrip(tk):
    # byte-level BPE decode spaces out punctuation ("photograph , high");
    # the invariant is id-level: encode(decode(ids)) == ids
    text = "restoration of an old photograph, high quality"
    ids = tk.encode(text)
    assert tk.encode(tk.decode(ids)) == ids


def test_batch(tk):
    out = tk(["one", "two words here"])
    assert out.shape == (2, 77)
    assert out.dtype == np.int32
