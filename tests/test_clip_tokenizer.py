"""Pure-Python CLIP BPE vs transformers.CLIPTokenizer on shared vocab files.

The reference's whole text-to-image path runs through HF's CLIPTokenizer
(reference text_to_image/train_text_to_image_lora.py:719-744); the in-repo
tokenizer must produce identical ids for identical vocab/merges. The real
49k vocab can't ship in a zero-egress image, so parity is pinned on a
generated vocab that still exercises every algorithm branch: byte-unicode
mapping, multi-step merges, contractions, punctuation runs, numbers, CJK
splitting, accents (NFC), truncation, and padding.
"""

import json
import os

import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.models.clip_tokenizer import (
    CLIPBPETokenizer,
    bytes_to_unicode,
)

MERGES = [
    ("t", "h"),
    ("th", "e</w>"),
    ("a", "n"),
    ("an", "d</w>"),
    ("i", "n"),
    ("in", "g</w>"),
    ("o", "n</w>"),
    ("r", "e"),
    ("c", "a"),
    ("ca", "t</w>"),
    ("p", "a"),
    ("pa", "in"),
    ("pain", "t"),
    ("paint", "ing</w>"),
    ("1", "9</w>"),
    (".", ".</w>"),
]

PROMPTS = [
    "a painting of the cat",
    "The  CAT   and the DOG!!",
    "post-impressionism, oil on canvas... 1920",
    "it's the artist's masterpiece, isn't it",
    "café by the river 中国 painting",
    "cat " * 60,  # truncation
    "",
    "    ",
    "19 cats & 19 dogs",
]


def _write_tiny_vocab(d):
    """Byte-level base vocab + the MERGES table, CLIP file layout."""
    os.makedirs(d, exist_ok=True)
    symbols = list(bytes_to_unicode().values())
    vocab = {}
    for s in symbols:
        vocab[s] = len(vocab)
    for s in symbols:
        vocab[s + "</w>"] = len(vocab)
    for a, b in MERGES:
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n"
    )
    return d


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    return _write_tiny_vocab(tmp_path_factory.mktemp("clip_vocab"))


def test_bpe_merges_apply(vocab_dir):
    tok = CLIPBPETokenizer.from_dir(str(vocab_dir))
    # "painting" collapses through 5 merge steps to one token.
    assert tok.bpe("painting") == "painting</w>"
    assert tok.bpe("the") == "the</w>"
    # Unmergeable stays character-level with the </w> marker on the last.
    assert tok.bpe("xz") == "x z</w>"


def test_parity_with_transformers(vocab_dir):
    transformers = pytest.importorskip("transformers")
    hf = transformers.CLIPTokenizer(
        str(vocab_dir / "vocab.json"), str(vocab_dir / "merges.txt")
    )
    ours = CLIPBPETokenizer.from_dir(str(vocab_dir), max_length=77)
    want = np.asarray(
        hf(
            PROMPTS, padding="max_length", truncation=True, max_length=77,
            return_tensors="np",
        )["input_ids"],
        np.int32,
    )
    got = ours(PROMPTS)
    np.testing.assert_array_equal(got, want)


def test_load_tokenizer_prefers_native_bpe(vocab_dir):
    from group_attribution_for_diffusion_models_tpu.models.clip_text import (
        HashTokenizer,
        load_tokenizer,
    )

    tok = load_tokenizer(str(vocab_dir), max_length=16)
    assert isinstance(tok, CLIPBPETokenizer)
    ids = tok(["the cat"])
    assert ids.shape == (1, 16)
    assert ids[0, 0] == tok.bos_id
    # An explicitly requested vocab dir that can't load must raise — a
    # silent hash fallback would index real embeddings with arbitrary ids.
    with pytest.raises(OSError):
        load_tokenizer(str(vocab_dir / "nope"))
    # Only the no-argument path falls back to the hash tokenizer.
    assert isinstance(load_tokenizer(), HashTokenizer)
