"""Token-id parity: BertWordPieceTokenizer vs transformers.BertTokenizer.

The LDM text-to-image pipeline tokenizes prompts with an uncased
BertTokenizer (padding='max_length', truncation, length 77); our
imagenette conditioning path must produce identical ids from the same
vocab.txt.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "a", "an", "the", "photo", "of", "image",
    "tench", "spring", "##er", "span", "##iel", "english",
    "church", "french", "horn", "golf", "ball", "gas", "pump",
    "para", "##chute", "dog", "fish", "player", "##s",
    "cassette", "##tte", "truck", "garbage", ",", ".", "!", "-",
    "caf", "##e", "uber", "##m", "##en", "##sch",
]

PROMPTS = [
    "a photo of a tench",
    "A PHOTO of an English Springer Spaniel!",
    "garbage truck, gas pump.",
    "café übermensch",          # accents must strip to caf##e / uber##m..
    "parachute players",
    "unknownword of the image",  # unkillable word -> [UNK]
    "",                          # empty prompt
    "a " * 100,                  # truncation at 77
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("bertvocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return str(p)


def test_bert_wordpiece_parity(vocab_file):
    from group_attribution_for_diffusion_models_tpu.models.bert_tokenizer import (
        BertWordPieceTokenizer,
    )

    ours = BertWordPieceTokenizer.from_file(vocab_file, max_length=77)
    hf = transformers.BertTokenizer(vocab_file, do_lower_case=True)

    got = ours(PROMPTS)
    want = hf(
        list(PROMPTS), padding="max_length", truncation=True, max_length=77,
        return_tensors="np",
    )["input_ids"]
    np.testing.assert_array_equal(got, want)


def test_bert_wordpiece_unk_and_specials(vocab_file):
    from group_attribution_for_diffusion_models_tpu.models.bert_tokenizer import (
        BertWordPieceTokenizer,
    )

    tok = BertWordPieceTokenizer.from_file(vocab_file)
    ids = tok(["zzzz"])
    assert ids[0, 0] == tok.cls_id
    assert ids[0, 1] == tok.unk_id
    assert ids[0, 2] == tok.sep_id
    assert (ids[0, 3:] == tok.pad_id).all()
