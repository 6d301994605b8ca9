"""Golden parity: ClipBPETokenizer vs the actual HF CLIPTokenizer.

The reference tokenizes with HF CLIPTokenizer (reference
training/coach.py:608-612). Both tokenizers here load the SAME
vocab.json/merges.txt (tests/fixtures/clip_vocab, built by
tools/make_test_vocab.py with the real CLIP vocab construction: 256 byte
symbols + byte+'</w>' symbols + trained merges + specials) and must produce
identical ids — BPE merge order, byte encoder, the \\p{L}/\\p{N} split
regex, specials, padding, truncation, and added placeholder tokens.
"""
from pathlib import Path

import numpy as np
import pytest

from view_neti_tpu.tokenizer import ClipBPETokenizer

pytestmark = pytest.mark.quick

transformers = pytest.importorskip("transformers")

VOCAB_DIR = Path(__file__).parent / "fixtures" / "clip_vocab"

PROMPTS = [
    "A photo of a teapot",
    "a rendering of a colorful teapot.",
    "the painting, in the style of a view!",
    "It's a dark photo of the skull's view",
    "they're we've I'll you'd I'm don't",
    "cafe naive resume 123 45.6",
    "CAFE NAIVE PHOTO of THE View",
    "a    photo   with   weird   spacing",
    "punctuation!!! ??? ... --- ***",
    "under_score mixed_case_words",
    "unknownwordxyzq gibberishqq",
    "A photo of a café with crème brûlée",
    "naïve exposé by señor jalapeño in zürich",
    "émigré ÉMIGRÉ",
    "hyphen-ated co-operate 3.14159",
    "photographer photographing photographs 1000 times",
    "word " * 100,          # exercises truncation
    "",                      # empty prompt
    "   ",                   # whitespace only
    "25 views of 100 cameras at 42 degrees",
]

PLACEHOLDERS = ["<view_dtu12d_cam25_x1p5_y0p2>", "<skull>", "<teapot-new>"]

PLACEHOLDER_PROMPTS = [
    "<view_dtu12d_cam25_x1p5_y0p2>. A photo of a <skull>",
    "a photo of <teapot-new> and <skull> together",
    "<skull>",
    "A photo of a <view_dtu12d_cam25_x1p5_y0p2>",
]


@pytest.fixture(scope="module")
def pair():
    hf = transformers.CLIPTokenizer(
        vocab_file=str(VOCAB_DIR / "vocab.json"),
        merges_file=str(VOCAB_DIR / "merges.txt"),
        model_max_length=77)
    ours = ClipBPETokenizer.from_files(VOCAB_DIR / "vocab.json",
                                       VOCAB_DIR / "merges.txt")
    return hf, ours


class TestBPEGolden:
    @pytest.mark.parametrize("prompt", PROMPTS, ids=range(len(PROMPTS)))
    def test_ids_match_hf(self, pair, prompt):
        hf, ours = pair
        a = hf(prompt, padding="max_length", truncation=True,
               max_length=77).input_ids
        b = ours(prompt, padding="max_length", truncation=True,
                 max_length=77).input_ids[0].tolist()
        assert a == b

    def test_specials(self, pair):
        hf, ours = pair
        assert ours.bos_token_id == hf.bos_token_id
        assert ours.eos_token_id == hf.eos_token_id
        assert ours.pad_token_id == hf.pad_token_id

    def test_added_tokens_same_ids_and_encoding(self, pair):
        hf, ours = pair
        hf.add_tokens(PLACEHOLDERS)
        ours.add_tokens(PLACEHOLDERS)
        assert (hf.convert_tokens_to_ids(PLACEHOLDERS)
                == ours.convert_tokens_to_ids(PLACEHOLDERS))
        for prompt in PLACEHOLDER_PROMPTS:
            a = hf(prompt, padding="max_length", truncation=True,
                   max_length=77).input_ids
            b = ours(prompt, padding="max_length", truncation=True,
                     max_length=77).input_ids[0].tolist()
            assert a == b, prompt

    def test_encode_no_specials(self, pair):
        """builder.add_concept_tokens uses encode(add_special_tokens=False)
        for the single-token super-category check."""
        hf, ours = pair
        for word in ("view", "photo", "teapot", "camera"):
            assert (hf.encode(word, add_special_tokens=False)
                    == ours.encode(word, add_special_tokens=False))

    def test_batch_call(self, pair):
        hf, ours = pair
        batch = ["a photo of a view", "a painting of the skull"]
        a = hf(batch, padding="max_length", truncation=True,
               max_length=77).input_ids
        b = ours(batch, padding="max_length", truncation=True,
                 max_length=77).input_ids
        np.testing.assert_array_equal(np.asarray(a), b)
