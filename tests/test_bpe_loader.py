"""Tests: CLIP BPE tokenizer (synthetic vocab) and the prefetch loader."""
import json
from pathlib import Path

import numpy as np
import pytest

from view_neti_tpu.tokenizer import ClipBPETokenizer, load_tokenizer


def _toy_tokenizer(tmp_path: Path) -> ClipBPETokenizer:
    """Miniature CLIP-style BPE: bytes + a few merges + specials."""
    from view_neti_tpu.tokenizer import _bytes_to_unicode
    byte_syms = list(_bytes_to_unicode().values())
    vocab = {}
    for s in byte_syms:
        vocab[s] = len(vocab)
        vocab[s + "</w>"] = len(vocab)
    merges = []
    # build "cat</w>" and "photo</w>" piecewise
    for pair in [("c", "a"), ("ca", "t</w>"), ("p", "h"), ("ph", "o"),
                 ("pho", "t"), ("phot", "o</w>")]:
        merges.append(pair)
        merged = pair[0] + pair[1]
        if merged not in vocab:
            vocab[merged] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(p) for p in merges))
    return ClipBPETokenizer.from_dir(tmp_path)


class TestClipBPE:
    def test_merges_apply(self, tmp_path):
        tok = _toy_tokenizer(tmp_path)
        ids = tok.encode("cat", add_special_tokens=False)
        assert len(ids) == 1
        assert ids[0] == tok.encoder["cat</w>"]
        ids = tok.encode("photo", add_special_tokens=False)
        assert len(ids) == 1

    def test_unmerged_word_splits_to_bytes(self, tmp_path):
        tok = _toy_tokenizer(tmp_path)
        ids = tok.encode("dog", add_special_tokens=False)
        assert len(ids) == 3  # d, o, g</w> — no merges defined

    def test_specials_and_padding(self, tmp_path):
        tok = _toy_tokenizer(tmp_path)
        out = tok("a cat", padding="max_length", truncation=True,
                  max_length=10)
        ids = out.input_ids[0]
        assert ids[0] == tok.bos_token_id
        assert tok.eos_token_id in ids
        assert len(ids) == 10

    def test_added_tokens_atomic(self, tmp_path):
        tok = _toy_tokenizer(tmp_path)
        tok.add_tokens(["<view_1_2_3>"])
        vid = tok.convert_tokens_to_ids("<view_1_2_3>")
        assert vid >= tok.base_vocab_size
        ids = tok.encode("<view_1_2_3> cat", add_special_tokens=False)
        assert ids[0] == vid
        assert ids.count(vid) == 1

    def test_load_tokenizer_dispatch(self, tmp_path):
        _toy_tokenizer(tmp_path)
        tok = load_tokenizer(tmp_path)
        assert isinstance(tok, ClipBPETokenizer)
        from view_neti_tpu.tokenizer import FallbackTokenizer
        assert isinstance(load_tokenizer(None), FallbackTokenizer)

    def test_case_insensitive(self, tmp_path):
        tok = _toy_tokenizer(tmp_path)
        assert tok.encode("CAT", add_special_tokens=False) == \
            tok.encode("cat", add_special_tokens=False)


class TestPrefetchLoader:
    def test_yields_all_batches(self):
        from view_neti_tpu.data.loader import PrefetchLoader
        from view_neti_tpu.data.dataset import TextualInversionDataset
        from view_neti_tpu.tokenizer import FallbackTokenizer

        teapot = Path("/root/reference/data/datasets_mode0/colorful_teapot")
        if not teapot.exists():
            pytest.skip("bundled data missing")
        tok = FallbackTokenizer()
        ds = TextualInversionDataset(
            data_root=teapot, tokenizer=tok,
            camera_representation="spherical", learnable_mode=0,
            placeholder_object_token="<t>", size=16, repeats=4)
        tok.add_tokens(ds.placeholder_tokens)
        loader = PrefetchLoader(ds, batch_size=4, seed=0, depth=2)
        batches = list(loader)
        assert len(batches) == len(ds) // 4
        assert batches[0]["pixel_values"].shape == (4, 16, 16, 3)
        # a second iteration works (fresh thread)
        assert len(list(loader)) == len(batches)
