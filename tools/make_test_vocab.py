#!/usr/bin/env python
"""Generate a small but structurally-real CLIP BPE vocabulary for tests.

Trains byte-level BPE (the same construction as openai/CLIP's vocab:
256 byte symbols + 256 byte+'</w>' symbols + learned merges + the two
specials) on a prompt-like corpus, then writes
tests/fixtures/clip_vocab/{vocab.json,merges.txt}. The golden test
(tests/test_tokenizer_golden.py) loads these files into BOTH the HF
CLIPTokenizer and our ClipBPETokenizer and asserts identical ids.

Run from the repo root: python tools/make_test_vocab.py
"""
import collections
import json
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from view_neti_tpu.tokenizer import _bytes_to_unicode  # noqa: E402

CORPUS = """
a photo of the teapot a photo of a teapot a photo of the skull
a rendering of a colorful teapot the painting in the style of a view
a cropped photo of the view a close up photo of a camera a dark photo
a bright photo of the object a good photo of a small object
a photo of one view of the scene a photo of my teapot on the table
a photograph of a nice sculpture a rendition of the clean dirty cool
weird picture illustration depiction red blue green large small
the view of the camera from above street house buildings skull
cafe naive resume latte protege view view view photo photo photo
of of of of the the the a a a a in in style style
café café naïve exposé crème brûlée señor jalapeño zürich
photograph photograph photographic photography photographer
rendering renderings rendered render renders rendition renditions
painting paintings painted painter sculpture sculptures sculpted
colorful colorless color colors colored colour colours
teapot teapots skull skulls camera cameras view views viewing viewed
1 2 3 4 5 10 25 100 1000 42 7 9
"""

WEIGHTED_WORDS = [w for w in CORPUS.split()]
N_MERGES = 400


def train_bpe(words, n_merges):
    b2u = _bytes_to_unicode()
    # word -> tuple of byte-unicode symbols with </w> on the last
    def to_syms(word):
        syms = [b2u[b] for b in word.encode("utf-8")]
        syms[-1] = syms[-1] + "</w>"
        return tuple(syms)

    counts = collections.Counter(to_syms(w) for w in words)
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for word, c in counts.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += c
        if not pairs:
            break
        # deterministic: most frequent, ties by lexicographic order
        best = max(sorted(pairs), key=lambda p: pairs[p])
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = collections.Counter()
        for word, c in counts.items():
            out, i = [], 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == best[0]
                        and word[i + 1] == best[1]):
                    out.append(word[i] + word[i + 1])
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            merged[tuple(out)] += c
        counts = merged
    return merges


def main():
    b2u = _bytes_to_unicode()
    base = list(b2u.values())
    vocab_tokens = base + [s + "</w>" for s in base]
    merges = train_bpe(WEIGHTED_WORDS, N_MERGES)
    vocab_tokens += ["".join(m) for m in merges]
    vocab_tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {tok: i for i, tok in enumerate(vocab_tokens)}
    assert len(vocab) == len(vocab_tokens), "duplicate merge token"

    out = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / \
        "clip_vocab"
    out.mkdir(parents=True, exist_ok=True)
    (out / "vocab.json").write_text(
        json.dumps(vocab, ensure_ascii=False, indent=0))
    (out / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")
    print(f"wrote {len(vocab)} vocab entries, {len(merges)} merges -> {out}")


if __name__ == "__main__":
    main()
