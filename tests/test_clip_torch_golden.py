"""CLIP text encoder golden parity vs the REAL HF transformers torch model.

This closes the quality-axis loop that no-egress blocks elsewhere: the
frozen text encoder's correctness factorizes into (architecture parity) x
(weight-port parity) x (weight values). transformers IS installed, so both
left factors are provable exactly — instantiate `CLIPTextModel` (the very
class the reference loads its text encoder through, reference
training/coach.py:600-640) with random weights, port its state_dict
through `weight_port.port_clip_text`, and assert the Flax forward matches
the torch forward. With these tests green, loading the real SD text
encoder reduces to supplying the data file.

Covers SD-1.x (quick_gelu) and SD-2.x (gelu) activation variants at a
miniature scale (full-size compiles are minutes on the 1-core CI host).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from view_neti_tpu import weight_port as wp  # noqa: E402
from view_neti_tpu.models.clip_text import (CLIPTextConfig,  # noqa: E402
                                            NeTICLIPTextEncoder)


def _make_pair(hidden_act: str, num_layers: int = 2, hidden: int = 32,
               heads: int = 4, vocab: int = 64, max_pos: int = 16,
               headroom: int = 8, seed: int = 0):
    torch.manual_seed(seed)
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=hidden * 2,
        num_hidden_layers=num_layers, num_attention_heads=heads,
        max_position_embeddings=max_pos, hidden_act=hidden_act,
        # eos_token_id=2 selects the argmax-of-ids pooling path, the CLIP
        # vocab convention our encoder implements
        eos_token_id=2)
    hf = transformers.CLIPTextModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    report = wp.PortReport("clip")
    params = wp.port_clip_text(sd, num_layers=num_layers,
                               vocab_headroom=headroom, report=report)
    assert report.clean, report.summary()
    cfg = CLIPTextConfig(
        vocab_size=vocab, vocab_headroom=headroom, hidden_size=hidden,
        num_layers=num_layers, num_heads=heads,
        intermediate_size=hidden * 2, max_position_embeddings=max_pos,
        hidden_act=hidden_act)
    return hf, cfg, params


def _ids(vocab, max_pos, batch=3, seed=1):
    rng = np.random.RandomState(seed)
    ids = rng.randint(3, vocab - 1, (batch, max_pos)).astype(np.int32)
    ids[:, 0] = 0                       # BOS-ish
    ids[:, -1] = vocab - 1              # EOT = highest id (CLIP convention)
    return ids


class TestForwardParity:
    @pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
    def test_hidden_states_match_torch(self, act):
        hf, cfg, params = _make_pair(act)
        ids = _ids(cfg.vocab_size, cfg.max_position_embeddings)
        with torch.no_grad():
            ref = hf(input_ids=torch.from_numpy(ids.astype(np.int64)))
        ours = NeTICLIPTextEncoder(cfg).apply(
            {"params": params}, jnp.asarray(ids))
        hidden, hidden_bypass, pooled, _ = ours
        np.testing.assert_allclose(
            np.asarray(hidden), ref.last_hidden_state.numpy(),
            rtol=1e-4, atol=1e-5)
        assert hidden_bypass is None    # no injection requested
        np.testing.assert_allclose(
            np.asarray(pooled), ref.pooler_output.numpy(),
            rtol=1e-4, atol=1e-5)

    def test_token_table_headroom_is_inert(self):
        """Headroom rows exist but untouched ids give identical outputs."""
        hf, cfg, params = _make_pair("quick_gelu")
        assert params["token_embedding"].shape[0] == cfg.total_vocab
        ids = _ids(cfg.vocab_size, cfg.max_position_embeddings)
        a = NeTICLIPTextEncoder(cfg).apply({"params": params},
                                           jnp.asarray(ids))[0]
        params2 = dict(params)
        tab = np.array(params["token_embedding"])
        tab[cfg.vocab_size:] = 123.0     # scribble on headroom rows
        params2["token_embedding"] = tab
        b = NeTICLIPTextEncoder(cfg).apply({"params": params2},
                                           jnp.asarray(ids))[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_injection_changes_only_placeholder_rows_pre_encoder(self):
        """Injecting a word embedding at the placeholder position matches
        torch when the torch embedding table row is edited directly
        (the reference's NeTICLIPTextEmbeddings overwrite,
        net_clip_text_embedding.py:95-98)."""
        hf, cfg, params = _make_pair("quick_gelu")
        ids = _ids(cfg.vocab_size, cfg.max_position_embeddings)
        ph_id = 7
        ids[:, 3] = ph_id                # one placeholder occurrence per row
        word = np.random.RandomState(5).randn(
            ids.shape[0], cfg.hidden_size).astype(np.float32)
        # torch: overwrite the row in the embedding table per sample is not
        # expressible (shared table), so compare per single-sample batches
        for b in range(ids.shape[0]):
            with torch.no_grad():
                hf.text_model.embeddings.token_embedding.weight[ph_id] = \
                    torch.from_numpy(word[b])
                ref = hf(input_ids=torch.from_numpy(
                    ids[b:b + 1].astype(np.int64))).last_hidden_state
            ours = NeTICLIPTextEncoder(cfg).apply(
                {"params": params}, jnp.asarray(ids[b:b + 1]),
                word_obj=jnp.asarray(word[b:b + 1]),
                ph_obj_ids=jnp.asarray([ph_id], jnp.int32))[0]
            np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                                       rtol=1e-4, atol=1e-5)
