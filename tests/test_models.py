"""Tests: CLIP text encoder (injection/bypass), VAE, UNet (XTI routing)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from view_neti_tpu.models.clip_text import (CLIPTextConfig,
                                            NeTICLIPTextEncoder)
from view_neti_tpu.models.vae import AutoencoderKL, tiny_vae_config
from view_neti_tpu.models.unet import UNet2DCondition, tiny_unet_config


TINY_TEXT = CLIPTextConfig(vocab_size=256, vocab_headroom=16, hidden_size=32,
                           num_layers=2, num_heads=4, intermediate_size=64,
                           max_position_embeddings=16)


def _text_inputs(B=2, L=16, ph_id=260):
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 200, size=(B, L)).astype(np.int32)
    ids[:, 3] = ph_id  # placeholder position
    ids[:, -1] = 255   # EOT-ish max id
    return jnp.asarray(ids)


class TestCLIPText:
    def _init(self, **kwargs):
        model = NeTICLIPTextEncoder(TINY_TEXT)
        ids = _text_inputs()
        vars_ = model.init(jax.random.PRNGKey(0), ids)
        return model, vars_, ids

    def test_plain_forward(self):
        model, vars_, ids = self._init()
        h, hb, pooled, _ = model.apply(vars_, ids)
        assert h.shape == (2, 16, 32)
        assert hb is None
        assert pooled.shape == (2, 32)

    def test_word_injection_changes_hidden(self):
        model, vars_, ids = self._init()
        h0, *_ = model.apply(vars_, ids)
        word = jnp.ones((2, 32)) * 3.0
        ph = jnp.full((2,), 260, jnp.int32)
        h1, *_ = model.apply(vars_, ids, word_obj=word, ph_obj_ids=ph)
        assert not np.allclose(np.asarray(h0), np.asarray(h1))

    def test_injection_noop_when_placeholder_absent(self):
        model, vars_, ids = self._init()
        h0, *_ = model.apply(vars_, ids)
        word = jnp.ones((2, 32)) * 3.0
        ph = jnp.full((2,), -1, jnp.int32)  # no placeholder
        h1, *_ = model.apply(vars_, ids, word_obj=word, ph_obj_ids=ph)
        np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)

    def test_bypass_constrained(self):
        model, vars_, ids = self._init()
        word = jnp.ones((2, 32))
        # NB: a constant bypass vector would be erased by the final LayerNorm
        # (uniform shifts are in its null space) — use a random one.
        bypass = jax.random.normal(jax.random.PRNGKey(3), (2, 32)) * 2.0
        ph = jnp.full((2,), 260, jnp.int32)
        h, hb, _, _ = model.apply(vars_, ids, word_obj=word, bypass_obj=bypass,
                                  ph_obj_ids=ph, alpha_obj=0.2)
        assert hb is not None
        h, hb = np.asarray(h), np.asarray(hb)
        # only the placeholder position (3) may differ
        diff = np.abs(h - hb).sum(axis=-1)  # (B, L)
        assert (diff[:, 3] > 0).all()
        mask = np.ones_like(diff, bool)
        mask[:, 3] = False
        np.testing.assert_allclose(diff[mask], 0.0, atol=1e-5)

    def test_bypass_alpha_zero_is_identity(self):
        model, vars_, ids = self._init()
        word = jnp.ones((2, 32))
        bypass = jnp.ones((2, 32)) * 2.0
        ph = jnp.full((2,), 260, jnp.int32)
        h, hb, _, _ = model.apply(vars_, ids, word_obj=word,
                                  bypass_obj=bypass, ph_obj_ids=ph,
                                  alpha_obj=0.0)
        np.testing.assert_allclose(np.asarray(h), np.asarray(hb), atol=1e-5)

    def test_bypass_unconstrained_norm(self):
        model, vars_, ids = self._init()
        word = jnp.ones((2, 32))
        bypass = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
        ph = jnp.full((2,), 260, jnp.int32)
        # check pre-final-LN semantics indirectly: result differs from
        # constrained and is finite
        _, hb_u, _, _ = model.apply(vars_, ids, word_obj=word,
                                    bypass_obj=bypass, ph_obj_ids=ph,
                                    unconstrained_obj=True)
        _, hb_c, _, _ = model.apply(vars_, ids, word_obj=word,
                                    bypass_obj=bypass, ph_obj_ids=ph,
                                    unconstrained_obj=False)
        assert np.isfinite(np.asarray(hb_u)).all()
        assert not np.allclose(np.asarray(hb_u), np.asarray(hb_c))

    def test_grads_flow_to_word_embedding_input(self):
        model, vars_, ids = self._init()
        ph = jnp.full((2,), 260, jnp.int32)

        def loss(word):
            h, hb, *_ = model.apply(vars_, ids, word_obj=word,
                                    bypass_obj=word * 0.5, ph_obj_ids=ph)
            return jnp.sum(hb ** 2)

        g = jax.grad(loss)(jnp.ones((2, 32)))
        assert float(jnp.abs(g).sum()) > 0

    def test_both_object_and_view_injection(self):
        model = NeTICLIPTextEncoder(TINY_TEXT)
        ids = np.array(_text_inputs())  # writable copy
        ids[:, 5] = 261  # second placeholder (view)
        ids = jnp.asarray(ids)
        vars_ = model.init(jax.random.PRNGKey(0), ids)
        word_o = jnp.ones((2, 32))
        word_v = jnp.ones((2, 32)) * -1
        # random bypass vectors (constants are nulled by the final LayerNorm)
        b_o = jax.random.normal(jax.random.PRNGKey(4), (2, 32))
        b_v = jax.random.normal(jax.random.PRNGKey(5), (2, 32))
        h, hb, *_ = model.apply(
            vars_, ids,
            word_obj=word_o, bypass_obj=b_o,
            ph_obj_ids=jnp.full((2,), 260, jnp.int32),
            word_view=word_v, bypass_view=b_v,
            ph_view_ids=jnp.full((2,), 261, jnp.int32))
        diff = np.abs(np.asarray(h) - np.asarray(hb)).sum(-1)
        assert (diff[:, 3] > 0).all() and (diff[:, 5] > 0).all()


class TestVAE:
    def test_encode_decode_shapes(self):
        cfg = tiny_vae_config()
        vae = AutoencoderKL(cfg)
        x = jnp.zeros((1, 16, 16, 3))
        vars_ = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
        z = vae.apply(vars_, x, jax.random.PRNGKey(2),
                      method=AutoencoderKL.encode_sample)
        # one downsample (2 mults) -> 8x8, latent 4ch
        assert z.shape == (1, 8, 8, 4)
        y = vae.apply(vars_, z, method=AutoencoderKL.decode)
        assert y.shape == (1, 16, 16, 3)

    def test_encode_stochastic_and_mode(self):
        cfg = tiny_vae_config()
        vae = AutoencoderKL(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
        vars_ = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
        z1 = vae.apply(vars_, x, jax.random.PRNGKey(1),
                       method=AutoencoderKL.encode_sample)
        z2 = vae.apply(vars_, x, jax.random.PRNGKey(2),
                       method=AutoencoderKL.encode_sample)
        zm = vae.apply(vars_, x, method=AutoencoderKL.encode_mode)
        assert not np.allclose(np.asarray(z1), np.asarray(z2))
        assert zm.shape == z1.shape


class TestUNet:
    def _setup(self, B=1, H=16, W=16, L=8):
        cfg = tiny_unet_config()
        unet = UNet2DCondition(cfg)
        latents = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 4))
        t = jnp.array([500.0] * B)
        ctx = jax.random.normal(jax.random.PRNGKey(1),
                                (16, B, L, cfg.cross_attention_dim))
        vars_ = unet.init(jax.random.PRNGKey(2), latents, t, ctx, ctx)
        return unet, vars_, latents, t, ctx

    def test_output_shape(self):
        unet, vars_, latents, t, ctx = self._setup()
        out = unet.apply(vars_, latents, t, ctx, ctx)
        assert out.shape == latents.shape

    def test_xti_layer_routing(self):
        """Perturbing context layer i must change the output (spot-check a
        down-block layer, MID, and an up-block layer)."""
        unet, vars_, latents, t, ctx = self._setup()
        base = np.asarray(unet.apply(vars_, latents, t, ctx, ctx))
        for i in (0, 6, 15):
            ctx_i = ctx.at[i].add(1.0)
            out = np.asarray(unet.apply(vars_, latents, t, ctx_i, ctx_i))
            assert not np.allclose(base, out), f"layer {i} context unused"

    def test_bypass_feeds_values_only(self):
        """Different bypass stack with same K-source must change output;
        identical bypass must reproduce it."""
        unet, vars_, latents, t, ctx = self._setup()
        out_same = np.asarray(unet.apply(vars_, latents, t, ctx, ctx))
        ctx_b = ctx * 0.5
        out_diff = np.asarray(unet.apply(vars_, latents, t, ctx, ctx_b))
        assert not np.allclose(out_same, out_diff)
        out_rep = np.asarray(unet.apply(vars_, latents, t, ctx, ctx))
        np.testing.assert_allclose(out_same, out_rep, atol=1e-6)

    def test_context_broadcast_3d(self):
        unet, vars_, latents, t, ctx = self._setup()
        out = unet.apply(vars_, latents, t, ctx[0])
        assert out.shape == latents.shape

    def test_per_sample_timesteps(self):
        unet, vars_, latents, t, ctx = self._setup(B=1)
        o1 = np.asarray(unet.apply(vars_, latents, jnp.array([10.0]), ctx))
        o2 = np.asarray(unet.apply(vars_, latents, jnp.array([900.0]), ctx))
        assert not np.allclose(o1, o2)


class TestGradientCheckpointing:
    def test_remat_clip_matches_plain(self):
        """CLIP-layer remat (optim.gradient_checkpointing; reference
        coach.py:672-677) must not change forward values and must carry
        gradients."""
        import dataclasses
        cfg_r = dataclasses.replace(TINY_TEXT, gradient_checkpointing=True)
        model = NeTICLIPTextEncoder(TINY_TEXT)
        model_r = NeTICLIPTextEncoder(cfg_r)
        ids = jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (2, 16)), jnp.int32)
        vars_ = model.init(jax.random.PRNGKey(0), ids)
        h, _, pooled, _ = model.apply(vars_, ids)
        h_r, _, pooled_r, _ = model_r.apply(vars_, ids)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled_r),
                                   atol=1e-5)
        word = jnp.zeros((2, 32))
        ids = ids.at[0, 3].set(5)  # placeholder id must appear in the prompt
        ph = jnp.asarray([5, -1], jnp.int32)
        g = jax.grad(lambda w: jnp.sum(model_r.apply(
            vars_, ids, word_obj=w, ph_obj_ids=ph)[0] ** 2))(word)
        assert float(jnp.abs(g).sum()) > 0

    def test_remat_unet_matches_plain(self):
        """gradient_checkpointing=True must not change the forward values."""
        cfg = tiny_unet_config()
        cfg_r = tiny_unet_config(gradient_checkpointing=True)
        unet = UNet2DCondition(cfg)
        unet_r = UNet2DCondition(cfg_r)
        latents = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
        t = jnp.array([500.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (16, 1, 8, 32))
        vars_ = unet.init(jax.random.PRNGKey(2), latents, t, ctx, ctx)
        out = unet.apply(vars_, latents, t, ctx, ctx)
        out_r = unet_r.apply(vars_, latents, t, ctx, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                                   atol=1e-5)
        # gradients flow through the remat path
        g = jax.grad(lambda c: jnp.sum(
            unet_r.apply(vars_, latents, t, c, c) ** 2))(ctx)
        assert float(jnp.abs(g).sum()) > 0


class TestFastGroupNorm:
    def test_matches_flax_groupnorm_and_param_tree(self):
        """ops/norm.py FastGroupNorm: identical output (fp32 stats) and
        identical parameter tree to an anonymous nn.GroupNorm."""
        import flax.linen as nn
        from view_neti_tpu.ops.norm import group_norm

        class Stock(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.GroupNorm(num_groups=4, epsilon=1e-6,
                                    dtype=jnp.float32)(x).astype(jnp.bfloat16)

        class Fast(nn.Module):
            @nn.compact
            def __call__(self, x):
                return group_norm(4, 1e-6, jnp.bfloat16)(x)

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16),
                              jnp.bfloat16) * 3 + 1
        vs = Stock().init(jax.random.PRNGKey(1), x)
        vf = Fast().init(jax.random.PRNGKey(1), x)
        assert (jax.tree_util.tree_structure(vs)
                == jax.tree_util.tree_structure(vf))
        # non-trivial affine
        vs = jax.tree_util.tree_map(
            lambda p: p + 0.3 if p.ndim == 1 else p, vs)
        a = np.asarray(Stock().apply(vs, x), np.float32)
        b = np.asarray(Fast().apply(vs, x), np.float32)
        np.testing.assert_allclose(a, b, atol=0.02, rtol=0.02)

    def test_fp32_exact(self):
        import flax.linen as nn
        from view_neti_tpu.ops.norm import group_norm

        x = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 7, 12),
                              jnp.float32)
        stock = nn.GroupNorm(num_groups=3, epsilon=1e-5, dtype=jnp.float32)
        fast = group_norm(3, 1e-5, jnp.float32, name=None)
        vs = stock.init(jax.random.PRNGKey(3), x)
        a = np.asarray(stock.apply(vs, x))
        b = np.asarray(fast.apply(vs, x))
        np.testing.assert_allclose(a, b, atol=1e-5)
