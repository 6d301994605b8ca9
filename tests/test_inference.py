"""Inference-path tests: PromptManager precompute, jitted denoise pipeline,
weight-port mapping coverage."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from view_neti_tpu.config import RunConfig, decode
from view_neti_tpu.tokenizer import FallbackTokenizer
from view_neti_tpu.training import builder
from view_neti_tpu.inference.prompt_manager import PromptManager
from view_neti_tpu.inference.pipeline import (make_denoise_fn, generate,
                                              encode_uncond)
from view_neti_tpu.schedulers.dpm_solver import DPMSolverSchedule


@pytest.fixture(scope="module")
def built_mode0():
    cfg = decode(RunConfig, {
        "learnable_mode": 0,
        "model": {"arch_view_net": 15, "word_embedding_dim": 32}})
    tok = FallbackTokenizer(base_vocab_size=512)
    built = builder.build_models(cfg, tok, [], ["<thing>"],
                                 arch=builder.tiny_arch())
    return cfg, tok, built


class TestPromptManager:
    def test_embed_prompt_shapes(self, built_mode0):
        cfg, tok, built = built_mode0
        text = built.frozen.text
        schedule = DPMSolverSchedule()
        ts = schedule.set_timesteps(4)
        pm = PromptManager(
            tok, text, built.trainable, ts,
            placeholder_object_token_ids=built.
            placeholder_object_token_ids)
        ctx, ctx_b = pm.embed_prompt("a photo of a <thing>")
        assert ctx.shape == (4, 16, 1, 16, 32)
        assert ctx_b.shape == ctx.shape
        # timestep axis must vary (mapper conditions on t)
        assert not np.allclose(np.asarray(ctx[0]), np.asarray(ctx[-1]))

    def test_placeholder_extraction_absent(self, built_mode0):
        cfg, tok, built = built_mode0
        pm = PromptManager(
            tok, built.frozen.text, built.trainable, [999],
            placeholder_object_token_ids=built.placeholder_object_token_ids)
        ctx, _ = pm.embed_prompt("a photo of a dog")   # no placeholder
        assert np.isfinite(np.asarray(ctx)).all()

    def test_embed_prompts_batches_exactly(self, built_mode0):
        """r4: the batched precompute (one dispatch set for B prompts)
        must equal B separate embed_prompt calls, prompt for prompt."""
        cfg, tok, built = built_mode0
        schedule = DPMSolverSchedule()
        ts = schedule.set_timesteps(4)
        pm = PromptManager(
            tok, built.frozen.text, built.trainable, ts,
            placeholder_object_token_ids=built.
            placeholder_object_token_ids)
        # placeholder at DIFFERENT token positions across the batch (the
        # one-hot overwrite must locate it per row), plus one row with no
        # placeholder at all
        prompts = ["a photo of a <thing>", "<thing> in a forest",
                   "a photo of a dog"]
        ctx_b, ctxb_b = pm.embed_prompts(prompts)
        assert ctx_b.shape == (4, 16, 3, 16, 32)
        for i, p in enumerate(prompts):
            c1, cb1 = pm.embed_prompt(p)
            np.testing.assert_allclose(np.asarray(ctx_b[:, :, i]),
                                       np.asarray(c1[:, :, 0]),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(ctxb_b[:, :, i]),
                                       np.asarray(cb1[:, :, 0]),
                                       rtol=1e-5, atol=1e-6)


class TestPipeline:
    def test_generate_end_to_end(self, built_mode0):
        cfg, tok, built = built_mode0
        frozen = built.frozen
        schedule = DPMSolverSchedule()
        n_steps = 3
        ts = schedule.set_timesteps(n_steps)
        pm = PromptManager(
            tok, frozen.text, built.trainable, ts,
            placeholder_object_token_ids=built.placeholder_object_token_ids)
        ctx, ctx_b = pm.embed_prompt("a photo of a <thing>")
        uncond = encode_uncond(frozen.text.clip, frozen.text.clip_vars, tok,
                               max_length=16)
        imgs = generate(frozen.unet, frozen.unet_vars, frozen.vae,
                        frozen.vae_vars, schedule, ctx, ctx_b, uncond,
                        height=16, width=16, seeds=[0, 1],
                        num_inference_steps=n_steps)
        assert imgs.shape == (2, 16, 16, 3)
        assert imgs.dtype == np.uint8
        # different seeds -> different images
        assert not np.array_equal(imgs[0], imgs[1])

    def test_device_uint8_matches_host_quantization(self, built_mode0):
        """_decode_jit quantizes to uint8 ON DEVICE (r4: only 1 byte/px
        crosses the tunnel); must be bit-identical to the former host-side
        np conversion (both jnp.round and np.round are half-to-even)."""
        cfg, tok, built = built_mode0
        frozen = built.frozen
        from view_neti_tpu.inference.pipeline import _decode_jit
        from view_neti_tpu.models.vae import AutoencoderKL
        lat = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 2, 4),
                                jnp.float32)
        dev = np.asarray(_decode_jit(frozen.vae, frozen.vae_vars, lat))
        assert dev.dtype == np.uint8
        f32 = np.asarray(frozen.vae.apply(
            frozen.vae_vars, lat, method=AutoencoderKL.decode)
            .astype(jnp.float32))
        host = np.round(np.clip(f32 / 2 + 0.5, 0, 1) * 255).astype(np.uint8)
        np.testing.assert_array_equal(dev, host)

    def test_seed_determinism(self, built_mode0):
        cfg, tok, built = built_mode0
        frozen = built.frozen
        schedule = DPMSolverSchedule()
        n_steps = 2
        ts = schedule.set_timesteps(n_steps)
        pm = PromptManager(
            tok, frozen.text, built.trainable, ts,
            placeholder_object_token_ids=built.placeholder_object_token_ids)
        ctx, ctx_b = pm.embed_prompt("a photo of a <thing>")
        uncond = encode_uncond(frozen.text.clip, frozen.text.clip_vars, tok,
                               max_length=16)
        kw = dict(height=16, width=16, seeds=[7],
                  num_inference_steps=n_steps)
        a = generate(frozen.unet, frozen.unet_vars, frozen.vae,
                     frozen.vae_vars, schedule, ctx, ctx_b, uncond, **kw)
        b = generate(frozen.unet, frozen.unet_vars, frozen.vae,
                     frozen.vae_vars, schedule, ctx, ctx_b, uncond, **kw)
        np.testing.assert_array_equal(a, b)

    def test_guidance_changes_output(self, built_mode0):
        cfg, tok, built = built_mode0
        frozen = built.frozen
        schedule = DPMSolverSchedule()
        ts = schedule.set_timesteps(2)
        pm = PromptManager(
            tok, frozen.text, built.trainable, ts,
            placeholder_object_token_ids=built.placeholder_object_token_ids)
        ctx, ctx_b = pm.embed_prompt("a photo of a <thing>")
        uncond = encode_uncond(frozen.text.clip, frozen.text.clip_vars, tok,
                               max_length=16)
        outs = []
        for g in (1.0, 7.5):
            outs.append(generate(
                frozen.unet, frozen.unet_vars, frozen.vae, frozen.vae_vars,
                schedule, ctx, ctx_b, uncond, 16, 16, [0], 2,
                guidance_scale=g))
        assert not np.array_equal(outs[0], outs[1])


class TestWeightPortMapping:
    def test_unet_mapping_covers_param_tree(self, built_mode0):
        """Every flax UNet param leaf must be reachable by some mapping
        entry (so real SD weights can be ported)."""
        from view_neti_tpu import weight_port
        cfg, tok, built = built_mode0
        flax_params = jax.device_get(built.frozen.unet_vars["params"])
        mapping = weight_port.unet_mapping(num_blocks=4, layers_per_block=2)
        covered = set()
        for _, (path, _) in mapping.items():
            covered.add(path)

        def walk(tree, prefix=()):
            missing = []
            for k, v in tree.items():
                p = prefix + (k,)
                if isinstance(v, dict):
                    missing += walk(v, p)
                elif p not in covered:
                    missing.append("/".join(p))
            return missing

        missing = walk(flax_params)
        # conv_shortcut only exists where channels change; the mapping lists
        # them all, but the flax tree only instantiates the needed ones —
        # so coverage must be exact in this direction.
        assert missing == [], f"unported UNet params: {missing[:8]}"

    def test_clip_mapping_covers_param_tree(self, built_mode0):
        from view_neti_tpu import weight_port
        cfg, tok, built = built_mode0
        flax_params = jax.device_get(
            built.frozen.text.clip_vars["params"])
        mapping = weight_port.clip_text_mapping(num_layers=2)
        covered = {path for _, (path, _) in mapping.items()}

        def walk(tree, prefix=()):
            missing = []
            for k, v in tree.items():
                p = prefix + (k,)
                if isinstance(v, dict):
                    missing += walk(v, p)
                elif p not in covered:
                    missing.append("/".join(p))
            return missing

        missing = walk(flax_params)
        assert missing == [], f"unported CLIP params: {missing[:8]}"

    def test_vae_mapping_covers_param_tree(self, built_mode0):
        from view_neti_tpu import weight_port
        cfg, tok, built = built_mode0
        flax_params = jax.device_get(built.frozen.vae_vars["params"])
        mapping = weight_port.vae_mapping(num_blocks=2, layers_per_block=2)
        covered = {path for _, (path, _) in mapping.items()}

        def walk(tree, prefix=()):
            missing = []
            for k, v in tree.items():
                p = prefix + (k,)
                if isinstance(v, dict):
                    missing += walk(v, p)
                elif p not in covered:
                    missing.append("/".join(p))
            return missing

        missing = walk(flax_params)
        assert missing == [], f"unported VAE params: {missing[:8]}"

    def test_transforms(self):
        from view_neti_tpu import weight_port as wp
        w = np.arange(12).reshape(3, 4).astype(np.float32)
        np.testing.assert_array_equal(wp._linear_k(w), w.T)
        conv = np.arange(2 * 3 * 3 * 3).reshape(2, 3, 3, 3).astype(
            np.float32)
        out = wp._conv_k(conv)
        assert out.shape == (3, 3, 3, 2)


class TestBatchedGeneration:
    def test_generate_batch_matches_single(self, built_mode0):
        """Batching C prompts must reproduce per-prompt generation exactly
        (same seeds -> same initial latents per prompt)."""
        from view_neti_tpu.inference.pipeline import generate_batch
        cfg, tok, built = built_mode0
        frozen = built.frozen
        schedule = DPMSolverSchedule()
        n_steps = 2
        ts = schedule.set_timesteps(n_steps)
        pm = PromptManager(
            tok, frozen.text, built.trainable, ts,
            placeholder_object_token_ids=built.placeholder_object_token_ids)
        uncond = encode_uncond(frozen.text.clip, frozen.text.clip_vars, tok,
                               max_length=16)
        prompts = ["a photo of a <thing>", "a rendering of a <thing>"]
        ctxs = [pm.embed_prompt(p) for p in prompts]
        singles = [generate(frozen.unet, frozen.unet_vars, frozen.vae,
                            frozen.vae_vars, schedule, c, cb, uncond,
                            16, 16, [0, 1], n_steps)
                   for c, cb in ctxs]
        import jax.numpy as jnp
        contexts = jnp.concatenate([c for c, _ in ctxs], axis=2)
        contexts_b = jnp.concatenate([cb for _, cb in ctxs], axis=2)
        batched = generate_batch(frozen.unet, frozen.unet_vars, frozen.vae,
                                 frozen.vae_vars, schedule, contexts,
                                 contexts_b, uncond, 16, 16, [0, 1],
                                 n_steps)
        assert batched.shape == (2, 2, 16, 16, 3)
        for ci in range(2):
            np.testing.assert_array_equal(batched[ci], singles[ci])
        # as_numpy=False (the r5 sweep-pipelining path) hands back the SAME
        # images as an on-device array — the fetch is merely deferred
        deferred = generate_batch(frozen.unet, frozen.unet_vars,
                                  frozen.vae, frozen.vae_vars, schedule,
                                  contexts, contexts_b, uncond, 16, 16,
                                  [0, 1], n_steps, as_numpy=False)
        assert not isinstance(deferred, np.ndarray)
        np.testing.assert_array_equal(np.asarray(deferred), batched)
