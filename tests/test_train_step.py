"""Integration tests: builder -> text conditioning -> train step -> optim.

Tiny architecture; exercises modes 0, 2 (joint Mv+Mo), 3 (bank selection),
and 5 (frozen view mapper), plus dp-mesh sharding on the 8-device CPU mesh.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from view_neti_tpu.config import RunConfig, decode
from view_neti_tpu.tokenizer import FallbackTokenizer
from view_neti_tpu.data import dtu
from view_neti_tpu.training import builder
from view_neti_tpu.training.optim import (sliced_adamw, make_lr_schedule,
                                          scaled_learning_rate)
from view_neti_tpu.training.train_step import (TrainBatch, make_train_step,
                                               jit_train_step)
from view_neti_tpu.training.text_forward import neti_text_conditioning


IMG = 16  # tiny arch: VAE downsamples 2x -> 8x8 latents


def _dtu_view_tokens(n):
    rng = np.random.RandomState(7)
    return [dtu.dtu_cam_params_to_token(rng.randn(3, 4).astype(np.float32), i)
            for i in range(n)]


def _build(mode, n_obj=1, n_view=0, **cfg_overrides):
    data = {"learnable_mode": mode,
            "model": {"arch_view_net": 15, "arch_view_disable_tl": False,
                      "word_embedding_dim": 32},
            "data": {"camera_representation": "dtu-12d"}}
    if mode in (4, 5):
        # modes 4/5 require a pretrained view mapper reference; the builder
        # initializes fresh when no checkpoint loading is requested
        data["model"]["pretrained_view_mapper"] = "unused.msgpack"
    if mode == 3:
        data["data"]["super_category_object_tokens"] = ["object"] * n_obj
        data["data"]["placeholder_object_tokens"] = [
            f"<obj{i}>" for i in range(n_obj)]
    for k, v in cfg_overrides.items():
        data.setdefault(k, {}).update(v) if isinstance(v, dict) \
            else data.__setitem__(k, v)
    cfg = decode(RunConfig, data)
    tok = FallbackTokenizer(base_vocab_size=512)  # match tiny_arch vocab
    obj_tokens = ([f"<obj{i}>" for i in range(n_obj)]
                  if mode == 3 else (["<thing>"] if mode != 1 else []))
    view_tokens = _dtu_view_tokens(n_view) if n_view else []
    # tiny calibration dir comes from the tokens themselves: monkeypatch via
    # build_view_token_table's calibration_dir -> use the same params
    arch = builder.tiny_arch()
    calib = None
    if n_view:
        import tempfile, os
        d = tempfile.mkdtemp()
        rng = np.random.RandomState(7)
        for i in range(1, n_view + 1):
            m = rng.randn(3, 4)
            with open(os.path.join(d, f"pos_{i:03d}.txt"), "w") as f:
                f.write("\n".join(" ".join(str(x) for x in r) for r in m))
        calib = d
    built = builder.build_models(cfg, tok, view_tokens, obj_tokens,
                                 arch=arch, calibration_dir=calib)
    return cfg, built


def _batch(built, B=2, mode=0, object_idx=0):
    tok = built.tokenizer
    if built.placeholder_view_token_ids:
        view_id = built.placeholder_view_token_ids[0]
        obj_tok_id = built.placeholder_object_token_ids[object_idx]
        view_tok = [t for t, i in zip(
            built.view_table.tokens, built.view_table.token_ids)
            if i == view_id][0]
        obj_tok = [t for t in tok.added_tokens
                   if tok.added_tokens[t] == obj_tok_id][0]
        text = f"{view_tok}. A photo of a {obj_tok}"
        ids = tok(text, padding="max_length", truncation=True,
                  max_length=16).input_ids
        ph_view = np.full((B,), view_id, np.int32)
    else:
        obj_tok_id = built.placeholder_object_token_ids[object_idx]
        obj_tok = [t for t in tok.added_tokens
                   if tok.added_tokens[t] == obj_tok_id][0]
        ids = tok(f"a photo of a {obj_tok}", padding="max_length",
                  truncation=True, max_length=16).input_ids
        ph_view = np.full((B,), -1, np.int32)
    ids = np.repeat(ids, B, axis=0)
    rng = np.random.RandomState(0)
    return TrainBatch(
        pixel_values=jnp.asarray(
            rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)),
        input_ids=jnp.asarray(ids),
        input_ids_placeholder_object=jnp.full((B,), obj_tok_id, jnp.int32),
        input_ids_placeholder_view=jnp.asarray(ph_view),
        object_idx=jnp.asarray(object_idx, jnp.int32))


def _optimizer(cfg, mode, total_steps=10):
    lr = scaled_learning_rate(cfg.optim.learning_rate, cfg.optim.scale_lr,
                              cfg.optim.train_batch_size,
                              cfg.optim.gradient_accumulation_steps, 1)
    sched = make_lr_schedule(cfg.optim.lr_scheduler, lr,
                             cfg.optim.lr_warmup_steps, total_steps)
    stacked, frozen = builder.trainable_mask_keys(mode)
    return sliced_adamw(sched, cfg.optim.adam_beta1, cfg.optim.adam_beta2,
                        cfg.optim.adam_epsilon, cfg.optim.adam_weight_decay,
                        stacked_keys=stacked, frozen_keys=frozen)


class TestTextConditioning:
    def test_shapes_mode2(self):
        cfg, built = _build(2, n_view=3)
        batch = _batch(built, B=2)
        ctx, ctx_b = neti_text_conditioning(
            built.frozen.text, built.trainable,
            batch.input_ids, batch.input_ids_placeholder_object,
            batch.input_ids_placeholder_view,
            timesteps=jnp.array([100., 500.]),
            object_idx=batch.object_idx,
            rng=jax.random.PRNGKey(0), train=True)
        assert ctx.shape == (16, 2, 16, 32)
        assert ctx_b.shape == (16, 2, 16, 32)
        assert not np.allclose(np.asarray(ctx), np.asarray(ctx_b))

    def test_layer_axis_varies(self):
        """Different UNet layers must get different conditioning (the mapper
        conditions on l)."""
        cfg, built = _build(0)
        batch = _batch(built, B=1)
        ctx, _ = neti_text_conditioning(
            built.frozen.text, built.trainable,
            batch.input_ids, batch.input_ids_placeholder_object,
            batch.input_ids_placeholder_view,
            timesteps=jnp.array([500.]), object_idx=batch.object_idx,
            train=False)
        assert not np.allclose(np.asarray(ctx[0]), np.asarray(ctx[15]))


class TestTrainStep:
    def _run_steps(self, mode, n_obj=1, n_view=0, n_steps=3, object_idxs=None):
        cfg, built = _build(mode, n_obj=n_obj, n_view=n_view)
        opt = _optimizer(cfg, mode)
        opt_state = opt.init(built.trainable)
        step = jax.jit(make_train_step(opt), donate_argnums=(0, 1))
        # the step donates its inputs; step on a copy so built.trainable
        # stays live for before/after comparisons
        trainable = jax.tree_util.tree_map(jnp.copy, built.trainable)
        losses = []
        rng = jax.random.PRNGKey(0)
        for i in range(n_steps):
            rng, sub = jax.random.split(rng)
            oi = object_idxs[i] if object_idxs else 0
            batch = _batch(built, B=2, mode=mode, object_idx=oi)
            trainable, opt_state, metrics = step(
                trainable, opt_state, built.frozen, batch, sub)
            losses.append(float(metrics["total_loss"]))
        return cfg, built, trainable, opt_state, losses

    def test_mode0_object_updates(self):
        cfg, built, trainable, _, losses = self._run_steps(0)
        assert all(np.isfinite(losses))
        before = built.trainable["object"]
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()), before,
            trainable["object"])
        assert sum(jax.tree_util.tree_leaves(diff)) > 0

    @pytest.mark.quick   # the quick tier's one tiny end-to-end train step
    def test_mode2_both_update(self):
        cfg, built, trainable, _, losses = self._run_steps(2, n_view=3)
        for key in ("object", "view"):
            diff = jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).sum()),
                built.trainable[key], trainable[key])
            assert sum(jax.tree_util.tree_leaves(diff)) > 0, key

    def test_mode5_view_frozen(self):
        cfg, built, trainable, _, _ = self._run_steps(5, n_view=3)
        diff_view = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            built.trainable["view"], trainable["view"])
        assert sum(jax.tree_util.tree_leaves(diff_view)) == 0
        diff_obj = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            built.trainable["object"], trainable["object"])
        assert sum(jax.tree_util.tree_leaves(diff_obj)) > 0

    def test_mode4_both_update(self):
        """Mode 4: the (pretrained-initialized) view mapper KEEPS training
        alongside the object mapper — unlike mode 5, where it is frozen
        (reference coach.py:667,745: view params enter the optimizer in
        modes 1/2/3/4 only)."""
        cfg, built, trainable, _, _ = self._run_steps(4, n_view=3)
        diff_view = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            built.trainable["view"], trainable["view"])
        assert sum(jax.tree_util.tree_leaves(diff_view)) > 0
        diff_obj = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            built.trainable["object"], trainable["object"])
        assert sum(jax.tree_util.tree_leaves(diff_obj)) > 0

    def test_mode3_only_selected_scene_updates(self):
        cfg, built, trainable, _, _ = self._run_steps(
            3, n_obj=3, n_view=3, n_steps=2, object_idxs=[1, 1])
        obj_before = built.trainable["object"]
        obj_after = trainable["object"]

        def slice_diff(i):
            d = jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a[i] - b[i]).sum()),
                obj_before, obj_after)
            return sum(jax.tree_util.tree_leaves(d))

        assert slice_diff(1) > 0
        assert slice_diff(0) == 0 and slice_diff(2) == 0


class TestMode1ViewOnly:
    def test_view_only_training(self):
        """Mode 1: no object mapper; view mapper trains against a fixed
        vocabulary word as the object."""
        cfg, built = _build(1, n_view=3)
        assert "object" not in built.trainable
        assert built.placeholder_object_token_ids == []
        opt = _optimizer(cfg, 1)
        opt_state = opt.init(built.trainable)
        step = jax.jit(make_train_step(opt), donate_argnums=(0, 1))
        tok = built.tokenizer
        view_id = built.placeholder_view_token_ids[0]
        view_tok = built.view_table.tokens[0]
        ids = tok(f"{view_tok}. A photo of a statue", padding="max_length",
                  truncation=True, max_length=16).input_ids
        ids = np.repeat(ids, 2, axis=0)
        batch = TrainBatch(
            pixel_values=jnp.zeros((2, IMG, IMG, 3), jnp.float32),
            input_ids=jnp.asarray(ids),
            input_ids_placeholder_object=jnp.full((2,), -1, jnp.int32),
            input_ids_placeholder_view=jnp.full((2,), view_id, jnp.int32),
            object_idx=jnp.asarray(0, jnp.int32))
        before = jax.tree_util.tree_map(jnp.copy, built.trainable)
        trainable = jax.tree_util.tree_map(jnp.copy, built.trainable)
        trainable, opt_state, metrics = step(trainable, opt_state,
                                             built.frozen, batch,
                                             jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["total_loss"]))
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            before["view"], trainable["view"])
        assert sum(jax.tree_util.tree_leaves(diff)) > 0


class TestPretrainedViewMapper:
    def test_mode5_loads_saved_view_checkpoint(self, tmp_path):
        """Train-ish a mode-2 view mapper, checkpoint it, rebuild mode 5
        with pretrained_view_mapper: params must load from disk."""
        from view_neti_tpu.checkpoint import CheckpointHandler
        from view_neti_tpu.config import decode, RunConfig
        cfg2, built2 = _build(2, n_view=3)
        # perturb the view params so the checkpoint differs from fresh init
        perturbed = jax.tree_util.tree_map(lambda p: p + 1.0,
                                           built2.trainable["view"])
        handler = CheckpointHandler(
            cfg2, list(built2.view_table.tokens),
            [int(i) for i in built2.view_table.token_ids],
            ["<thing>"], built2.placeholder_object_token_ids,
            save_root=tmp_path)
        handler.save_mapper({"view": perturbed, "object": None},
                            None, jax.device_get(
                                built2.frozen.text.view_constants),
                            built2.view_table, "mapper-steps-7.msgpack")
        ckpt = tmp_path / "mapper-steps-7_view.msgpack"
        assert ckpt.exists()

        # mode-5 Coach-level loading goes through
        # Coach._maybe_load_pretrained_mappers; exercise the underlying
        # loader + parameter equality here (Coach needs a dataset)
        _, payload = CheckpointHandler.load_mapper(ckpt)
        loaded = payload["mappers"]["view"]["params"]
        flat_a = jax.tree_util.tree_leaves(loaded)
        flat_b = jax.tree_util.tree_leaves(jax.device_get(perturbed))
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestLatentCache:
    def test_from_moments_step_matches_shapes(self):
        """from_moments=True trains from precomputed VAE posterior moments
        (the latent-cache fast path)."""
        from view_neti_tpu.models.vae import AutoencoderKL
        cfg, built = _build(0)
        frozen = built.frozen
        pix = _batch(built, B=2).pixel_values
        moments = frozen.vae.apply(frozen.vae_vars, pix,
                                   method=AutoencoderKL.moments)
        assert moments.shape == (2, IMG // 2, IMG // 2, 8)
        opt = _optimizer(cfg, 0)
        opt_state = opt.init(built.trainable)
        step = jax.jit(make_train_step(opt, from_moments=True),
                       donate_argnums=(0, 1))
        b = _batch(built, B=2)
        b = dataclasses.replace(b, pixel_values=moments)
        trainable = jax.tree_util.tree_map(jnp.copy, built.trainable)
        trainable, opt_state, metrics = step(trainable, opt_state,
                                             built.frozen, b,
                                             jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["total_loss"]))
        diff = jax.tree_util.tree_map(
            lambda a, c: float(jnp.abs(a - c).sum()),
            built.trainable["object"], trainable["object"])
        assert sum(jax.tree_util.tree_leaves(diff)) > 0


class TestMeshSharding:
    @pytest.mark.quick   # the quick tier's mesh-sharding regression gate
    def test_dp_mesh_step(self):
        from view_neti_tpu.parallel import mesh as pmesh
        cfg, built = _build(2, n_view=3)
        m = pmesh.make_mesh(n_dp=4, n_tp=2, devices=jax.devices("cpu"))
        rep = pmesh.replicated(m)
        opt = _optimizer(cfg, 2)
        opt_state = opt.init(built.trainable)
        batch = _batch(built, B=4)
        bs = pmesh.batch_shardings_for(batch, m)
        step = jit_train_step(make_train_step(opt), mesh=m,
                              batch_sharding=bs, replicated=rep)
        frozen = jax.device_put(built.frozen, rep)
        trainable, opt_state, metrics = step(
            built.trainable, opt_state, frozen, batch,
            jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["total_loss"]))


class TestGradAccum:
    def test_multisteps_updates_every_k(self):
        cfg, built = _build(0)
        inner = _optimizer(cfg, 0)
        opt = optax.MultiSteps(inner, every_k_schedule=3)
        opt_state = opt.init(built.trainable)
        step = jax.jit(make_train_step(opt), donate_argnums=(0, 1))
        t0 = jax.tree_util.tree_map(jnp.copy, built.trainable)
        trainable = built.trainable
        rng = jax.random.PRNGKey(0)
        snapshots = []
        for i in range(3):
            rng, sub = jax.random.split(rng)
            trainable, opt_state, _ = step(trainable, opt_state,
                                           built.frozen,
                                           _batch(built, B=2), sub)
            d = jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).sum()), t0,
                trainable)
            snapshots.append(sum(jax.tree_util.tree_leaves(d)))
        # no param change until the 3rd micro-batch
        assert snapshots[0] == 0 and snapshots[1] == 0
        assert snapshots[2] > 0


class TestSphericalCameras:
    def test_mode2_spherical_train_step(self):
        """Spherical <view_theta_phi_r> tokens: table auto-detects the
        degree of freedom and the train step runs end-to-end."""
        from view_neti_tpu.config import RunConfig, decode
        from view_neti_tpu.tokenizer import FallbackTokenizer
        cfg = decode(RunConfig, {
            "learnable_mode": 2,
            "model": {"arch_view_net": 15, "arch_view_disable_tl": False,
                      "word_embedding_dim": 32},
            "data": {"camera_representation": "spherical"}})
        tok = FallbackTokenizer(base_vocab_size=512)
        view_tokens = ["<view_30_0_1p2>", "<view_30_45_1p2>",
                       "<view_30_90_1p2>"]
        built = builder.build_models(cfg, tok, view_tokens, ["<thing>"],
                                     arch=builder.tiny_arch())
        assert built.view_table.deg_freedom == "phi"
        assert built.frozen.text.view_table_params.shape == (3, 1)
        opt = _optimizer(cfg, 2)
        opt_state = opt.init(built.trainable)
        step = jax.jit(make_train_step(opt), donate_argnums=(0, 1))
        view_id = built.placeholder_view_token_ids[1]
        obj_id = built.placeholder_object_token_ids[0]
        ids = tok("<view_30_45_1p2>. A photo of a <thing>",
                  padding="max_length", truncation=True,
                  max_length=16).input_ids
        ids = np.repeat(ids, 2, axis=0)
        batch = TrainBatch(
            pixel_values=jnp.zeros((2, IMG, IMG, 3), jnp.float32),
            input_ids=jnp.asarray(ids),
            input_ids_placeholder_object=jnp.full((2,), obj_id, jnp.int32),
            input_ids_placeholder_view=jnp.full((2,), view_id, jnp.int32),
            object_idx=jnp.asarray(0, jnp.int32))
        trainable = jax.tree_util.tree_map(jnp.copy, built.trainable)
        trainable, opt_state, metrics = step(trainable, opt_state,
                                             built.frozen, batch,
                                             jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["total_loss"]))
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            built.trainable["view"], trainable["view"])
        assert sum(jax.tree_util.tree_leaves(diff)) > 0


class TestMultiStepScan:
    def test_scan_matches_sequential_with_accumulation(self):
        """make_multi_step (superstep dispatch) over a MultiSteps(k=2)
        optimizer: scanning 4 microbatches = 2 optimizer steps, identical
        to sequential stepping; losses come back per-microbatch."""
        from view_neti_tpu.training.train_step import make_multi_step

        cfg, built = _build(2, n_view=3)
        inner = _optimizer(cfg, 2)
        opt = optax.MultiSteps(inner, every_k_schedule=2)
        step = make_train_step(opt)
        batches = [_batch(built, B=2) for _ in range(4)]
        keys = jax.random.split(jax.random.PRNGKey(0), 4)

        tr_a = jax.tree_util.tree_map(jnp.copy, built.trainable)
        st_a = opt.init(built.trainable)
        sstep = jax.jit(step)
        for i in range(4):
            tr_a, st_a, m = sstep(tr_a, st_a, built.frozen,
                                  batches[i], keys[i])

        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *batches)
        multi = jax.jit(make_multi_step(step))
        tr_b, st_b, metrics = multi(
            jax.tree_util.tree_map(jnp.copy, built.trainable),
            opt.init(built.trainable), built.frozen, stacked,
            jnp.asarray(keys))
        assert metrics["total_loss"].shape == (4,)
        assert np.all(np.isfinite(np.asarray(metrics["total_loss"])))
        # scanned vs sequential compiles reassociate f32 ops slightly
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=1e-4, rtol=2e-3), tr_a, tr_b)
