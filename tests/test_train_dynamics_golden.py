"""Training-dynamics golden parity vs torch autograd + torch.optim.AdamW.

Every other torch golden in this suite is forward-only; the reference's
actual training step IS torch autograd plus torch.optim.AdamW over the
mapper parameters (reference training/coach.py:211-218, 727-746). These
tests close the backward half of the quality triangle:

  * single-step mapper GRADIENTS through the full chain (VAE posterior
    sample -> noising -> 16-layer NeTI text conditioning incl. bypass ->
    UNet -> MSE) match torch autograd through the independent mirrors
    (tests/torch_mirror_neti.py + tests/torch_mirror_sd.py + the REAL
    transformers CLIP), with identical injected noise/timesteps;
  * an N-step parameter TRAJECTORY through the real jitted
    make_train_step + sliced_adamw matches torch.optim.AdamW driving the
    torch mirror losses;
  * sliced_adamw's update math (bias correction, eps placement, decoupled
    weight-decay timing, grad=None slice skipping) matches
    torch.optim.AdamW on synthetic gradients.

All stochastic draws are derived in the test from the SAME PRNG splits the
train step performs internally (train_step.py step(): split(rng, 5) ->
r_vae/r_noise/r_t/r_drop/r_aug) and injected into the torch side as data.
Nested dropout is disabled (its stochastic stream is JAX-side only; the
masked-multiply gradient it adds is covered by test_mapper.py).
"""
import os
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from view_neti_tpu import weight_port as wp  # noqa: E402
from view_neti_tpu.config import RunConfig, decode  # noqa: E402
from view_neti_tpu.data import dtu  # noqa: E402
from view_neti_tpu.models.clip_text import (CLIPTextConfig,  # noqa: E402
                                            NeTICLIPTextEncoder)
from view_neti_tpu.models.neti_mapper import NeTIMapper  # noqa: E402
from view_neti_tpu.models.unet import UNetConfig, UNet2DCondition  # noqa: E402
from view_neti_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402
from view_neti_tpu.models.view_tokens import build_view_token_table  # noqa: E402
from view_neti_tpu.schedulers.ddpm import DDPMSchedule  # noqa: E402
from view_neti_tpu.tokenizer import FallbackTokenizer  # noqa: E402
from view_neti_tpu.torch_interop import flax_from_torch_state  # noqa: E402
from view_neti_tpu.training import builder  # noqa: E402
from view_neti_tpu.training.optim import (make_lr_schedule,  # noqa: E402
                                          sliced_adamw)
from view_neti_tpu.training.text_forward import TextModels  # noqa: E402
from view_neti_tpu.training.train_step import (FrozenModels,  # noqa: E402
                                               TrainBatch, make_train_step)

import torch_mirror_neti as tmn  # noqa: E402
from torch_mirror_sd import MirrorUNet, MirrorVAE  # noqa: E402

D = 32            # word embedding / ctx dim
L = 16            # prompt length
B = 2
IMG = 64          # -> 8x8 latents through the 3-downsample mirror VAE
VOCAB, HEADROOM = 512, 128
BLOCK_OUT = (8, 16, 16, 16)
GROUPS = 4
HEADS = 2
H_OBJ, H_VIEW = 128, 64   # reference neti_mapper.py:148,603


class PairedStack:
    """Torch mirrors + flax models initialized to identical weights."""


def _torch_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _build_stack(variant: str) -> PairedStack:
    """variant: 'constrained' (code-default bypass, alpha 0.2) or
    'unconstrained' (shipped-yaml style: unconstrained bypass, alpha 5,
    normalized view output)."""
    uncon = variant == "unconstrained"
    alpha = 5.0 if uncon else 0.2
    norm_view = uncon

    s = PairedStack()
    torch.manual_seed(0)

    # ---- CLIP pair: real transformers model, table covers the headroom --
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=VOCAB + HEADROOM, hidden_size=D, intermediate_size=2 * D,
        num_hidden_layers=2, num_attention_heads=HEADS,
        max_position_embeddings=L, hidden_act="quick_gelu", eos_token_id=2)
    s.hf = transformers.CLIPTextModel(hf_cfg).eval()
    report = wp.PortReport("clip")
    clip_params = wp.port_clip_text(_torch_sd(s.hf), num_layers=2,
                                    vocab_headroom=0, report=report)
    assert report.clean, report.summary()
    clip_cfg = CLIPTextConfig(
        vocab_size=VOCAB, vocab_headroom=HEADROOM, hidden_size=D,
        num_layers=2, num_heads=HEADS, intermediate_size=2 * D,
        max_position_embeddings=L)

    # ---- concept tokens + placeholder-row init (builder parity path) ----
    cfg = decode(RunConfig, {
        "learnable_mode": 2,
        "model": {"arch_view_net": 15, "arch_view_disable_tl": False,
                  "word_embedding_dim": D, "use_nested_dropout": False},
        "data": {"camera_representation": "dtu-12d"}})
    s.cfg = cfg
    tok = FallbackTokenizer(base_vocab_size=VOCAB)
    rng_np = np.random.RandomState(7)
    cams = [rng_np.randn(3, 4).astype(np.float32) for _ in range(3)]
    view_tokens = [dtu.dtu_cam_params_to_token(c, i)
                   for i, c in enumerate(cams)]
    calib = tempfile.mkdtemp()
    for i, c in enumerate(cams):
        with open(os.path.join(calib, f"pos_{i + 1:03d}.txt"), "w") as f:
            f.write("\n".join(" ".join(str(x) for x in r) for r in c))
    (table, _all_ids, view_ids, obj_ids, norms_obj,
     norm_view_val) = builder.add_concept_tokens(
        cfg, tok, view_tokens, ["<thing>"], clip_params["token_embedding"])
    clip_params["token_embedding"] = table
    with torch.no_grad():
        s.hf.text_model.embeddings.token_embedding.weight.copy_(
            torch.from_numpy(table))
    s.tok, s.obj_id, s.view_ids = tok, obj_ids[0], view_ids
    s.view_table = build_view_token_table(view_tokens, view_ids,
                                          calibration_dir=calib)

    # ---- mappers: torch mirrors -> flax via the REAL interop path ------
    # arch-15 PE dim is fixed at 64 (reference neti_mapper.py:506-511),
    # so the frequency matrices are (32, nfeats) regardless of output_dim
    w_obj = (rng_np.randn(32, 2) * [0.03, 2.0]).astype(np.float32)
    w_view = (rng_np.randn(32, 14)
              * ([0.03, 2.0] + [0.5] * 12)).astype(np.float32)
    s.m_obj_t = tmn.MirrorNeTIMapper(w_obj, hidden=H_OBJ, output_dim=D)
    s.m_view_t = tmn.MirrorNeTIMapper(w_view, hidden=H_VIEW, output_dim=D)
    obj_params, obj_consts = flax_from_torch_state(_torch_sd(s.m_obj_t))
    view_params, view_consts = flax_from_torch_state(_torch_sd(s.m_view_t))
    np.testing.assert_array_equal(obj_consts["fourier_w"], w_obj)

    common = dict(output_dim=D, arch_mlp_hidden_dims=H_OBJ,
                  use_nested_dropout=False, output_bypass=True,
                  arch_view_net=15, bypass_unconstrained=uncon,
                  output_bypass_alpha=alpha)
    obj_mapper = NeTIMapper(embedding_type="object", normalize_output=True,
                            arch_view_disable_tl=True, num_view_cond_dims=0,
                            **common)
    view_mapper = NeTIMapper(embedding_type="view",
                             normalize_output=norm_view,
                             arch_view_disable_tl=False,
                             num_view_cond_dims=12, **common)

    s.trainable = {
        "object": jax.tree_util.tree_map(
            lambda x: jnp.asarray(x)[None], obj_params),
        "view": jax.tree_util.tree_map(jnp.asarray, view_params)}

    # ---- frozen UNet + VAE pairs ---------------------------------------
    s.unet_t = MirrorUNet(block_out=BLOCK_OUT, ctx_dim=D, heads=HEADS,
                          groups=GROUPS).eval()
    report = wp.PortReport("unet")
    unet_params = wp.port_unet(_torch_sd(s.unet_t), report=report)
    assert report.clean, report.summary()
    unet_cfg = UNetConfig(block_out_channels=BLOCK_OUT,
                          cross_attention_dim=D, num_attention_heads=HEADS,
                          norm_groups=GROUPS, use_flash_attention=False)

    s.vae_t = MirrorVAE(block_out=(8, 16, 32, 32), groups=GROUPS).eval()
    report = wp.PortReport("vae")
    vae_params = wp.port_vae(_torch_sd(s.vae_t), report=report)
    assert report.clean, report.summary()
    vae_cfg = VAEConfig(base_channels=8, channel_mults=(1, 2, 4, 4),
                        norm_groups=GROUPS)

    s.schedule = DDPMSchedule()
    s.alpha, s.uncon, s.norm_view = alpha, uncon, norm_view
    s.obj_norm_scale = float(norms_obj[0])
    s.view_norm_scale = float(norm_view_val) if norm_view else None

    text = TextModels(
        clip=NeTICLIPTextEncoder(clip_cfg),
        clip_vars={"params": jax.tree_util.tree_map(jnp.asarray,
                                                    clip_params)},
        obj_mapper=obj_mapper,
        obj_constants={"fourier_w": jnp.asarray(w_obj)},
        view_mapper=view_mapper,
        view_constants={"fourier_w": jnp.asarray(w_view)},
        view_table_ids=jnp.asarray(s.view_table.token_ids),
        view_table_params=jnp.asarray(s.view_table.params_scaled()),
        obj_norm_scales=jnp.asarray([s.obj_norm_scale], jnp.float32),
        view_norm_scale=(jnp.asarray(s.view_norm_scale, jnp.float32)
                         if norm_view else None))
    s.frozen = FrozenModels(
        text=text, unet=UNet2DCondition(unet_cfg),
        unet_vars={"params": jax.tree_util.tree_map(jnp.asarray,
                                                    unet_params)},
        vae=AutoencoderKL(vae_cfg),
        vae_vars={"params": jax.tree_util.tree_map(jnp.asarray,
                                                   vae_params)},
        schedule=s.schedule)

    # ---- shared batch ----------------------------------------------------
    text_prompt = f"{view_tokens[1]}. A photo of a <thing>"
    ids = tok(text_prompt, padding="max_length", truncation=True,
              max_length=L).input_ids
    s.ids = np.repeat(np.asarray(ids), B, axis=0).astype(np.int32)
    s.ph_obj = np.full((B,), s.obj_id, np.int32)
    s.ph_view = np.full((B,), view_ids[1], np.int32)
    row = int(np.argmax(np.asarray(s.view_table.token_ids) == view_ids[1]))
    s.cam = np.repeat(s.view_table.params_scaled()[row][None], B,
                      axis=0).astype(np.float32)
    rng_px = np.random.RandomState(11)
    s.pixels = rng_px.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)
    return s


@pytest.fixture(scope="module", params=["constrained", "unconstrained"])
def stack(request):
    return _build_stack(request.param)


def _injected_draws(s, rng):
    """Replicate the train step's internal PRNG splits + draws
    (train_step.py step(): split(rng, 5); encode_sample's eps; the noise
    and per-sample timesteps)."""
    r_vae, r_noise, r_t, _r_drop, _r_aug = jax.random.split(rng, 5)
    lat_shape = (B, IMG // 8, IMG // 8, 4)
    eps_vae = np.asarray(jax.random.normal(r_vae, lat_shape, jnp.float32))
    noise = np.asarray(jax.random.normal(r_noise, lat_shape, jnp.float32))
    timesteps = np.asarray(jax.random.randint(
        r_t, (B,), 0, s.schedule.num_train_timesteps))
    return eps_vae, noise, timesteps


def _torch_loss(s, eps_vae, noise, timesteps):
    def nchw(x):
        return torch.from_numpy(np.ascontiguousarray(
            x.transpose(0, 3, 1, 2)))

    return tmn.train_step_loss(
        s.vae_t, s.hf, s.unet_t, s.m_obj_t, s.m_view_t,
        nchw(s.pixels), torch.from_numpy(s.ids.astype(np.int64)),
        torch.from_numpy(s.ph_obj.astype(np.int64)),
        torch.from_numpy(s.ph_view.astype(np.int64)),
        torch.from_numpy(s.cam),
        nchw(eps_vae), nchw(noise),
        torch.from_numpy(timesteps.astype(np.int64)),
        s.schedule.alphas_cumprod, 0.18215,
        obj_norm_scale=s.obj_norm_scale,
        view_norm_scale=s.view_norm_scale,
        alpha_obj=s.alpha, alpha_view=s.alpha,
        unconstrained_obj=s.uncon, unconstrained_view=s.uncon)


def _batch(s):
    return TrainBatch(
        pixel_values=jnp.asarray(s.pixels),
        input_ids=jnp.asarray(s.ids),
        input_ids_placeholder_object=jnp.asarray(s.ph_obj),
        input_ids_placeholder_view=jnp.asarray(s.ph_view),
        object_idx=jnp.asarray(0, jnp.int32))


def _torch_grads_as_flax(mapper_t):
    """Collect torch .grad tensors and convert them through the SAME
    key-rename/transpose path the weights travel (flax_from_torch_state),
    yielding a flax-shaped gradient tree."""
    sd = {}
    for name, p in mapper_t.named_parameters():
        g = p.grad
        sd[name] = (np.zeros(p.shape, np.float32) if g is None
                    else g.detach().numpy())
    params, _ = flax_from_torch_state(sd)
    return params


def _assert_tree_close(tree_a, tree_b, rtol, label, atol_floor=1e-7):
    flat_a = jax.tree_util.tree_leaves_with_path(tree_a)
    flat_b = jax.tree_util.tree_leaves(tree_b)
    assert len(flat_a) == len(flat_b)
    for (path, a), b in zip(flat_a, flat_b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), atol_floor)
        err = np.abs(a - b).max() / scale
        assert err <= rtol, (
            f"{label}{jax.tree_util.keystr(path)}: rel err {err:.2e} "
            f"(scale {scale:.3e})")


class TestSingleStepGradients:
    def test_clip_decomposition_sanity(self, stack):
        """The hand-rolled transformers submodule walk (no injection) must
        equal the full CLIPTextModel forward — guards the mirror against
        transformers-version drift."""
        ids_t = torch.from_numpy(stack.ids.astype(np.int64))
        with torch.no_grad():
            ref = stack.hf(input_ids=ids_t).last_hidden_state
            ours, _ = tmn.neti_clip_forward(stack.hf, ids_t)
        np.testing.assert_allclose(ours.numpy(), ref.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_mapper_grads_match_torch(self, stack):
        s = stack
        rng = jax.random.PRNGKey(42)
        eps_vae, noise, timesteps = _injected_draws(s, rng)

        # JAX: the REAL jitted train step with SGD(lr=1) => grad = p0 - p1
        opt = optax.sgd(1.0)
        step = jax.jit(make_train_step(opt))
        tr0 = jax.tree_util.tree_map(jnp.copy, s.trainable)
        tr1, _, metrics = step(tr0, opt.init(s.trainable), s.frozen,
                               _batch(s), rng)
        grads = jax.tree_util.tree_map(lambda a, b: np.asarray(a - b),
                                       s.trainable, tr1)

        # torch: same loss, autograd
        for m in (s.m_obj_t, s.m_view_t):
            m.zero_grad(set_to_none=True)
        loss = _torch_loss(s, eps_vae, noise, timesteps)
        loss.backward()

        np.testing.assert_allclose(float(metrics["total_loss"]),
                                   float(loss.detach()), rtol=1e-4)
        g_obj_t = _torch_grads_as_flax(s.m_obj_t)
        g_view_t = _torch_grads_as_flax(s.m_view_t)
        g_obj_j = jax.tree_util.tree_map(lambda a: a[0], grads["object"])
        _assert_tree_close(g_obj_j, g_obj_t, 1e-3, "object")
        _assert_tree_close(grads["view"], g_view_t, 1e-3, "view")

    def test_grads_are_nontrivial(self, stack):
        """Anti-vacuity: the compared gradients must not be ~zero."""
        s = stack
        rng = jax.random.PRNGKey(42)
        eps_vae, noise, timesteps = _injected_draws(s, rng)
        for m in (s.m_obj_t, s.m_view_t):
            m.zero_grad(set_to_none=True)
        _torch_loss(s, eps_vae, noise, timesteps).backward()
        total = sum(float(p.grad.abs().sum())
                    for m in (s.m_obj_t, s.m_view_t)
                    for p in m.parameters() if p.grad is not None)
        assert total > 1e-3, total


class TestTrajectoryParity:
    N_STEPS = 12
    LR = 1e-2

    def test_adamw_trajectory_matches_torch(self, stack):
        """N steps of the real jitted train step + sliced_adamw vs
        torch.optim.AdamW on the mirror losses, identical injected draws
        per step (reference coach.py:727-746 optimizer semantics)."""
        s = stack
        sched = make_lr_schedule("constant", self.LR, 0, self.N_STEPS)
        opt = sliced_adamw(sched, 0.9, 0.999, 1e-8, 1e-2,
                           stacked_keys=("object",))
        step = jax.jit(make_train_step(opt))
        trainable = jax.tree_util.tree_map(jnp.copy, s.trainable)
        opt_state = opt.init(trainable)

        # torch side works on FRESH copies so the module-scoped stack
        # stays pristine for other tests
        import copy
        m_obj = copy.deepcopy(s.m_obj_t)
        m_view = copy.deepcopy(s.m_view_t)
        params_t = [p for m in (m_obj, m_view) for p in m.parameters()]
        opt_t = torch.optim.AdamW(params_t, lr=self.LR, betas=(0.9, 0.999),
                                  eps=1e-8, weight_decay=1e-2)
        s_obj, s_view = s.m_obj_t, s.m_view_t
        s.m_obj_t, s.m_view_t = m_obj, m_view
        try:
            base = jax.random.PRNGKey(7)
            for i in range(self.N_STEPS):
                rng = jax.random.fold_in(base, i)
                eps_vae, noise, timesteps = _injected_draws(s, rng)
                trainable, opt_state, metrics = step(
                    trainable, opt_state, s.frozen, _batch(s), rng)
                opt_t.zero_grad(set_to_none=True)
                loss = _torch_loss(s, eps_vae, noise, timesteps)
                loss.backward()
                opt_t.step()
                np.testing.assert_allclose(
                    float(metrics["total_loss"]), float(loss), rtol=2e-4,
                    err_msg=f"loss diverged at step {i}")
            p_obj_t, _ = flax_from_torch_state(_torch_sd(m_obj))
            p_view_t, _ = flax_from_torch_state(_torch_sd(m_view))
        finally:
            s.m_obj_t, s.m_view_t = s_obj, s_view
        _assert_tree_close(
            jax.tree_util.tree_map(lambda a: a[0], trainable["object"]),
            p_obj_t, 2e-3, "object", atol_floor=1e-4)
        _assert_tree_close(trainable["view"], p_view_t, 2e-3, "view",
                           atol_floor=1e-4)


class TestSlicedAdamWUnit:
    """sliced_adamw vs torch.optim.AdamW on synthetic gradients: update
    math, bias-correction indexing, eps placement, decoupled weight-decay
    timing, and the grad=None slice-skip emulation (reference
    coach.py:727-746; torch skips params whose .grad is None entirely)."""

    N, STEPS = 3, 10

    def _torch_reference(self, p0, grads_per_step, active_per_step,
                         lr, wd):
        ps = [torch.nn.Parameter(torch.from_numpy(p0[i].copy()))
              for i in range(self.N)]
        opt = torch.optim.AdamW(ps, lr=lr, betas=(0.9, 0.999), eps=1e-8,
                                weight_decay=wd)
        for g_step, act in zip(grads_per_step, active_per_step):
            opt.zero_grad(set_to_none=True)
            for i in range(self.N):
                if act[i]:
                    ps[i].grad = torch.from_numpy(g_step[i].copy())
            opt.step()
        return np.stack([p.detach().numpy() for p in ps])

    @pytest.mark.quick
    def test_stacked_slices_match_torch_adamw(self):
        rng = np.random.RandomState(0)
        shape = (4, 5)
        p0 = rng.randn(self.N, *shape).astype(np.float32)
        grads, active = [], []
        for t in range(self.STEPS):
            act = [True, t % 2 == 0, t >= 5]   # mixed activity patterns
            g = rng.randn(self.N, *shape).astype(np.float32)
            for i in range(self.N):
                if not act[i]:
                    g[i] = 0.0                 # inactive = zero grad slice
            grads.append(g)
            active.append(act)

        lr, wd = 1e-2, 1e-2
        opt = sliced_adamw(lambda c: jnp.asarray(lr, jnp.float32),
                           0.9, 0.999, 1e-8, wd, stacked_keys=("object",))
        params = {"object": {"w": jnp.asarray(p0)}}
        state = opt.init(params)
        for g in grads:
            updates, state = opt.update(
                {"object": {"w": jnp.asarray(g)}}, state, params)
            params = optax.apply_updates(params, updates)

        ref = self._torch_reference(p0, grads, active, lr, wd)
        np.testing.assert_allclose(np.asarray(params["object"]["w"]), ref,
                                   rtol=1e-5, atol=1e-6)

    def test_unstacked_tree_matches_torch_adamw(self):
        rng = np.random.RandomState(1)
        shape = (6,)
        p0 = rng.randn(*shape).astype(np.float32)
        lr, wd = 3e-3, 1e-2
        opt = sliced_adamw(lambda c: jnp.asarray(lr, jnp.float32),
                           0.9, 0.999, 1e-8, wd, stacked_keys=())
        params = {"view": {"w": jnp.asarray(p0)}}
        state = opt.init(params)
        pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        opt_t = torch.optim.AdamW([pt], lr=lr, betas=(0.9, 0.999),
                                  eps=1e-8, weight_decay=wd)
        for _ in range(self.STEPS):
            g = rng.randn(*shape).astype(np.float32)
            updates, state = opt.update({"view": {"w": jnp.asarray(g)}},
                                        state, params)
            params = optax.apply_updates(params, updates)
            opt_t.zero_grad(set_to_none=True)
            pt.grad = torch.from_numpy(g.copy())
            opt_t.step()
        np.testing.assert_allclose(np.asarray(params["view"]["w"]),
                                   pt.detach().numpy(), rtol=1e-5,
                                   atol=1e-6)

    def test_inactive_slice_state_is_untouched(self):
        """A never-active slice must keep zero moments, zero count, and its
        exact initial value (torch: grad=None -> no decay, no step)."""
        opt = sliced_adamw(lambda c: jnp.asarray(1e-2, jnp.float32),
                           stacked_keys=("object",))
        p0 = np.ones((2, 3), np.float32)
        params = {"object": {"w": jnp.asarray(p0)}}
        state = opt.init(params)
        g = np.zeros((2, 3), np.float32)
        g[0] = 0.5
        for _ in range(4):
            updates, state = opt.update({"object": {"w": jnp.asarray(g)}},
                                        state, params)
            params = optax.apply_updates(params, updates)
        w = np.asarray(params["object"]["w"])
        assert not np.allclose(w[0], p0[0])
        np.testing.assert_array_equal(w[1], p0[1])
        assert int(state.counts["object"][1]) == 0
        np.testing.assert_array_equal(
            np.asarray(state.mu["object"]["w"][1]), 0.0)
