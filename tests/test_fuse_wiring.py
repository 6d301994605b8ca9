"""Wiring of the fused GN+SiLU+conv3x3 kernel into the Coach (r5).

ops/fused_conv.py is pinned against a jnp reference in
tests/test_fused_conv.py; these tests pin the PLUMBING: the
OptimConfig.fuse_conv auto-resolution, the Coach's view swaps (training
fuses only the stop-gradient VAE encode; inference paths fuse the VAE
via infer_frozen() — the UNet stays unfused everywhere, a measured
in-program regression, builder.fuse_for_inference docstring), the mesh
gate, and that a fused training run matches an unfused one (the kernel
sits behind stop_gradient, so train dynamics must be unchanged up to
elementwise rounding).
"""
from pathlib import Path

import jax
import numpy as np
import pytest

from view_neti_tpu.config import RunConfig, decode
from view_neti_tpu.training import builder

TEAPOT = Path("/root/reference/data/datasets_mode0/colorful_teapot")


def _cfg(exp_dir, steps=2, fuse_conv=None):
    return decode(RunConfig, {
        "learnable_mode": 0,
        "data": {"train_data_dir": str(TEAPOT), "repeats": 3,
                 "resolution": 16, "flip_p": 0.5},
        "model": {"arch_view_net": 15, "word_embedding_dim": 32},
        "log": {"exp_dir": str(exp_dir), "save_dataset_images": False,
                "save_steps": 10 ** 9},
        "optim": {"max_train_steps": steps, "train_batch_size": 2,
                  "gradient_accumulation_steps": 1,
                  "fuse_conv": fuse_conv}})


@pytest.mark.quick
def test_resolve_fuse_conv_auto_tracks_backend():
    # conftest pins the default device to CPU -> auto resolves OFF
    assert builder.resolve_fuse_conv(None) is False
    assert builder.resolve_fuse_conv(True) is True
    assert builder.resolve_fuse_conv(False) is False


@pytest.mark.quick
def test_training_and_inference_fuse_views_agree():
    """fuse_vae_for_training delegates to fuse_for_inference — the two
    code paths must hand out the SAME VAE-only fused view (a divergence
    here would silently train and validate through different kernels)."""
    import dataclasses
    from view_neti_tpu.training.train_step import FrozenModels
    from view_neti_tpu.models.vae import AutoencoderKL, tiny_vae_config
    from view_neti_tpu.models.unet import UNet2DCondition, tiny_unet_config

    frozen = FrozenModels(
        text=None, unet=UNet2DCondition(tiny_unet_config()),
        vae=AutoencoderKL(tiny_vae_config()))
    a = builder.fuse_vae_for_training(frozen)
    b = builder.fuse_for_inference(frozen)
    assert a.vae.config == b.vae.config
    assert a.vae.config.fuse_conv is True
    assert a.unet.config == b.unet.config
    assert a.unet.config.fuse_conv is False


@pytest.mark.skipif(not TEAPOT.exists(), reason="bundled data missing")
class TestCoachFuseWiring:
    def test_auto_off_on_cpu_keeps_unfused_views(self, tmp_path):
        from view_neti_tpu.training.coach import Coach
        coach = Coach(_cfg(tmp_path / "auto"), arch=builder.tiny_arch())
        assert coach.fuse_conv is False
        assert coach.built.frozen.vae.config.fuse_conv is False
        assert coach.infer_frozen() is coach.built.frozen

    @pytest.mark.quick
    def test_forced_on_swaps_vae_views_only(self, tmp_path):
        from view_neti_tpu.training.coach import Coach
        coach = Coach(_cfg(tmp_path / "on", fuse_conv=True),
                      arch=builder.tiny_arch())
        assert coach.fuse_conv is True
        # training view: VAE fused (encode is stop-gradient'd), UNet NOT
        # (it must stay differentiable — the kernel is forward-only)
        assert coach.built.frozen.vae.config.fuse_conv is True
        assert coach.built.frozen.unet.config.fuse_conv is False
        inf = coach.infer_frozen()
        assert inf.vae.config.fuse_conv is True
        # UNet fusion in the denoise loop is a measured in-program LOSS
        # (1.54 -> 1.76 s/img r5) — the default inference view keeps it off
        assert inf.unet.config.fuse_conv is False
        # same arrays serve both views — module defs only
        assert inf.unet_vars is coach.built.frozen.unet_vars
        assert inf.vae_vars is coach.built.frozen.vae_vars
        # the experiment lever still exists
        exp = builder.fuse_for_inference(coach.built.frozen, unet=True)
        assert exp.unet.config.fuse_conv is True

    def test_fused_training_matches_unfused(self, tmp_path):
        """The fused VAE encode sits behind stop_gradient; a fused run's
        trainable params must match the unfused run up to the kernel's
        elementwise rounding (fp32 here)."""
        from view_neti_tpu.training.coach import Coach
        outs = []
        for tag, fuse in (("off", False), ("on", True)):
            coach = Coach(_cfg(tmp_path / tag, fuse_conv=fuse),
                          arch=builder.tiny_arch())
            assert coach.fuse_conv is fuse
            coach.train()
            outs.append(jax.device_get(coach.trainable))
        for a, b in zip(jax.tree_util.tree_leaves(outs[0]),
                        jax.tree_util.tree_leaves(outs[1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)
