"""UNet/VAE golden parity vs an independent torch mirror of diffusers.

Completes the frozen-stack verification triangle (CLIP is covered against
the REAL transformers model in test_clip_torch_golden.py; diffusers is not
installed, so the UNet/VAE side uses tests/torch_mirror_sd.py — an
independent NCHW reimplementation written from diffusers' published
semantics with the exact state_dict key names of the real checkpoints).
The weights travel the REAL port path (weight_port.port_unet/port_vae) and
the PortReport must come back clean — so these tests simultaneously pin:

  * the Flax UNet/VAE architecture == diffusers' compute (incl. the SD
    VAE's asymmetric downsample padding, GroupNorm eps 1e-5/1e-6 split,
    GEGLU, nearest-upsample+conv, skip-concat order);
  * every torch->Flax weight transform (OIHW->HWIO, linear transpose);
  * the XTI layer ORDER: 16 DISTINCT per-layer contexts fed to our
    static-index stack must match the mirror consuming contexts in
    diffusers' forward invocation order (the reference's mutable-counter
    XTIAttenProc contract, reference models/xti_attention_processor.py).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from view_neti_tpu import weight_port as wp  # noqa: E402
from view_neti_tpu.models.unet import (UNetConfig,  # noqa: E402
                                       UNet2DCondition)
from view_neti_tpu.models.vae import (AutoencoderKL,  # noqa: E402
                                      VAEConfig)

from torch_mirror_sd import MirrorUNet, MirrorVAE  # noqa: E402

BLOCK_OUT = (8, 16, 16, 16)
CTX_DIM = 8
HEADS = 2
GROUPS = 4


@pytest.fixture(scope="module")
def unet_pair():
    torch.manual_seed(0)
    mirror = MirrorUNet(block_out=BLOCK_OUT, ctx_dim=CTX_DIM, heads=HEADS,
                        groups=GROUPS).eval()
    sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
    report = wp.PortReport("unet")
    params = wp.port_unet(sd, report=report)
    assert report.clean, report.summary()
    cfg = UNetConfig(block_out_channels=BLOCK_OUT,
                     cross_attention_dim=CTX_DIM,
                     num_attention_heads=HEADS, norm_groups=GROUPS,
                     use_flash_attention=False)
    return mirror, cfg, params


class TestUNetParity:
    def test_forward_matches_mirror_with_distinct_contexts(self, unet_pair):
        mirror, cfg, params = unet_pair
        rng = np.random.RandomState(0)
        B, H, W = 2, 8, 8
        L = 5
        lat = rng.randn(B, H, W, 4).astype(np.float32)
        t = np.array([17.0, 503.0], np.float32)
        # 16 DISTINCT contexts -> any layer-order mismatch breaks parity
        ctxs = rng.randn(16, B, L, CTX_DIM).astype(np.float32)
        with torch.no_grad():
            ref = mirror(
                torch.from_numpy(lat.transpose(0, 3, 1, 2)),
                torch.from_numpy(t),
                [torch.from_numpy(c) for c in ctxs])
        ours = UNet2DCondition(cfg).apply(
            {"params": params}, jnp.asarray(lat), jnp.asarray(t),
            jnp.asarray(ctxs), jnp.asarray(ctxs))
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
            rtol=2e-4, atol=2e-4)

    def test_layer_order_mismatch_is_detected(self, unet_pair):
        """Sanity that the harness has teeth: permuting two contexts must
        break parity."""
        mirror, cfg, params = unet_pair
        rng = np.random.RandomState(1)
        B, H, W, L = 1, 8, 8, 3
        lat = rng.randn(B, H, W, 4).astype(np.float32)
        t = np.array([100.0], np.float32)
        ctxs = rng.randn(16, B, L, CTX_DIM).astype(np.float32)
        with torch.no_grad():
            ref = mirror(torch.from_numpy(lat.transpose(0, 3, 1, 2)),
                         torch.from_numpy(t),
                         [torch.from_numpy(c) for c in ctxs])
        perm = ctxs.copy()
        perm[[0, 7]] = perm[[7, 0]]
        ours = UNet2DCondition(cfg).apply(
            {"params": params}, jnp.asarray(lat), jnp.asarray(t),
            jnp.asarray(perm), jnp.asarray(perm))
        assert not np.allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-3)

    def test_bypass_context_feeds_v_only(self, unet_pair):
        """K from context, V from bypass (reference
        xti_attention_processor.py:38-42): with bypass == context the
        output must equal the single-context mirror; with a different
        bypass it must differ."""
        mirror, cfg, params = unet_pair
        rng = np.random.RandomState(2)
        lat = rng.randn(1, 8, 8, 4).astype(np.float32)
        t = np.array([42.0], np.float32)
        ctxs = rng.randn(16, 1, 4, CTX_DIM).astype(np.float32)
        byps = rng.randn(16, 1, 4, CTX_DIM).astype(np.float32)
        a = UNet2DCondition(cfg).apply(
            {"params": params}, jnp.asarray(lat), jnp.asarray(t),
            jnp.asarray(ctxs), jnp.asarray(ctxs))
        b = UNet2DCondition(cfg).apply(
            {"params": params}, jnp.asarray(lat), jnp.asarray(t),
            jnp.asarray(ctxs), jnp.asarray(byps))
        assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)


@pytest.fixture(scope="module")
def vae_pair():
    torch.manual_seed(3)
    mirror = MirrorVAE(block_out=(8, 16, 32, 32), groups=GROUPS).eval()
    sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
    report = wp.PortReport("vae")
    params = wp.port_vae(sd, report=report)
    assert report.clean, report.summary()
    cfg = VAEConfig(base_channels=8, channel_mults=(1, 2, 4, 4),
                    norm_groups=GROUPS)
    return mirror, cfg, params


class TestVAEParity:
    def test_encoder_moments_match_mirror(self, vae_pair):
        mirror, cfg, params = vae_pair
        rng = np.random.RandomState(0)
        x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            ref = mirror.moments(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ours = AutoencoderKL(cfg).apply(
            {"params": params}, jnp.asarray(x),
            method=AutoencoderKL.moments)
        assert ours.shape == (2, 4, 4, 8)
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
            rtol=2e-4, atol=2e-4)

    def test_decoder_matches_mirror(self, vae_pair):
        mirror, cfg, params = vae_pair
        rng = np.random.RandomState(1)
        z = rng.randn(1, 4, 4, 4).astype(np.float32)
        with torch.no_grad():
            ref = mirror.decode(torch.from_numpy(z.transpose(0, 3, 1, 2)))
        # our decode() takes SCALED latents and divides by scaling_factor
        ours = AutoencoderKL(cfg).apply(
            {"params": params},
            jnp.asarray(z) * cfg.scaling_factor,
            method=AutoencoderKL.decode)
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
            rtol=2e-4, atol=2e-4)

    def test_asymmetric_downsample_padding(self, vae_pair):
        """Odd input sizes exercise the SD VAE's (0,1,0,1) pad + VALID
        stride-2 conv; symmetric padding would change shapes/values."""
        mirror, cfg, params = vae_pair
        rng = np.random.RandomState(2)
        x = rng.uniform(-1, 1, (1, 40, 24, 3)).astype(np.float32)
        with torch.no_grad():
            ref = mirror.moments(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ours = AutoencoderKL(cfg).apply(
            {"params": params}, jnp.asarray(x),
            method=AutoencoderKL.moments)
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
            rtol=2e-4, atol=2e-4)
