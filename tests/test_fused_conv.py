"""ops/fused_conv.py: the fused GN-affine+SiLU+conv3x3 Pallas kernel.

Pins (a) kernel math against an unfused jnp reference across the
bias/temb/residual variants and halo-tile shapes, (b) full-model
equivalence: the fuse_conv=True VAE/UNet produce the same outputs AND the
same param tree as the unfused ones (checkpoint/weight-port compatibility),
(c) the VMEM-plan gate. Runs in interpret mode on CPU (conftest pins the
default device).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from view_neti_tpu.ops import fused_conv
from view_neti_tpu.ops.fused_conv import (fused_affine_silu_conv3x3,
                                          supported)


def _ref(x, a, b, k, bias=None, add=None, res=None, dt=jnp.float32):
    y = (x.astype(jnp.float32) * a[:, None, None, :]
         + b[:, None, None, :]).astype(dt)
    y = y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(dt)
    out = jax.lax.conv_general_dilated(
        y, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if add is not None:
        out = out + add.astype(jnp.float32)[:, None, None, :]
    if res is not None:
        out = out + res.astype(jnp.float32)
    return out.astype(dt)


@pytest.mark.quick
@pytest.mark.parametrize(
    "B,H,W,Ci,Co,use_bias,use_add,use_res",
    [
        (2, 16, 14, 16, 16, True, False, False),   # multi-H-tile, odd W
        (1, 8, 8, 8, 24, True, True, True),        # all epilogue terms
        (2, 24, 10, 16, 8, False, False, True),    # no bias, residual
        (1, 32, 20, 8, 16, True, True, False),     # temb add, tall
        (3, 4, 6, 16, 16, True, False, True),      # B>1, tiny spatial
    ])
def test_kernel_matches_jnp_reference(B, H, W, Ci, Co, use_bias, use_add,
                                      use_res):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, Ci), jnp.float32)
    a = jnp.asarray(rng.randn(B, Ci), jnp.float32) * 0.5
    b = jnp.asarray(rng.randn(B, Ci), jnp.float32) * 0.1
    k = jnp.asarray(rng.randn(3, 3, Ci, Co), jnp.float32) * 0.2
    bias = jnp.asarray(rng.randn(Co), jnp.float32) if use_bias else None
    add = jnp.asarray(rng.randn(B, Co), jnp.float32) if use_add else None
    res = (jnp.asarray(rng.randn(B, H, W, Co), jnp.float32)
           if use_res else None)
    assert supported(x.shape, Co, 4, use_res)
    got = fused_affine_silu_conv3x3(x, a, b, k, bias, add, res)
    want = _ref(x, a, b, k, bias, add, res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)


@pytest.mark.quick
def test_kernel_matches_under_jit():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 12, 16), jnp.float32)
    a = jnp.asarray(rng.randn(2, 16), jnp.float32)
    b = jnp.asarray(rng.randn(2, 16), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 16, 16), jnp.float32) * 0.2
    got = jax.jit(fused_affine_silu_conv3x3)(x, a, b, k)
    want = _ref(x, a, b, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)


def test_vmem_plan_gate():
    # fits: VAE encoder level-0 shape in bf16
    assert supported((1, 512, 512, 128), 128, 2)
    # fits with a Cout-tiled plan: VAE decoder 512-channel level
    assert supported((1, 144, 192, 512), 512, 2, has_residual=True)
    # does not fit: pathological width keeps even bh=1 slabs over budget
    assert not supported((1, 8, 65536, 512), 512, 4)
    with pytest.raises(ValueError):
        fused_affine_silu_conv3x3(
            jnp.zeros((1, 8, 65536, 512), jnp.float32),
            jnp.zeros((1, 512)), jnp.zeros((1, 512)),
            jnp.zeros((3, 3, 512, 512), jnp.float32))


@pytest.mark.quick
def test_fusable_policy_on_sd_transition_shapes():
    """Channel-changing ResnetBlocks gate each conv on its OWN input
    shape (the r5 review bug: conv2's gate evaluated with conv1's input).
    Policy pins for the real SD sites where the two convs differ:"""
    # UNet down 640->1280 transition: conv1 (640ch in) is the measured
    # +11% regime; conv2 (1280ch in) is the measured-LOSS >=1280ch regime
    assert fused_conv.profitable((2, 18, 24, 640), 1280)
    assert not fused_conv.profitable((2, 18, 24, 1280), 1280)
    # VAE encoder 128->256 transition at train batch 9: conv1 (128ch,
    # B=9) is the measured-LOSS large-batch-128ch regime; conv2 (256ch)
    # fuses
    assert not fused_conv.profitable((9, 384, 512, 128), 256)
    assert fused_conv.profitable((9, 384, 512, 256), 256)


@pytest.mark.quick
def test_per_conv_gating_in_channel_changing_block(monkeypatch):
    """A VAE ResnetBlock crossing the policy boundary (128->256 at B=9)
    must fuse ONLY conv2 (gated on its true 256-channel input) and still
    match the unfused block bit-for-tolerance."""
    from view_neti_tpu.models import vae as vae_mod
    calls = []
    real = fused_conv.fused_affine_silu_conv3x3

    def spy(x, *a, **k):
        calls.append(tuple(x.shape))
        return real(x, *a, **k)

    monkeypatch.setattr(fused_conv, "fused_affine_silu_conv3x3", spy)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(9, 8, 8, 128) * 0.5, jnp.float32)
    blk_f = vae_mod.ResnetBlock(256, norm_groups=32, fuse=True)
    blk_u = vae_mod.ResnetBlock(256, norm_groups=32, fuse=False)
    v = blk_u.init(jax.random.PRNGKey(0), x)
    calls.clear()
    out_f = blk_f.apply(v, x)
    assert calls == [(9, 8, 8, 256)], \
        "conv1 (128ch@B=9) must fall back; conv2 (256ch) must fuse"
    out_u = blk_u.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=0, atol=2e-4)


def test_per_conv_gating_in_unet_transition_block(monkeypatch):
    """UNet-side mirror of the channel-crossing gate: a 256->768 block
    fuses conv1 (256ch, measured-win regime) but must NOT fuse conv2
    (768ch input > the 640ch policy ceiling)."""
    from view_neti_tpu.models import unet as unet_mod
    calls = []
    real = fused_conv.fused_affine_silu_conv3x3

    def spy(x, *a, **k):
        calls.append(tuple(x.shape))
        return real(x, *a, **k)

    monkeypatch.setattr(fused_conv, "fused_affine_silu_conv3x3", spy)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 4, 4, 256) * 0.5, jnp.float32)
    temb = jnp.asarray(rng.randn(1, 32), jnp.float32)
    blk_u = unet_mod.ResnetBlock(768, norm_groups=32, fuse=False)
    blk_f = unet_mod.ResnetBlock(768, norm_groups=32, fuse=True)
    v = blk_u.init(jax.random.PRNGKey(0), x, temb)
    calls.clear()
    out_f = blk_f.apply(v, x, temb)
    assert calls == [(1, 4, 4, 256)], \
        "conv1 (256ch) fuses; conv2 (768ch > 640 policy ceiling) must not"
    out_u = blk_u.apply(v, x, temb)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=0, atol=2e-4)


def test_gn_fold_matches_normalize():
    from view_neti_tpu.ops.norm import FastGroupNorm
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 6, 5, 16), jnp.float32)
    mod = FastGroupNorm(num_groups=4, epsilon=1e-6)
    v = mod.init(jax.random.PRNGKey(0), x)
    v = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape), p.dtype), v)
    y = mod.apply(v, x)
    a, b = mod.apply(v, x, fold=True)
    y2 = x * a[:, None, None, :] + b[:, None, None, :]
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                               rtol=0, atol=1e-5)


def test_vae_fused_matches_unfused():
    from view_neti_tpu.models.vae import (AutoencoderKL, tiny_vae_config)
    import dataclasses
    cfg = tiny_vae_config()
    cfg_f = dataclasses.replace(cfg, fuse_conv=True)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 32, 32, 3),
                    jnp.float32)
    m = AutoencoderKL(cfg)
    mf = AutoencoderKL(cfg_f)
    v = m.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    vf = mf.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    # identical param trees (names, shapes) — checkpoint compatibility
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(vf))
    chex_equal = jax.tree_util.tree_map(
        lambda p, q: bool(jnp.array_equal(p, q)), v, vf)
    assert all(jax.tree_util.tree_leaves(chex_equal)), \
        "fused/unfused init must produce identical params"
    mo = m.apply(v, x, method=AutoencoderKL.moments)
    mo_f = mf.apply(v, x, method=AutoencoderKL.moments)
    np.testing.assert_allclose(np.asarray(mo), np.asarray(mo_f),
                               rtol=0, atol=2e-4)
    z = m.apply(v, x, method=AutoencoderKL.encode_mode)
    dec = m.apply(v, z, method=AutoencoderKL.decode)
    dec_f = mf.apply(v, z, method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dec_f),
                               rtol=0, atol=2e-4)


def test_unet_fused_matches_unfused():
    from view_neti_tpu.models.unet import (UNet2DCondition,
                                           tiny_unet_config)
    cfg = tiny_unet_config()
    cfg_f = tiny_unet_config(fuse_conv=True)
    rng = np.random.RandomState(4)
    lat = jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32)
    ts = jnp.asarray([3, 500], jnp.int32)
    ctx = jnp.asarray(rng.randn(16, 2, 7, 32), jnp.float32)
    m = UNet2DCondition(cfg)
    mf = UNet2DCondition(cfg_f)
    v = m.init(jax.random.PRNGKey(0), lat, ts, ctx)
    vf = mf.init(jax.random.PRNGKey(0), lat, ts, ctx)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(vf))
    out = m.apply(v, lat, ts, ctx)
    out_f = mf.apply(v, lat, ts, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_f),
                               rtol=0, atol=2e-4)


def test_fused_vae_encode_under_stop_gradient_jit():
    """The train step jits VAE encode with stop_gradient around it
    (train_step.py:150) — the forward-only kernel must trace cleanly
    inside a jit that also computes grads elsewhere."""
    import dataclasses
    from view_neti_tpu.models.vae import AutoencoderKL, tiny_vae_config
    cfg = dataclasses.replace(tiny_vae_config(), fuse_conv=True)
    m = AutoencoderKL(cfg)
    x = jnp.asarray(np.random.RandomState(5).randn(1, 16, 16, 3),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))

    def f(w, x):
        lat = jax.lax.stop_gradient(
            m.apply(v, x, method=AutoencoderKL.encode_mode))
        return jnp.sum((lat.sum() - w) ** 2)

    g = jax.jit(jax.grad(f))(jnp.float32(0.5), x)
    assert np.isfinite(float(g))
