"""Flash-attention kernel vs jnp reference (interpret mode on CPU; the same
code path compiles natively on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from view_neti_tpu.ops.attention import mha_jnp
from view_neti_tpu.ops import flash_attention as fa


def _rand_qkv(B=1, Lq=256, Lk=256, H=2, d=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, Lq, H, d), jnp.float32)
    k = jax.random.normal(ks[1], (B, Lk, H, d), jnp.float32)
    v = jax.random.normal(ks[2], (B, Lk, H, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("Lq,Lk,d", [
    (256, 256, 32),    # self-attention shape class
    (128, 77, 32),     # cross-attention (Lk padded to 128 inside)
    (64, 64, 40),      # SD1.5 head dim 40
])
def test_forward_matches_reference(Lq, Lk, d):
    q, k, v = _rand_qkv(Lq=Lq, Lk=Lk, d=d)
    ref = mha_jnp(q, k, v)
    out = fa.flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_forward_multi_kblock():
    """KV streamed over several in-kernel blocks."""
    q, k, v = _rand_qkv(Lq=128, Lk=512, d=32)
    ref = mha_jnp(q, k, v)
    out = fa.flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_backward_matches_reference():
    q, k, v = _rand_qkv(Lq=128, Lk=128, d=32)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, block_q=128,
                                          block_k=128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_jnp(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_backward_padded_kv():
    """Gradients must be exact with a masked/padded KV length (77 -> 128)."""
    q, k, v = _rand_qkv(Lq=64, Lk=77, d=32)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, block_q=64,
                                          block_k=128) * 0.1) ** 2

    def loss_ref(q, k, v):
        return jnp.sum(mha_jnp(q, k, v) * 0.1) ** 2

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_backward_padded_q_odd_length():
    """r4 gate widening sends big odd-Lq attentions through the kernel in
    TRAINING too; the q-pad rows must contribute exactly zero to dk/dv
    and dq must match the jnp reference after the slice."""
    q, k, v = _rand_qkv(Lq=300, Lk=300, d=32)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_jnp(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


class TestProductionShapes:
    """The real inference protocol runs 768x576 (reference
    inference_dtu.py:238-240) -> 96x72 latents -> Lq=6912 self-attention and
    6912x77 cross-attention at head_dim 40 (SD1.5 level-0 blocks)."""

    def test_cross_attention_768x576(self):
        q, k, v = _rand_qkv(Lq=6912, Lk=77, H=1, d=40)
        ref = mha_jnp(q, k, v)
        out = fa.flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_self_attention_768x576(self):
        q, k, v = _rand_qkv(Lq=6912, Lk=6912, H=1, d=40)
        ref = mha_jnp(q, k, v)
        out = fa.flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_mid_level_1728_padded_q(self):
        """48x36=1728 has no 128-multiple divisor: q is padded to 1792 and
        tiled normally (previously a whole-axis 1728 query block)."""
        q, k, v = _rand_qkv(Lq=1728, Lk=1728, H=1, d=16)
        ref = mha_jnp(q, k, v)
        out = fa.flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


class TestFallbackGate:
    def test_unsupported_big_shape_warns_once_and_returns_none(self):
        fa._fallback_warned.clear()
        # big logits with an unsupported head dim must warn loudly
        q, k, v = _rand_qkv(Lq=1024, Lk=1024, H=1, d=12)
        with pytest.warns(UserWarning, match="falling back to jnp"):
            assert fa.flash_attention_compat(q, k, v) is None
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("error")   # second call must NOT warn
            assert fa.flash_attention_compat(q, k, v) is None

    def test_tiny_shape_falls_back_silently(self):
        fa._fallback_warned.clear()
        # 12x9=108 latents (deepest level at 768x576): Lq % 8 != 0, but
        # the jnp path is the right choice there — no warning
        q, k, v = _rand_qkv(Lq=108, Lk=108, H=1, d=16)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            assert fa.flash_attention_compat(q, k, v) is None

    def test_big_odd_length_now_covered(self):
        """r4 (VERDICT item 5): q-padding makes the kernel Lq-agnostic,
        so a large non-multiple-of-8 length must run through flash (no
        None, no warning) and match the jnp reference."""
        fa._fallback_warned.clear()
        q, k, v = _rand_qkv(Lq=300, Lk=300, H=1, d=16)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            out = fa.flash_attention_compat(q, k, v)
        assert out is not None
        ref = mha_jnp(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_odd_head_dim_big_shape_still_warns(self):
        fa._fallback_warned.clear()
        q, k, v = _rand_qkv(Lq=1024, Lk=1024, H=1, d=20)
        with pytest.warns(UserWarning, match="unsupported head dim"):
            assert fa.flash_attention_compat(q, k, v) is None

    def test_supported_shape_does_not_warn(self):
        fa._fallback_warned.clear()
        q, k, v = _rand_qkv(Lq=64, Lk=64, H=1, d=16)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            out = fa.flash_attention_compat(q, k, v)
        assert out is not None


def test_pick_block():
    assert fa._pick_block(4096, 256) == 256
    assert fa._pick_block(77, 256) == 77
    assert fa._pick_block(128, 256) == 128
    # 320 has no 128-multiple divisor <= 256 -> whole-axis block
    assert fa._pick_block(320, 256) == 320


def _pad128(n):
    return n + (-n) % 128


def test_default_blocks_respect_vmem_guard():
    """The f32 (bq, bk) scoped-VMEM tiles must stay within the measured-safe
    product at every shape the UNet runs (train 512x384 levels, inference
    768x576 levels, cross-attention) AND at pathological lengths with no
    128-multiple divisor (the wrapper pads q, so select_blocks always sees
    128-multiples and can always enforce the cap)."""
    for Lq, Lk in [(3072, 3072), (768, 768), (6912, 6912),
                   (1728, 1728), (3072, 77), (6912, 77),
                   (8192, 8192), (320, 8192),
                   (16112, 16112)]:   # 2^4*19*53: no 128-multiple divisor
        Lq_pad, Lk_pad = _pad128(Lq), _pad128(Lk)
        bq, bk = fa.select_blocks(Lq_pad, Lk_pad)
        assert Lq_pad % bq == 0 and Lk_pad % bk == 0
        assert bq * bk <= fa._MAX_TILE_ELEMS, (Lq, Lk, bq, bk)
    # the measured-fastest safe training combo is actually selected
    assert fa.select_blocks(3072, 3072) == (512, 1024)
    assert fa.select_blocks(768, 768) == (384, 768)


def test_explicit_blocks_honored_not_capped():
    """Explicit block sizes bypass the VMEM cap (sweep tools must measure
    what the label says); the kernel stays correct with an over-cap tile."""
    q, k, v = _rand_qkv(Lq=1024, Lk=1024, d=32)
    assert 1024 * 1024 > fa._MAX_TILE_ELEMS
    ref = mha_jnp(q, k, v)
    out = fa.flash_attention(q, k, v, block_q=1024, block_k=1024)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_padded_q_matches_reference():
    """Lq with no 128-multiple divisor goes through the q-padding path
    (padded rows computed then sliced off), fwd and grad."""
    q, k, v = _rand_qkv(Lq=72, Lk=128, d=32)
    ref = mha_jnp(q, k, v)
    out = fa.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_f(f, *a):
        return jnp.sum(f(*a) ** 2)

    g_ref = jax.grad(lambda *a: loss_f(mha_jnp, *a), argnums=(0, 1, 2))(
        q, k, v)
    g_out = jax.grad(lambda *a: loss_f(fa.flash_attention, *a),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


class TestTorchSDPAGradGolden:
    """Gradient golden vs torch's scaled_dot_product_attention autograd.

    The existing backward tests compare the Pallas custom VJP against the
    jnp reference — internal consistency only. A shared wrong assumption
    between the kernel and its jnp twin (softmax scale placement, padded-
    row handling, recompute-vs-residual bookkeeping) would pass those but
    diverge from the reference's torch attention backward (reference
    models/xti_attention_processor.py:44-50 runs the same math through
    torch autograd). This pins q/k/v grads against an INDEPENDENT
    implementation at the shipped SD1.5 head dim 40, with a fixed random
    upstream cotangent."""

    @pytest.mark.parametrize("Lq,Lk", [
        (3072, 77),      # training cross-attn (48x64 latents, 77 keys)
        (3072, 3072),    # training self-attn, head dim 40
    ])
    def test_qkv_grads_match_torch_sdpa(self, Lq, Lk):
        torch = pytest.importorskip("torch")
        d = 40
        q, k, v = _rand_qkv(Lq=Lq, Lk=Lk, H=1, d=d, seed=9)
        dy = jax.random.normal(jax.random.PRNGKey(10),
                               (1, Lq, 1, d), jnp.float32)

        def loss(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v) * dy)

        g_flash = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        # torch sdpa wants (B, H, L, d)
        def t(x):
            return torch.from_numpy(np.ascontiguousarray(
                np.asarray(x).transpose(0, 2, 1, 3))).requires_grad_(True)

        qt, kt, vt = t(q), t(k), t(v)
        out = torch.nn.functional.scaled_dot_product_attention(qt, kt, vt)
        dyt = torch.from_numpy(np.asarray(dy).transpose(0, 2, 1, 3))
        (out * dyt).sum().backward()
        for gf, gt, name in zip(g_flash, (qt, kt, vt), "qkv"):
            ref = gt.grad.numpy().transpose(0, 2, 1, 3)
            np.testing.assert_allclose(np.asarray(gf), ref,
                                       atol=5e-4, rtol=5e-4,
                                       err_msg=f"d{name} (Lq={Lq}, Lk={Lk})")
