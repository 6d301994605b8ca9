"""Mapper numeric parity harness (VERDICT r1 item 1c).

The reference's Fourier frequency matrix is torch-seeded
(torch.manual_seed(seed); randn(dim//2, nfeats) * sigmas — reference
models/positional_encoding.py:164-171), which JAX PRNG cannot reproduce;
parity runs ingest the torch tensor as data via
NeTIMapper(fourier_freqs_override=...). This harness:

  1. generates the torch-seeded matrix HERE (torch is in the image) and
     asserts the override lands bit-exact in the 'constants' collection;
  2. recomputes the full arch-15 mapper forward INDEPENDENTLY in numpy
     ((t,l) scaling, sin/cos order, Dense/LayerNorm/leaky-relu chain,
     word/bypass split, norm-scale) and pins the Flax output to it.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from view_neti_tpu.models.neti_mapper import NeTIMapper  # noqa: E402
from view_neti_tpu.utils.types import PESigmas  # noqa: E402

pytestmark = pytest.mark.quick

DIM = 32          # word embedding dim (tiny)
PE_DIM = 64       # arch-15 encode dim


def torch_fourier_freqs(seed, dim, sigmas):
    """Exactly the reference construction (positional_encoding.py:164-171)."""
    torch.manual_seed(seed)
    w = torch.randn(dim // 2, len(sigmas))
    return (w * torch.tensor(sigmas, dtype=torch.float32)).numpy()


def numpy_mapper_forward(params, freqs, t, l, view_params=None,
                         norm_scale=None, num_unet_layers=16):
    """Independent recompute of NeTIMapper arch-15 eval forward."""
    def dense(x, name):
        return x @ np.asarray(params[name]["kernel"]) + np.asarray(
            params[name]["bias"])

    def layer_norm(x, name, eps=1e-5):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        xhat = (x - mu) / np.sqrt(var + eps)
        return xhat * np.asarray(params[name]["scale"]) + np.asarray(
            params[name]["bias"])

    def leaky(x):
        return np.where(x >= 0, x, 0.01 * x)

    t_s = t / 1000.0 * 2 - 1
    l_s = l / num_unet_layers * 2 - 1
    data = np.stack([t_s, l_s], -1)
    if view_params is not None:
        data = np.concatenate([data, view_params], -1)
    proj = data @ freqs.T
    enc = np.concatenate([np.sin(proj), np.cos(proj)], -1)

    h = leaky(layer_norm(dense(enc, "net_dense0"), "net_ln0"))
    h = leaky(layer_norm(dense(h, "net_dense1"), "net_ln1"))
    out = dense(h, "output_layer")
    word, bypass = np.split(out, 2, -1)
    if norm_scale is not None:
        word = word / np.linalg.norm(word, axis=-1, keepdims=True) \
            * norm_scale
    return word, bypass


class TestFourierFreqIngestion:
    def test_override_lands_bit_exact(self):
        sigmas = [0.03, 2.0]
        freqs = torch_fourier_freqs(0, PE_DIM, sigmas)
        m = NeTIMapper(embedding_type="object", output_dim=DIM,
                       arch_view_net=15, use_nested_dropout=False,
                       pe_sigmas=PESigmas(sigma_t=0.03, sigma_l=2.0),
                       fourier_freqs_override=freqs)
        variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                           jnp.zeros((1,)))
        stored = np.asarray(variables["constants"]["fourier_w"])
        np.testing.assert_array_equal(stored, freqs)

    def test_column_scales_match_sigmas(self):
        """Column i of the torch matrix is N(0, sigmas[i]^2); a mixed-sigma
        view matrix must keep per-column scale through ingestion."""
        sigmas = [0.03, 2.0] + [0.5] * 12   # dtu-12d view mapper
        freqs = torch_fourier_freqs(0, PE_DIM, sigmas)
        assert freqs.shape == (PE_DIM // 2, 14)
        col_std = freqs.std(axis=0)
        assert col_std[1] > 10 * col_std[0]     # sigma_l=2 vs sigma_t=0.03


class TestMapperForwardGolden:
    def _build(self, **kw):
        sigmas = PESigmas(sigma_t=0.03, sigma_l=2.0)
        freqs = torch_fourier_freqs(0, PE_DIM, [0.03, 2.0])
        kw.setdefault("use_nested_dropout", False)
        m = NeTIMapper(embedding_type="object", output_dim=DIM,
                       arch_view_net=15,
                       pe_sigmas=sigmas, fourier_freqs_override=freqs,
                       **kw)
        variables = m.init(jax.random.PRNGKey(7), jnp.zeros((3,)),
                           jnp.zeros((3,)))
        return m, variables, freqs

    def test_object_forward_matches_numpy(self):
        m, variables, freqs = self._build()
        t = np.array([0.0, 500.0, 999.0], np.float32)
        l = np.array([0.0, 7.0, 15.0], np.float32)
        out = m.apply(variables, jnp.asarray(t), jnp.asarray(l))
        word_np, bypass_np = numpy_mapper_forward(
            jax.device_get(variables["params"]), freqs, t, l)
        np.testing.assert_allclose(np.asarray(out.word_embedding), word_np,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.bypass_output), bypass_np,
                                   rtol=1e-5, atol=1e-6)

    def test_norm_scaled_forward_matches_numpy(self):
        m, variables, freqs = self._build(normalize_output=True)
        t = np.array([250.0, 750.0], np.float32)
        l = np.array([3.0, 12.0], np.float32)
        scale = 27.5
        out = m.apply(variables, jnp.asarray(t), jnp.asarray(l),
                      norm_scale=jnp.asarray(scale))
        word_np, _ = numpy_mapper_forward(
            jax.device_get(variables["params"]), freqs, t, l,
            norm_scale=scale)
        np.testing.assert_allclose(np.asarray(out.word_embedding), word_np,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out.word_embedding), axis=-1),
            scale, rtol=1e-5)

    def test_view_forward_matches_numpy(self):
        sigmas = PESigmas(sigma_t=0.03, sigma_l=2.0, sigma_dtu12=0.5)
        freqs = torch_fourier_freqs(3, PE_DIM, [0.03, 2.0] + [0.5] * 12)
        m = NeTIMapper(embedding_type="view", output_dim=DIM,
                       arch_view_net=15, arch_view_disable_tl=False,
                       use_nested_dropout=False, pe_sigmas=sigmas,
                       num_view_cond_dims=12,
                       fourier_freqs_override=freqs)
        rng = np.random.RandomState(0)
        vp = rng.uniform(-1, 1, (2, 12)).astype(np.float32)
        t = np.array([100.0, 900.0], np.float32)
        l = np.array([1.0, 14.0], np.float32)
        variables = m.init(jax.random.PRNGKey(9), jnp.asarray(t),
                           jnp.asarray(l), view_params=jnp.asarray(vp))
        out = m.apply(variables, jnp.asarray(t), jnp.asarray(l),
                      view_params=jnp.asarray(vp))
        word_np, bypass_np = numpy_mapper_forward(
            jax.device_get(variables["params"]), freqs, t, l,
            view_params=vp)
        np.testing.assert_allclose(np.asarray(out.word_embedding), word_np,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.bypass_output), bypass_np,
                                   rtol=1e-5, atol=1e-6)

    def test_inference_truncation_matches_numpy(self):
        """truncation_idx zeroes the hidden tail before the output layer
        (reference neti_mapper.py:409-414)."""
        m, variables, freqs = self._build(use_nested_dropout=True)
        t = np.array([500.0], np.float32)
        l = np.array([8.0], np.float32)
        idx = 20
        out = m.apply(variables, jnp.asarray(t), jnp.asarray(l),
                      truncation_idx=idx)
        params = jax.device_get(variables["params"])

        def dense(x, name):
            return x @ np.asarray(params[name]["kernel"]) + np.asarray(
                params[name]["bias"])

        def layer_norm(x, name, eps=1e-5):
            mu = x.mean(-1, keepdims=True)
            xhat = (x - mu) / np.sqrt(x.var(-1, keepdims=True) + eps)
            return xhat * np.asarray(params[name]["scale"]) + np.asarray(
                params[name]["bias"])

        leaky = lambda x: np.where(x >= 0, x, 0.01 * x)
        t_s = t / 1000.0 * 2 - 1
        l_s = l / 16 * 2 - 1
        proj = np.stack([t_s, l_s], -1) @ freqs.T
        enc = np.concatenate([np.sin(proj), np.cos(proj)], -1)
        h = leaky(layer_norm(dense(enc, "net_dense0"), "net_ln0"))
        h = leaky(layer_norm(dense(h, "net_dense1"), "net_ln1"))
        h[:, idx:] = 0.0
        word_np, _ = np.split(dense(h, "output_layer"), 2, -1)
        np.testing.assert_allclose(np.asarray(out.word_embedding), word_np,
                                   rtol=1e-5, atol=1e-6)
